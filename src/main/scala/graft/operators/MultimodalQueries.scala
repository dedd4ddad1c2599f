package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline (SURVEY.md §2.2 LLM surface): media as opaque
  * `binary` payloads + typed metadata, with decode/feature-extract running as
  * a typed `mapPartitions` — the Scala analogue of a Pandas-UDF/`mapInPandas`
  * stage: batch-at-a-time, partition-parallel, no driver involvement.
  *
  * The image decode itself is STUBBED (no image libs in this container):
  * `MultimodalQueries.decodeStub` derives deterministic pseudo-features from
  * the payload bytes. The Spark-side plumbing — binary envelope schema, typed
  * Encoders, partition-wise batch iteration, metadata passthrough — is real
  * and oracle-checked end to end.
  */
object MultimodalQueries {

  /** Envelope: what a media row looks like at rest (payload + metadata). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            format: String, width: Int, height: Int)

  /** Extracted features (the stub's deterministic output). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, format: String,
                                 width: Int, height: Int, feat0: Double)

  /** STUB for the real decoder: a production deployment replaces this with
    * an image/audio codec (e.g. JNI or a Python `mapInPandas` stage). It
    * must stay deterministic in the payload bytes — the oracle recomputes
    * `feat0` arithmetically. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    // feat0 left unrounded here; the query rounds with Spark's round() so
    // rounding semantics match the DuckDB oracle exactly.
    MediaFeatures(r.doc_id, n, r.format, r.width, r.height, (n % 256) / 255.0)
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q51_multimodal_features",
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CASE WHEN doc_id % 3 = 0 THEN 'png'
             |            WHEN doc_id % 3 = 1 THEN 'jpeg'
             |            ELSE 'webp' END AS format,
             |       CAST(n_chars % 640 AS INT) AS width,
             |       CAST(n_chars % 480 AS INT) AS height,
             |       round((octet_length(encode(text)) % 256) / 255.0, 4) AS feat0
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "Binary media envelope + typed mapPartitions feature extraction. The " +
        "payload column is opaque bytes; only metadata is columnar, so " +
        "Parquet scans that don't touch payloads never read them (column " +
        "pruning). Extraction is batch-at-a-time per partition — the shape " +
        "that hosts a real codec at 100 TB, where payload bytes dominate " +
        "I/O and the decode stage is sized by `maxPartitionBytes`."
    ) { (s, dir) =>
      import s.implicits._
      // Build the envelope: documents.text stands in for media payloads.
      val media = Tables.documents(s, dir).select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
        .as[MediaRow]
      media
        .mapPartitions(_.map(decodeStub))
        .toDF()
        .withColumn("feat0", round(col("feat0"), 4))
        .orderBy("doc_id")
    }
  )
}
