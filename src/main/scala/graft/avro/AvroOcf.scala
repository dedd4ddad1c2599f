package graft.avro

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Avro Object Container File source/sink — the reference's at-rest format
  * (an Avro-centric pipeline hands you `.avro` container files: embedded
  * writer schema, deflate-able sync-marked blocks, splittable).
  *
  * Division of labor: this layer handles ONLY the container framing; every
  * record body is produced/consumed by the engine's Catalyst codec
  * expressions (`AvroFunctions.toAvro`/`fromAvro` — codegen'd, spec-covered
  * including unions and evolution). The sink appends PRE-ENCODED datum
  * bytes (`DataFileWriter.appendEncoded`), so no second serializer exists
  * to drift from the expression codec; the source surfaces each datum as
  * the binary `avro_value` column for `fromAvro`, re-encoding through the
  * file's own EMBEDDED writer schema — which is exactly the container
  * contract (the reader needs no registry). A production-tuned path would
  * hand `InternalRow`s straight across instead of re-encoding; the data
  * flow (one file per partition out, one task per file in) is the real
  * shape either way.
  */
object AvroOcf {

  /** Write one `.avro` container file per non-empty partition of `bin`
    * (Avro-binary records, all encoded with `schemaJson`). */
  def write(bin: Dataset[Array[Byte]], schemaJson: String, out: String): Unit = {
    val session = bin.sparkSession
    // ensure the directory exists even when every partition is empty, so a
    // degenerate corpus round-trips to an empty (not missing) table
    new Path(out).getFileSystem(session.sessionState.newHadoopConf())
      .mkdirs(new Path(out))
    bin.foreachPartition { (it: Iterator[Array[Byte]]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(out, f"part-${TaskContext.getPartitionId()}%05d.avro")
        val os = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
          .create(path, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        try {
          w.create(schema, os)
          it.foreach(b => w.appendEncoded(ByteBuffer.wrap(b)))
        } finally w.close()
      }
    }
  }

  /** The writer schema embedded in the container header of the first file
    * under `path` — the discovery step an OCF reader performs before
    * planning a resolving decode (`fromAvro(reader, writer)`): driver-side,
    * header-only, no record IO. None for an empty directory. */
  def embeddedSchema(s: SparkSession, path: String): Option[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.headOption
      .map { p =>
        val reader = DataFileReader.openReader(
          new FsInput(new Path(p), new org.apache.hadoop.conf.Configuration()),
          new GenericDatumReader[GenericRecord]())
        try reader.getSchema.toString finally reader.close()
      }
  }

  /** Read every `.avro` file under `path` into a one-column binary
    * DataFrame (`avro_value`), one task per file — the unit a splittable
    * reader would further subdivide by sync marker at 100 TB. Tolerates an
    * empty directory (empty corpus round-trip). */
  def readBinary(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    val root = new Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val files =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString).sorted
    val parallelism = math.max(1, math.min(files.size, s.sparkContext.defaultParallelism))
    s.createDataset(files).repartition(parallelism)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val in = new FsInput(new Path(p), new org.apache.hadoop.conf.Configuration())
          val reader = DataFileReader.openReader(
            in, new GenericDatumReader[GenericRecord]())
          Option(TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => reader.close()))
          val datumWriter =
            new GenericDatumWriter[GenericRecord](reader.getSchema)
          new Iterator[Array[Byte]] {
            def hasNext: Boolean = reader.hasNext
            def next(): Array[Byte] = {
              val rec = reader.next()
              val bos = new java.io.ByteArrayOutputStream(256)
              val enc = EncoderFactory.get().binaryEncoder(bos, null)
              datumWriter.write(rec, enc)
              enc.flush()
              bos.toByteArray
            }
          }
        }
      }
      .toDF("avro_value")
  }
}
