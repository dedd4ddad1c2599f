package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The calibration manifest — every approximate index's operating
  * parameters as ONE fleet-facing frame, each row the `chosen` reading of
  * its dial: IVF probe depth (q251), the text and media SimHash bucket
  * caps (q265/q266), and the sign-LSH table count (q268). This is the
  * artifact a 100 TB deployment ships alongside its indexes — the nightly
  * dials recompute it from the shared panels, the lifecycle store versions
  * the pieces that gate results (the cap pillar), and every `calibrated*`
  * entry point reads the same choices this frame reports. Deliberately an
  * API rather than a catalog query: the dials are already first-class
  * oracle-checked queries, and the manifest is their join-free union —
  * re-running all four inside the bench would double-charge the sweeps. */
object Calibration {

  /** (param, value, recall_ppm, floor_ppm) — one row per calibrated
    * operating parameter, ordered by param name. */
  def manifest(s: SparkSession, dir: String): DataFrame = {
    def chosenOf(dial: DataFrame, param: String, valueCol: String,
                 floor: Long): DataFrame =
      dial.filter(col("chosen")).select(lit(param).as("param"),
        col(valueCol).as("value"), col("recall_ppm"),
        lit(floor).as("floor_ppm"))
    val n = Tables.parquetRowCount(s, dir, "embeddings")
    val bits = SimilarityQueries.codeBits(n)
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), MultimodalQueries.mediaPayload.as("payload"))
    chosenOf(SimilarityQueries.probeDepthDial(s, dir),
        "ivf_probes", "probes", SimilarityQueries.ProbeRecallFloorPpm)
      .unionAll(chosenOf(
        DedupQueries.bucketCapDial(DedupQueries.textSimhashSigs(s, dir)),
        "simhash_cap_text", "cap", DedupQueries.CapRecallFloorPpm))
      .unionAll(chosenOf(
        DedupQueries.bucketCapDial(MultimodalQueries.byteSimhashSigs(media)),
        "simhash_cap_media", "cap", DedupQueries.CapRecallFloorPpm))
      .unionAll(chosenOf(
        DedupQueries.lshTableDial(DedupQueries.normVecs(s, dir), bits, n),
        "lsh_tables", "tables", DedupQueries.LshTableFloorPpm))
      .unionAll(chosenOf(DedupQueries.minhashCapDial(s, dir),
        "minhash_cap", "cap", DedupQueries.CapRecallFloorPpm))
      .unionAll(chosenOf(MultimodalQueries.cdcCapDial(media),
        "cdc_cap", "cap", DedupQueries.CapRecallFloorPpm))
      .orderBy("param")
  }

  /** [[manifest]] read from the INSTALLED state instead of recomputed —
    * the production form once every parameter is versioned through
    * [[IndexLifecycle]]'s pillars: each row is the store's committed
    * scalar plus the `chosen` row of the install-time dial evidence that
    * rode along with it. A nightly recalibration changes this frame only
    * by committing a new version; between installs it is stable however
    * the corpus moves (that movement is the drift audits' to flag). The
    * six roots are the six pillar stores: IVF probes, text cap, media
    * cap, LSH tables, MinHash cap, CDC chunk cap. */
  def manifestFromStore(s: SparkSession, probesRoot: String,
                        capTextRoot: String, capMediaRoot: String,
                        tablesRoot: String, capMinhashRoot: String,
                        capCdcRoot: String): DataFrame = {
    def row(param: String, value: Long, baseline: DataFrame, valueCol: String,
            floor: Long): DataFrame =
      baseline.filter(col("chosen") && col(valueCol) === value)
        .select(lit(param).as("param"), col(valueCol).as("value"),
          col("recall_ppm"), lit(floor).as("floor_ppm"))
    row("ivf_probes", IndexLifecycle.readProbes(s, probesRoot).toLong,
        IndexLifecycle.readProbesBaseline(s, probesRoot), "probes",
        SimilarityQueries.ProbeRecallFloorPpm)
      .unionAll(row("simhash_cap_text",
        IndexLifecycle.readCap(s, capTextRoot).toLong,
        IndexLifecycle.readCapBaseline(s, capTextRoot), "cap",
        DedupQueries.CapRecallFloorPpm))
      .unionAll(row("simhash_cap_media",
        IndexLifecycle.readCap(s, capMediaRoot).toLong,
        IndexLifecycle.readCapBaseline(s, capMediaRoot), "cap",
        DedupQueries.CapRecallFloorPpm))
      .unionAll(row("lsh_tables",
        IndexLifecycle.readLshTables(s, tablesRoot).toLong,
        IndexLifecycle.readLshTablesBaseline(s, tablesRoot), "tables",
        DedupQueries.LshTableFloorPpm))
      .unionAll(row("minhash_cap",
        IndexLifecycle.readCap(s, capMinhashRoot).toLong,
        IndexLifecycle.readCapBaseline(s, capMinhashRoot), "cap",
        DedupQueries.CapRecallFloorPpm))
      .unionAll(row("cdc_cap",
        IndexLifecycle.readCap(s, capCdcRoot).toLong,
        IndexLifecycle.readCapBaseline(s, capCdcRoot), "cap",
        DedupQueries.CapRecallFloorPpm))
      .orderBy("param")
  }

  /** [[manifestFromStore]] with every pillar resolved through ONE
    * release ([[IndexLifecycle.readRelease]]) — the coherent form: a
    * recalibration of any single pillar cannot move one row of this
    * frame mid-sequence; all six rows report the release's pinned
    * versions until the next release pins new ones. Pin names follow
    * the manifest's param names. */
  def manifestFromRelease(s: SparkSession, relRoot: String): DataFrame = {
    val pins = IndexLifecycle.readRelease(relRoot)
    def row(param: String, value: Long, baseline: DataFrame, valueCol: String,
            floor: Long): DataFrame =
      baseline.filter(col("chosen") && col(valueCol) === value)
        .select(lit(param).as("param"), col(valueCol).as("value"),
          col("recall_ppm"), lit(floor).as("floor_ppm"))
    def capRow(param: String): DataFrame = {
      val (root, v) = pins(param)
      row(param, IndexLifecycle.readCapAt(s, root, v).toLong,
        IndexLifecycle.readCapBaselineAt(s, root, v), "cap",
        DedupQueries.CapRecallFloorPpm)
    }
    val (pRoot, pV) = pins("ivf_probes")
    val (tRoot, tV) = pins("lsh_tables")
    row("ivf_probes", IndexLifecycle.readProbesAt(s, pRoot, pV).toLong,
        IndexLifecycle.readProbesBaselineAt(s, pRoot, pV), "probes",
        SimilarityQueries.ProbeRecallFloorPpm)
      .unionAll(capRow("simhash_cap_text"))
      .unionAll(capRow("simhash_cap_media"))
      .unionAll(row("lsh_tables",
        IndexLifecycle.readLshTablesAt(s, tRoot, tV).toLong,
        IndexLifecycle.readLshTablesBaselineAt(s, tRoot, tV), "tables",
        DedupQueries.LshTableFloorPpm))
      .unionAll(capRow("minhash_cap"))
      .unionAll(capRow("cdc_cap"))
      .orderBy("param")
  }
}
