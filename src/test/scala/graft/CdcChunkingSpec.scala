package graft

import org.apache.spark.sql.functions._

/** Structural contract for q155's content-defined chunking: chunks must
  * tile each document exactly (no token lost or double-counted, chunk ids
  * contiguous from 0) — the invariant that makes per-chunk dedup/ingest
  * decisions safe to act on. Shift-resilience itself is by construction:
  * the boundary rule is memoryless (token-hash mod 16), so a chunk's
  * identity depends only on its own tokens.
  */
class CdcChunkingSpec extends SparkSpec {

  test("q155 chunks tile every document exactly, ids contiguous from 0") {
    val chunks = SparkEntry.queries("q155_cdc_chunking")(spark, sf)
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("tiled"),
        min("chunk_id").as("minc"), max("chunk_id").as("maxc"),
        count(lit(1)).as("nchunks"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n"))
    // the running-sum id starts at 1 when the very first token is itself a
    // boundary, 0 otherwise; either way ids must be contiguous
    val bad = perDoc.join(docs, "doc_id")
      .filter(col("tiled") =!= col("n") ||
        !col("minc").between(0, 1) ||
        col("maxc") - col("minc") =!= col("nchunks") - 1)
    assert(bad.count() === 0, "chunks must partition the token stream")
    assert(perDoc.count() === docs.count(), "every document must be chunked")
  }
}
