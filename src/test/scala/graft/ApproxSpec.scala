package graft

/** Accuracy contract for the sketch-based approximate operators that have no
  * DuckDB oracle (rows-only driver check): HLL distinct counts stay inside
  * the configured relative error. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within 2% of exact at rsd=0.01") {
    val approx = SparkEntry.queries("q05_approx_count_distinct")(spark, sf)
      .collect().head
    val exact = SparkEntry.queries("q04_count_distinct")(spark, sf)
      .collect().head
    val exactParts = exact.getLong(exact.fieldIndex("n_parts"))
    val approxParts = approx.getLong(approx.fieldIndex("approx_parts"))
    assert(math.abs(approxParts - exactParts).toDouble / exactParts < 0.02,
      s"approx=$approxParts exact=$exactParts")
  }
}
