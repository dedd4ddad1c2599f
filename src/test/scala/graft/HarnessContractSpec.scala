package graft

import org.apache.spark.sql.types._

/** The driver-harness result-schema contract, enforced catalog-wide.
  *
  * The correctness gate loads each query's parquet output with
  * pandas/pyarrow, the oracle via duckdb→pandas, then sorts by every column
  * and hashes values dtype-sensitively. Three whole result-type classes
  * fail that gate even when every value is exact — each burned a round
  * before being understood (r2/r3: q69, q127, q84/q128):
  *
  *   - Array/Map/Struct top-level columns crash pandas `sort_values`
  *     (unhashable), nulling the whole row in CORRECTNESS_r{N}.json.
  *   - DECIMAL columns normalize differently per reader (pyarrow surfaces
  *     `decimal.Decimal` objects, duckdb→pandas float64) and hash-mismatch.
  *   - An un-CAST DuckDB integer `sum()` widens to HUGEINT → pandas
  *     float64, while Spark's stays int64 — same digits, different dtype.
  *
  * This spec turns the first two into a build-time failure for every
  * oracle-checked catalog query (spec-only queries may keep nested types —
  * the driver records a rows-only check for them). The third lives on the
  * oracle side, invisible to a Spark schema — `tools/check.py` now hashes
  * dtype-sensitively and catches it at verify time.
  */
class HarnessContractSpec extends SparkSpec {

  private def driverSortable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _: DecimalType => false // value-exact but reader-normalization-unstable
    case _ => true // string/integral/float/bool/date/timestamp/binary
  }

  test("every oracle-checked query emits only atomic, driver-sortable columns") {
    val offenders = SparkEntry.catalog.filter(_.oracle.isDefined).flatMap { q =>
      q.run(spark, sf).schema.fields.collect {
        case f if !driverSortable(f.dataType) =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      "driver-unsortable result columns (serialize to a canonical string, " +
        "emit integer cents, or drop the oracle and keep a spec):\n  " +
        offenders.mkString("\n  "))
  }

  /** Probe the LIVE corpus shape. The r5 regression — the driver regenerated
    * /root/testdata with events.ts as micros-NTZ while the loader assumed
    * nanos-as-long — surfaced as 42 opaque driver rows instead of one named
    * test failure. This pins the contract: whatever physical encoding the
    * driver ships, Tables.events must normalize it to TimestampType, and it
    * must actually load rows. A future corpus-shape change fails HERE with
    * the table named. */
  test("live corpus: Tables.events loads and ts normalizes to TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${ev.schema("ts").dataType}, expected TimestampType")
    assert(ev.limit(1).count() == 1, "events table is empty or unreadable")
  }

  /** The micros-NTZ branch of Tables.events reinterprets a wall-clock in the
    * SESSION time zone; only UTC makes that the same instant the DuckDB
    * oracle reads. Assert the precondition rather than trusting every entry
    * point to keep routing through GraftSession. */
  test("session time zone is UTC (precondition of the NTZ events cast)") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
