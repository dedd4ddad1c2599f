package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Degenerate-corpus synthesizer for the catalog-wide edge sweep.
  *
  * Writes the full ten-table star schema (TESTDATA.md layout, exact column
  * names and physical types) with ZERO rows, ONE internally consistent row,
  * or EIGHT duplicate-payload rows (ties corpus — see [[pkIndex]]) per
  * table. The r2–r4 history shows a recurring failure
  * class — a guard discovered reactively one round at a time (q136 stride,
  * q148 sub-ppm, q155 empty-text): each was a query that silently assumed
  * "the corpus is non-trivial". This corpus makes that assumption testable
  * for every catalog entry at once (DegenerateCorpusSpec), the way the
  * reference asserts behavior on the emptiest possible input instead of
  * only the happy path (reference ReplicationApplicationTest.java:117-124
  * drives a single record end-to-end).
  *
  * `events.ts` is written in BOTH physical shapes the loader supports —
  * the corpus generation of Aug 13 proved the encoding is a driver choice
  * that changes over time, so the sweep must exercise every branch of
  * [[Tables.events]]'s schema probe, not pin one "permanent" shape:
  *
  *  - `micros` (default): TIMESTAMP_NTZ micros — the shape the driver
  *    ships since Aug 13 (TIMESTAMP(MICROS, isAdjustedToUTC=false)).
  *  - `nanos`: a plain long of nanoseconds — what a TIMESTAMP(NANOS) file
  *    looks like under `nanosAsLong=true` (pre-Aug-13 corpora).
  *
  * tools/check.py detects the observed `ts` type on the DuckDB side and
  * bridges the BIGINT form with make_timestamp.
  */
object EdgeCorpus {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (schema, the single consistent row) per table. The row values follow
    * the driver generator's formats (Customer#%09d names, Brand#N, real
    * region names, src0 sources, JSON props) so format-parsing queries see
    * representative input, and every FK resolves: the one lineitem belongs
    * to the one order by the one customer in the one nation, etc.
    */
  private val tables: Seq[(String, StructType, Row)] = Seq(
    ("region",
      StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType))),
      Row(0, "AFRICA")),
    ("nation",
      StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))),
      Row(0, "NATION_0", 0)),
    ("customer",
      StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))),
      Row(0L, "Customer#000000000", 0, 2095.23, "BUILDING")),
    ("supplier",
      StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType))),
      Row(0L, "Supplier#000000000", 0, 4090.79)),
    ("part",
      StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_name", StringType),
        StructField("p_brand", StringType),
        StructField("p_type", StringType),
        StructField("p_size", IntegerType),
        StructField("p_retailprice", DoubleType))),
      Row(0L, "cold widget", "Brand#13", "ECONOMY", 24, 900.0)),
    ("orders",
      StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampType),
        StructField("o_orderpriority", StringType))),
      Row(0L, 0L, "F", 144449.04, ts("1997-01-15 00:00:00"), "3-MEDIUM")),
    ("lineitem",
      StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_partkey", LongType),
        StructField("l_suppkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType),
        StructField("l_tax", DoubleType),
        StructField("l_returnflag", StringType),
        StructField("l_linestatus", StringType),
        StructField("l_shipdate", TimestampType))),
      Row(0L, 0L, 0L, 1, 17.0, 1200.5, 0.05, 0.02, "N", "O",
        ts("1997-02-01 00:00:00"))),
    ("events",
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampNTZType), // shape-swapped by write(); see scaladoc
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))),
      // 2024-01-01T00:00:00 — same instant in both physical shapes
      Row(0L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0), 0L,
        "purchase", 185.22, "{\"k\": 87}")),
    ("documents",
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))),
      Row(0L,
        "the fast key order sort table scan merge part window small hash " +
          "scan join order ",
        "es", "src0", 128L)),
    ("embeddings",
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))),
      Row(0L,
        (0 until 64).map(i => (((i * 37 + 11) % 101) - 50) / 100.0f).toArray
          .toSeq,
        5)))

  /** Primary-key column index per table — the ONE column the `rows = 8`
    * duplicate-payload corpus varies (0..7); every other column, including
    * foreign keys (pinned to 0) and all payloads, stays byte-identical
    * across the 8 rows. The point is maximal TIES: 8 events at the same
    * instant for the same user, 8 identical documents, 8 equal-price
    * lineitems — any query whose ORDER BY / top-k / keeper rule is not a
    * genuine total order diverges from the oracle here and nowhere else. */
  private val pkIndex: Map[String, Int] = Map(
    "region" -> 0, "nation" -> 0, "customer" -> 0, "supplier" -> 0,
    "part" -> 0, "orders" -> 0, "lineitem" -> 0, "events" -> 0,
    "documents" -> 0, "embeddings" -> 0)

  /** Write the corpus. `rows = 0` (empty tables, schema present) or
    * `rows = 1` (the one consistent row everywhere). `tsShape` picks the
    * events.ts physical encoding: "micros" (TIMESTAMP_NTZ, the driver's
    * current shape) or "nanos" (long of nanoseconds, the legacy shape).
    * Overwrites. */
  def write(spark: SparkSession, dir: String, rows: Int,
            tsShape: String = "micros", bpeExhaust: Boolean = false): Unit = {
    require(rows == 0 || rows == 1 || rows == 8,
      s"rows must be 0, 1, or 8 (duplicate-payload ties corpus), got $rows")
    require(tsShape == "micros" || tsShape == "nanos",
      s"tsShape must be micros or nanos, got $tsShape")
    tables.foreach { case (name, schema0, row0pick) =>
      val row0 =
        if (name == "documents" && bpeExhaust)
          // ADVICE r6: a text whose BPE pairs exhaust after ONE merge round
          // ("ab ab ab": round 1 merges (a,b), rounds 2-3 find no pair), so
          // the catalog sweep + tools/check.py exercise the NULL-merge no-op
          // branch of bpeFoldSql and the trainer's early stop on BOTH engines
          Row.fromSeq(row0pick.toSeq.updated(1, "ab ab ab").updated(4, 8L))
        else row0pick
      val (schema, row) =
        if (name == "events" && tsShape == "nanos") {
          val s = StructType(schema0.map(f =>
            if (f.name == "ts") f.copy(dataType = LongType) else f))
          val vals = row0.toSeq.zipWithIndex.map {
            case (v: java.time.LocalDateTime, _) =>
              v.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L +
                v.getNano
            case (v, _) => v
          }
          (s, Row.fromSeq(vals))
        } else (schema0, row0)
      val data =
        if (rows == 0) Seq.empty[Row]
        else if (rows == 1) Seq(row)
        else {
          val pk = pkIndex(name)
          (0 until rows).map { i =>
            val v = row.get(pk) match {
              case _: Int  => i
              case _: Long => i.toLong
              case other => throw new IllegalStateException(
                s"$name pk col $pk has non-integral type ${other.getClass}")
            }
            Row.fromSeq(row.toSeq.updated(pk, v))
          }
        }
      spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(data).asJava), schema)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
  }

  /** CLI: `runMain graft.EdgeCorpus <outDir> <0|1> [micros|nanos] [bpex]` —
    * lets the verify loop build the same corpora for the DuckDB cross-check
    * (tools/check.py). `bpex` swaps documents.text for the BPE-exhausting
    * one-word corpus. */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    write(spark, args(0), args(1).toInt,
      if (args.length > 2) args(2) else "micros",
      bpeExhaust = args.length > 3 && args(3) == "bpex")
    spark.stop()
  }
}
