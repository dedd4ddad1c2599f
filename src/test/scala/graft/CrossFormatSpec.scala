package graft

import graft.avro.{AvroFunctions, AvroOcf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE gate for the whole per-format dtype-drift failure class: the same
  * typed rows (BIGINT + TIMESTAMP + DOUBLE + text — the q224 events shape)
  * are staged through every at-rest format the engine speaks — parquet,
  * ORC, Avro OCF, CSV, JSON — read back with an explicit schema, and
  * asserted cell-identical across all five, doubles compared by BITS and
  * timestamps at micros precision. Historical members of the class this
  * collapses: the round-5 parquet TIMESTAMP(NANOS) read failure, the
  * round-8 ORC timestamp shape, and the text formats' default pattern
  * truncating timestamps to millis on write (why `tsFmt` spells out all
  * six fraction digits). Degenerate corpora ride the same gate: empty,
  * one row, and the 8-duplicate-payload ties shape from EdgeCorpus /
  * DegenerateCorpusSpec. */
class CrossFormatSpec extends SparkSpec {

  private val ddl = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING"
  // text formats need the micros spelled out: the default timestamp
  // pattern writes millis only — exactly the drift this gate exists for
  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_xfmt_$tag").toString + "/t"

  private val formats = Seq("parquet", "orc", "ocf", "csv", "json")

  private def roundTrip(df: DataFrame, fmt: String, dir: String): DataFrame =
    fmt match {
      case "parquet" =>
        df.write.mode("overwrite").parquet(dir)
        spark.read.schema(ddl).parquet(dir)
      case "orc" =>
        df.write.mode("overwrite").orc(dir)
        spark.read.schema(ddl).orc(dir)
      case "csv" =>
        df.write.mode("overwrite").option("header", "false")
          .option("timestampFormat", tsFmt).csv(dir)
        spark.read.schema(ddl).option("header", "false")
          .option("timestampFormat", tsFmt).csv(dir)
      case "json" =>
        df.write.mode("overwrite").option("timestampFormat", tsFmt).json(dir)
        spark.read.schema(ddl).option("timestampFormat", tsFmt).json(dir)
      case "ocf" =>
        import spark.implicits._
        val schemaJson = AvroFunctions.writerSchemaFor(df.schema, "Ev")
        AvroOcf.write(df.select(AvroFunctions.toAvro(
          struct(df.columns.toIndexedSeq.map(col): _*), "Ev").as("b"))
          .as[Array[Byte]], schemaJson, dir)
        AvroOcf.readBinary(spark, dir, Some(schemaJson))
          .select(AvroFunctions.fromAvro(col("avro_value"), schemaJson).as("r"))
          .select(col("r.*"))
    }

  /** Canonical cell encoding: timestamps as epoch micros, doubles as raw
    * bits — a format that loses precision cannot hash-collide its way
    * past this. */
  private def canon(df: DataFrame): Seq[String] =
    df.select(col("event_id"), unix_micros(col("ts")).as("tsu"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .collect().map { r =>
        s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|${r.getString(3)}|" +
          s"${java.lang.Double.doubleToLongBits(r.getDouble(4))}|${r.getString(5)}"
      }.sorted.toSeq

  private def assertIdentical(name: String, df: DataFrame, expectRows: Long): Unit = {
    val results = formats.map(fmt =>
      fmt -> canon(roundTrip(df, fmt, tempDir(s"${name}_$fmt"))))
    val (refFmt, ref) = results.head
    assert(ref.length.toLong == expectRows,
      s"[$name] $refFmt row count ${ref.length} != expected $expectRows")
    results.tail.foreach { case (fmt, got) =>
      val firstDiff = ref.zipAll(got, "<missing>", "<missing>")
        .find { case (a, b) => a != b }
      assert(got == ref,
        s"[$name] $fmt diverged from $refFmt at ${got.length}/${ref.length} " +
          s"rows; first differing cell-row: $firstDiff")
    }
  }

  test("the typed events shape survives parquet, ORC, OCF, CSV and JSON cell-identically") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assertIdentical("corpus", ev, ev.count())
  }

  test("degenerate corpora (empty, one row, 8 duplicate payloads) survive all five formats") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assertIdentical("empty", empty, 0L)

    // micros-precision instant + a props payload that stresses CSV quoting
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val one = Seq((42L, ts, 7L, "view", 3.0000001, """{"k":"v,\"q\""}"""))
      .toDF(cols: _*)
    assertIdentical("one", one, 1L)

    // ties shape: identical payloads, only the pk varies (EdgeCorpus 8)
    val ties = (1L to 8L).map(i => (i, ts, 7L, "view", 2.25, """{"dup":true}"""))
      .toDF(cols: _*)
    assertIdentical("ties", ties, 8L)
  }
}
