package graft

import graft.avro.{AvroFunctions, AvroOcf}
import org.apache.spark.sql.functions._

/** The Avro Object Container File contract at the FILE level — what q225's
  * oracle row-compare cannot isolate: multi-container completeness, the
  * embedded-writer-schema discovery step, and schema RESOLUTION through the
  * container (a v2 reader consuming v1 files with defaults filled — the
  * consumer-upgrade path every Avro pipeline walks, here proven against
  * files instead of AvroCodecSpec's raw byte arrays). */
class AvroOcfSpec extends SparkSpec {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ocf_$tag").toString

  test("round-trip preserves every row across multiple container files") {
    import spark.implicits._
    val in = (1L to 10L).map(i => (i, s"name-$i", i * 1.5))
      .toDF("id", "name", "score").repartition(3)
    val schemaJson = AvroFunctions.writerSchemaFor(in.schema, "Rec")
    val out = tempDir("rt")
    AvroOcf.write(
      in.select(AvroFunctions.toAvro(
        struct(col("id"), col("name"), col("score")), "Rec").as("b"))
        .as[Array[Byte]],
      schemaJson, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, "expected one container per non-empty partition")
    val back = AvroOcf.readBinary(spark, out)
      .select(AvroFunctions.fromAvro(col("avro_value"), schemaJson).as("r"))
      .select(col("r.*"))
      .as[(Long, String, Double)].collect().toSet
    assert(back == in.as[(Long, String, Double)].collect().toSet)
  }

  test("v1 containers resolve into a v2 reader schema with defaults filled") {
    import spark.implicits._
    val in = Seq("e-1", "e-2").toDF("id")
    val v1 = AvroFunctions.writerSchemaFor(in.schema, "Evo")
    val out = tempDir("evo")
    AvroOcf.write(
      in.select(AvroFunctions.toAvro(struct(col("id")), "Evo").as("b"))
        .as[Array[Byte]],
      v1, out)
    // discovery: the reader learns the writer schema FROM the container
    val embedded = AvroOcf.embeddedSchema(spark, out)
    assert(embedded.isDefined &&
      new org.apache.avro.Schema.Parser().parse(embedded.get) ==
        new org.apache.avro.Schema.Parser().parse(v1))
    val v2 =
      """{"type":"record","name":"Evo","fields":[
        |  {"name":"id","type":"string"},
        |  {"name":"score","type":["null","double"],"default":null},
        |  {"name":"source","type":"string","default":"unknown"}]}""".stripMargin
    val evolved = AvroOcf.readBinary(spark, out)
      .select(AvroFunctions.fromAvro(col("avro_value"), v2, embedded.get).as("r"))
      .select(col("r.*"))
      .as[(String, Option[Double], String)].collect().toSet
    assert(evolved == Set(("e-1", None, "unknown"), ("e-2", None, "unknown")))
  }

  test("empty directory reads as an empty table and reports no schema") {
    val out = tempDir("empty")
    assert(AvroOcf.embeddedSchema(spark, out).isEmpty)
    assert(AvroOcf.readBinary(spark, out).count() == 0L)
  }
}
