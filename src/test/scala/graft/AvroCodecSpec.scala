package graft

import graft.avro.{AvroCodec, AvroFunctions, AvroSchemaConverter, InMemorySchemaRegistry, SchemaRegistry}
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** M1 acceptance (SURVEY.md §7): schema conversion + binary round-trips,
  * including the reference fixture shape — a required string `id` and a
  * nullable-union string (`com.foo.Foo.avsc:6-17`). */
class AvroCodecSpec extends SparkSpec {

  /** The reference's test fixture schema, rebuilt the way the reference's
    * test does (`ReplicationApplicationTest.java:91-93`). */
  private val fooSchema: Schema = SchemaBuilder.builder("com.foo").record("Foo")
    .fields()
    .name("id").`type`("string").noDefault()
    .name("name").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
    .endRecord()

  test("com.foo.Foo avsc shape maps to struct<id:string, name:string?>") {
    val st = AvroSchemaConverter.toStructType(fooSchema)
    assert(st === StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = true))))
  }

  test("fixture record round-trips through binary, nulls preserved") {
    val gen = Gen.zip(Gen.uuid, Gen.option(Gen.alphaNumStr))
    (0 until 100).foreach { i =>
      val (id, name) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val rec = new GenericData.Record(fooSchema)
      rec.put("id", id.toString)
      rec.put("name", name.orNull)
      val out = AvroCodec.decode(AvroCodec.encode(rec, fooSchema), fooSchema)
      assert(out.get("id").toString === id.toString)
      assert(Option(out.get("name")).map(_.toString) === name)
    }
  }

  test("StructType -> Avro -> StructType is stable for all engine types") {
    val st = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("dec", DecimalType(10, 2), nullable = true),
      StructField("arr", ArrayType(LongType, containsNull = false), nullable = true),
      StructField("m", MapType(StringType, DoubleType, valueContainsNull = false), nullable = true),
      StructField("nested", StructType(Seq(
        StructField("x", LongType, nullable = false))), nullable = true)))
    val avro = AvroSchemaConverter.toAvroSchema(st, "T")
    val back = AvroSchemaConverter.toStructType(avro)
    assert(back === st)
  }

  test("dataframe round-trip equals identity on orders (all rows)") {
    val o = Tables.orders(spark, sf)
    val schemaJson = AvroFunctions.writerSchemaFor(o.schema, "Order")
    val rt = o
      .select(AvroFunctions.toAvro(struct(o.columns.map(col): _*), "Order").as("v"))
      .select(AvroFunctions.fromAvro(col("v"), schemaJson).as("r"))
      .select(col("r.*"))
    assert(rt.schema.map(f => (f.name, f.dataType)) ===
      o.schema.map(f => (f.name, f.dataType)))
    assert(rt.exceptAll(o).isEmpty && o.exceptAll(rt).isEmpty)
  }

  test("registry ids are content-addressed and idempotent across registries") {
    val a = new InMemorySchemaRegistry
    val b = new InMemorySchemaRegistry
    val id1 = a.register("foo-value", fooSchema)
    val id2 = a.register("foo-value", fooSchema)
    val id3 = b.register("foo-value", fooSchema)
    assert(id1 === id2 && id1 === id3)
    assert(id1 === SchemaRegistry.fingerprint(fooSchema))
    assert(a.latest("foo-value").map(_._1) === Some(id1))
  }
}
