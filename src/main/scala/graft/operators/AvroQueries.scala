package graft.operators

import graft.{GraftQuery, Tables}
import graft.avro.{AvroFunctions, InMemorySchemaRegistry}
import org.apache.avro.Schema
import org.apache.spark.sql.functions._

/** The reference's own dataflow, oracle-checked in batch form: Avro
  * encode/decode (R2/R7, `application.yml:11-16`) and the id→key projection
  * (R3, `ReplicationApplication.java:71`). The streaming execution of the
  * same pipeline — micro-batches, checkpoint commit, atomic sink — lives in
  * graft.streaming.Replication and is spec-tested; these two queries prove
  * the codec and the projection against DuckDB on the driver's tables.
  */
object AvroQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q49_avro_roundtrip",
      Some("SELECT * FROM orders ORDER BY o_orderkey"),
      "Encode every orders row to Avro binary and decode it back — a " +
        "row-local projection pair with zero shuffle; the oracle equality " +
        "proves the codec (incl. timestamp-micros) is lossless. At 100 TB " +
        "this is the per-record cost of the replication path: two " +
        "expression evaluations per row, pipelined inside the scan stage."
    ) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val schemaJson = AvroFunctions.writerSchemaFor(o.schema, "Order")
      o.select(AvroFunctions.toAvro(struct(o.columns.map(col): _*), "Order").as("avro_value"))
        .select(AvroFunctions.fromAvro(col("avro_value"), schemaJson).as("r"))
        .select(col("r.*"))
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q50_replication_project",
      Some("""SELECT CAST(event_id AS VARCHAR) AS key,
             |       event_id, ts, user_id, event_type, value, props
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "The whole reference pipeline as one batch plan: decode(encode(row)) " +
        "+ key := value.id (R2/R3/R7). Source and target registries see the " +
        "writer schema registered exactly once (content-addressed id), " +
        "mirroring 'only the necessary Avro schema is registered' " +
        "(README.adoc:11-12). Row-local; partition-parallel with no exchange."
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val schemaJson = AvroFunctions.writerSchemaFor(ev.schema, "Event")
      // R7: auto-registration on first produce, against both registries.
      val source = new InMemorySchemaRegistry
      val target = new InMemorySchemaRegistry
      val parsed = new Schema.Parser().parse(schemaJson)
      source.register("events-value", parsed)
      target.register("events-value", parsed)
      ev.select(AvroFunctions.toAvro(struct(ev.columns.map(col): _*), "Event").as("avro_value"))
        .select(AvroFunctions.fromAvro(col("avro_value"), schemaJson).as("r"))
        .select(col("r.event_id").cast("string").as("key"), col("r.*"))
        .orderBy("event_id")
    }
  )
}
