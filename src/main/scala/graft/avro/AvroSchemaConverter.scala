package graft.avro

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro `Schema` ↔ Spark `StructType` converter (SURVEY.md §1.2/§1.3).
  *
  * The reference's data model is registry-resolved *generic* Avro
  * (`ReplicationApplication.java:63` types the listener `List<GenericRecord>`),
  * so schemas are runtime values, never compiled in. This converter is the
  * engine's equivalent of that dynamism: an Avro writer schema fetched at
  * runtime becomes a `StructType` that Catalyst plans against.
  *
  * Mapping (Avro → Catalyst):
  *  - primitives → corresponding atomic types; `bytes`/`fixed` → binary
  *  - `enum` → string (symbol name)
  *  - `record` → struct, `array` → array, `map` → map(string, _)
  *  - union `["null", T]` (either order) → nullable T — the exact shape of
  *    the reference fixture (`com.foo.Foo.avsc:10-17`)
  *  - general union `[A, B, ...]` → struct `{_tag: int, member0: A?,
  *    member1: B?, ...}` (nullable iff null ∈ union): exactly one memberI is
  *    non-null and `_tag` names its branch, so the mapping is lossless in
  *    both directions even for branches with identical runtime shapes
  *  - logical types: date → date; timestamp-millis/micros → timestamp;
  *    decimal(p,s) → decimal(p,s)
  */
object AvroSchemaConverter {

  /** Avro schema → Spark DataType + nullability. */
  def toSqlType(schema: Schema): (DataType, Boolean) = schema.getType match {
    case Schema.Type.NULL    => (NullType, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _                    => (IntegerType, false)
      }
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis      => (TimestampType, false)
        case _: LogicalTypes.TimestampMicros      => (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMillis => (TimestampNTZType, false)
        case _: LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
        case _                                    => (LongType, false)
      }
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.ENUM   => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _                       => (BinaryType, false)
      }
    case Schema.Type.RECORD =>
      val fields = schema.getFields.asScala.map { f =>
        val (dt, nullable) = toSqlType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toSeq
      (StructType(fields), false)
    case Schema.Type.ARRAY =>
      val (dt, nullable) = toSqlType(schema.getElementType)
      (ArrayType(dt, containsNull = nullable), false)
    case Schema.Type.MAP =>
      val (dt, nullable) = toSqlType(schema.getValueType)
      (MapType(StringType, dt, valueContainsNull = nullable), false)
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      val nullable = nonNull.size < branches.size
      nonNull match {
        case Seq() => (NullType, true)
        case Seq(only) =>
          val (dt, _) = toSqlType(only); (dt, nullable)
        case many =>
          // General union → tagged struct of nullable branches (the
          // spark-avro memberN convention plus an explicit `_tag` ordinal
          // into the non-null branches). Exactly one memberI is non-null,
          // and _tag names it — so branch projections are plain column
          // references and re-encoding is unambiguous even for branches
          // whose runtime values look alike.
          val fields = StructField(UnionTagField, IntegerType, nullable = false) +:
            many.zipWithIndex.map { case (b, i) =>
              val (dt, _) = toSqlType(b)
              StructField(s"member$i", dt, nullable = true)
            }
          (StructType(fields), nullable)
      }
  }

  /** Tag field name of the struct a multi-branch union maps to. */
  val UnionTagField = "_tag"

  def toStructType(schema: Schema): StructType =
    toSqlType(schema)._1 match {
      case st: StructType => st
      case dt => throw new IllegalArgumentException(s"top-level Avro schema must be a record, got $dt")
    }

  /** Spark DataType → Avro schema. Nullable values become ["null", T]. */
  def toAvroSchema(dt: DataType, nullable: Boolean, name: String, namespace: String): Schema = {
    val base: Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroSchema(et, containsNull, s"${name}_item", namespace))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvroSchema(vt, valueContainsNull, s"${name}_value", namespace))
      case st: StructType =>
        val b = SchemaBuilder.record(name).namespace(namespace).fields()
        st.fields.foldLeft(b) { (acc, f) =>
          val fs = toAvroSchema(f.dataType, f.nullable, f.name, s"$namespace.$name")
          if (f.nullable) acc.name(f.name).`type`(fs).withDefault(null)
          else acc.name(f.name).`type`(fs).noDefault()
        }.endRecord()
      case other =>
        throw new UnsupportedOperationException(s"cannot map $other to Avro")
    }
    if (nullable && dt != NullType && base.getType != Schema.Type.UNION)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def toAvroSchema(st: StructType, name: String = "topLevelRecord",
                   namespace: String = "graft"): Schema =
    toAvroSchema(st, nullable = false, name, namespace)
}
