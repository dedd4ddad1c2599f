package graft.avro

import java.io.ByteArrayOutputStream
import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Catalyst ↔ Avro value codec over avro-core (no spark-avro jar in this
  * sandbox — SURVEY.md §7 environment constraints; semantics follow the
  * reference's registry-resolved GenericRecord model,
  * `ReplicationApplication.java:63` / `application.yml:11-16`).
  *
  * Converts between Catalyst *internal* values (UTF8String, micros-since-epoch
  * longs, ArrayData/MapData, Decimal) and Avro generic values, and
  * binary-encodes/decodes with a reused per-thread Encoder/Decoder pair.
  */
object AvroCodec {

  /** The non-null branch of a ["null", T] union, else the schema itself. */
  def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** The non-null branches of a union (a non-union counts as one branch). */
  def nonNullBranches(s: Schema): Seq[Schema] =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq
    else Seq(s)

  // ---------------------------------------------------------------- encode

  /** Catalyst internal value → Avro generic value under `schema`. */
  def catalystToAvro(value: Any, dt: DataType, schema: Schema): AnyRef = {
    if (value == null) return null
    val branches = nonNullBranches(schema)
    if (branches.size > 1) {
      // general union: value is the tagged struct; _tag picks the branch
      val st = dt match {
        case st: StructType
            if st.fieldNames.headOption.contains(AvroSchemaConverter.UnionTagField) => st
        case other => throw new UnsupportedOperationException(
          s"union ${schema} needs a {_tag, member*} struct, got $other")
      }
      val row = value.asInstanceOf[InternalRow]
      val tag = row.getInt(0)
      require(tag >= 0 && tag < branches.size,
        s"union _tag $tag out of range for ${branches.size} branches")
      val memberDt = st.fields(tag + 1).dataType
      val member = if (row.isNullAt(tag + 1)) null else row.get(tag + 1, memberDt)
      require(member != null,
        s"union _tag $tag names member${tag} but it is null")
      return catalystToAvro(member, memberDt, branches(tag))
    }
    val s = nonNull(schema)
    (dt, s.getType) match {
      case (BooleanType, _) | (IntegerType, _) | (LongType, _) |
           (FloatType, _) | (DoubleType, _) =>
        // identical physical representation; timestamps handled below
        (dt, s.getLogicalType) match {
          case (LongType, _: LogicalTypes.TimestampMillis) =>
            // floorDiv: pre-epoch micros must round toward -∞, not zero
            java.lang.Long.valueOf(Math.floorDiv(value.asInstanceOf[Long], 1000L))
          case _ => value.asInstanceOf[AnyRef]
        }
      case (TimestampType, Schema.Type.LONG) | (TimestampNTZType, Schema.Type.LONG) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
            java.lang.Long.valueOf(Math.floorDiv(value.asInstanceOf[Long], 1000L))
          case _ => java.lang.Long.valueOf(value.asInstanceOf[Long]) // micros
        }
      case (DateType, Schema.Type.INT) => value.asInstanceOf[AnyRef]
      case (ByteType, Schema.Type.INT) =>
        java.lang.Integer.valueOf(value.asInstanceOf[Byte].toInt)
      case (ShortType, Schema.Type.INT) =>
        java.lang.Integer.valueOf(value.asInstanceOf[Short].toInt)
      case (StringType, Schema.Type.ENUM) =>
        new GenericData.EnumSymbol(s, value.toString)
      case (StringType, _) => value.toString
      case (BinaryType, Schema.Type.FIXED) =>
        new GenericData.Fixed(s, value.asInstanceOf[Array[Byte]])
      case (BinaryType, _) => ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case (d: DecimalType, _) =>
        ByteBuffer.wrap(value.asInstanceOf[Decimal]
          .toJavaBigDecimal.unscaledValue().toByteArray)
      case (st: StructType, Schema.Type.RECORD) =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.length) {
          val f = st.fields(i)
          val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(i, catalystToAvro(v, f.dataType, s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case (ArrayType(et, _), Schema.Type.ARRAY) =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          val v = if (arr.isNullAt(i)) null else arr.get(i, et)
          out.add(catalystToAvro(v, et, s.getElementType))
          i += 1
        }
        out
      case (MapType(StringType, vt, _), Schema.Type.MAP) =>
        val m = value.asInstanceOf[MapData]
        val out = new java.util.HashMap[String, AnyRef](m.numElements())
        val keys = m.keyArray()
        val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val v = if (vals.isNullAt(i)) null else vals.get(i, vt)
          out.put(keys.getUTF8String(i).toString, catalystToAvro(v, vt, s.getValueType))
          i += 1
        }
        out
      case other =>
        throw new UnsupportedOperationException(s"encode: unsupported $other")
    }
  }

  // ---------------------------------------------------------------- decode

  /** Avro generic value → Catalyst internal value under `dt`. */
  def avroToCatalyst(value: AnyRef, schema: Schema, dt: DataType): Any = {
    if (value == null) return null
    val branches = nonNullBranches(schema)
    if (branches.size > 1) {
      // general union → tagged struct: resolve which branch produced the
      // value (same dispatch GenericDatumWriter uses), set _tag + memberI
      val st = dt.asInstanceOf[StructType]
      val idx = GenericData.get().resolveUnion(schema, value)
      val branchSchema = schema.getTypes.get(idx)
      val tag = branches.indexWhere(_ eq branchSchema)
      require(tag >= 0, s"resolved union branch $branchSchema is the null branch for non-null value")
      val out = new GenericInternalRow(st.length)
      out.update(0, tag)
      out.update(tag + 1, avroToCatalyst(value, branchSchema, st.fields(tag + 1).dataType))
      return out
    }
    val s = nonNull(schema)
    (s.getType, dt) match {
      case (Schema.Type.BOOLEAN, _) | (Schema.Type.FLOAT, _) |
           (Schema.Type.DOUBLE, _) => value
      case (Schema.Type.INT, _) => value // also date: days-since-epoch both sides
      case (Schema.Type.LONG, TimestampType) | (Schema.Type.LONG, TimestampNTZType) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
            value.asInstanceOf[java.lang.Long] * 1000L
          case _ => value // micros
        }
      case (Schema.Type.LONG, _) => value
      case (Schema.Type.STRING, _) | (Schema.Type.ENUM, _) =>
        UTF8String.fromString(value.toString)
      case (Schema.Type.BYTES, _: DecimalType) | (Schema.Type.FIXED, _: DecimalType) =>
        val d = dt.asInstanceOf[DecimalType]
        val bytes = value match {
          case bb: ByteBuffer => bytesOf(bb)
          case f: GenericData.Fixed => f.bytes()
        }
        Decimal(new java.math.BigDecimal(new BigInteger(bytes), d.scale), d.precision, d.scale)
      case (Schema.Type.BYTES, _) => bytesOf(value.asInstanceOf[ByteBuffer])
      case (Schema.Type.FIXED, _) => value.asInstanceOf[GenericData.Fixed].bytes()
      case (Schema.Type.RECORD, st: StructType) =>
        val rec = value.asInstanceOf[GenericRecord]
        val out = new GenericInternalRow(st.length)
        var i = 0
        while (i < st.length) {
          out.update(i, avroToCatalyst(rec.get(i), s.getFields.get(i).schema(), st.fields(i).dataType))
          i += 1
        }
        out
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val in = value.asInstanceOf[java.util.List[AnyRef]]
        val out = new Array[Any](in.size())
        var i = 0
        while (i < in.size()) { out(i) = avroToCatalyst(in.get(i), s.getElementType, et); i += 1 }
        new GenericArrayData(out)
      case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
        val in = value.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        val keys = new Array[Any](in.size())
        val vals = new Array[Any](in.size())
        var i = 0
        val it = in.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = avroToCatalyst(e.getValue, s.getValueType, vt)
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      case other =>
        throw new UnsupportedOperationException(s"decode: unsupported $other")
    }
  }

  private def bytesOf(bb: ByteBuffer): Array[Byte] = {
    val dup = bb.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }

  // ------------------------------------------------------------- byte-level

  /** Binary-encode one GenericRecord (Avro binary body, no container). */
  def encode(rec: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode one Avro binary body with identical writer/reader schema. */
  def decode(bytes: Array[Byte], schema: Schema): GenericRecord =
    decode(bytes, schema, schema)

  /** Decode with schema resolution (Avro spec §Schema Resolution): the
    * registry supplies the writer schema the bytes were produced with; the
    * consumer reads under its own (possibly newer) reader schema — added
    * fields take their defaults, removed fields are skipped, and compatible
    * promotions apply. */
  def decode(bytes: Array[Byte], writer: Schema, reader: Schema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, dec)
  }
}
