package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import graft.functions.Sketches
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native TypedImperativeAggregate versions of the MinHash / SimHash
  * sketches.
  *
  * The `udaf(Aggregator)` wrapper round-trips the aggregation buffer through
  * its Encoder on EVERY input row (deserialize → update → serialize); with a
  * 64-long buffer that dominates the runtime of signature building (~9s of a
  * 34s sf0.1 bench). A TypedImperativeAggregate keeps the buffer as a raw
  * `Array[Long]` for the whole partition and serializes once per shuffle
  * block — the same design Spark uses for percentile / HLL sketches.
  *
  * Parameters and per-element math are shared with
  * [[graft.functions.Sketches]] so both implementations produce identical
  * signatures (the Aggregator form remains as the spec'd reference model).
  */
abstract class SketchAggBase extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  final override def nullable: Boolean = false
  final override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  final override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

case class MinHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(Sketches.NumMinHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else Sketches.minhashReduce(buf, v.asInstanceOf[Long])
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

/** Row-local MinHash over an `array<long>` of element hashes: when the
  * elements already sit in one row (a per-document shingle array), the
  * signature needs NO explode and NO aggregation shuffle — it is a scalar
  * projection inside the scan stage. The aggregate form remains for inputs
  * too large to hold per-row (the exploded stream bounds memory). Shares
  * the per-element math with [[graft.functions.Sketches]], so both forms
  * produce identical signatures. */
case class MinHashOfArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "graft_minhash_array"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val buf = Array.fill(Sketches.NumMinHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) Sketches.minhashReduce(buf, arr.getLong(i))
      i += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashOfArray =
    copy(child = newChild)
}

/** Row-local SimHash over an `array<long>` of element hashes. */
case class SimHashOfArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "graft_simhash_array"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val buf = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) Sketches.simhashReduce(buf, arr.getLong(i))
      i += 1
    }
    Sketches.simhashFinish(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashOfArray =
    copy(child = newChild)
}

case class SimHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else Sketches.simhashReduce(buf, v.asInstanceOf[Long])
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < 64) { x(k) += y(k); k += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any = Sketches.simhashFinish(buf)

  override def withNewMutableAggBufferOffset(o: Int): SimHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
}
