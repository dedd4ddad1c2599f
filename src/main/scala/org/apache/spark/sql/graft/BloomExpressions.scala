package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Shared bit math for the engine's Bloom filter: the builder aggregate sets
  * bits in an `Array[Long]` word buffer, the membership test probes the
  * SERIALIZED byte form directly (no deserialization per row), so the two
  * sides must agree on one layout — big-endian longs, as written by
  * [[SketchAggBase.serialize]].
  *
  * Probe schedule is Kirsch–Mitzenmacher double hashing (h1 + i·h2, h2
  * forced odd) over a SplitMix64 re-mix of the input, which needs the input
  * to already be a well-mixed 64-bit hash (the engine feeds xxhash64
  * shingle hashes). k is fixed: the filter's operating point is chosen via
  * its size, and a single constant keeps build and probe trivially in sync.
  */
object BloomMath {
  /** Probes per key; fp ≈ (1 − e^(−k·n/m))^k, optimal k = (m/n)·ln2. */
  val NumHashes = 5

  /** SplitMix64 finalizer — decorrelates the probe streams from the raw
    * input hash (and from xxhash64's own output structure). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `h` in the word buffer (numBits = 64·words,
    * must be a power of two). */
  def set(words: Array[Long], h: Long): Unit = {
    val mask = (words.length << 6) - 1
    val h1 = mix(h)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val b = ((h1 + i * h2) & 0x7FFFFFFFFFFFFFFFL).toInt & mask
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  /** Probe the serialized (big-endian long words) filter for `h`. Bit j of
    * word w lives at byte 8w + (7 − j/8), position j mod 8. */
  def contains(bytes: Array[Byte], h: Long): Boolean = {
    val mask = (bytes.length << 3) - 1
    val h1 = mix(h)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val b = ((h1 + i * h2) & 0x7FFFFFFFFFFFFFFFL).toInt & mask
      val w = b >>> 6
      val j = b & 63
      val byteIdx = (w << 3) + 7 - (j >>> 3)
      if (((bytes(byteIdx) >> (j & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom filter over a column of 64-bit key hashes (Bloom, CACM
  * 1970): fixed `numBits`-wide bit array through the shuffle, bitwise-OR
  * merge, serialized once per shuffle block like the other engine sketches.
  * Size with m ≈ −n·ln(p)/(ln 2)² for target fp rate p — ~1.2 GB keys at
  * p=1% fit in ~1.4 bits/key·n, which is why a billion-key eval set that
  * could never broadcast as a join side ships to every executor as a
  * filter. Null inputs are skipped (a Bloom filter has no null slot).
  */
case class BloomSketch(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAggBase {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two ≥ 64, got $numBits")

  override def prettyName: String = "graft_bloom"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomMath.set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

/** `contains(filter, keyHash)` — probes the serialized filter for a key.
  *
  * The filter side must be a CONSTANT per query — a literal or an
  * uncorrelated scalar subquery (the `Sketches.bloomOf` builder) — and is
  * materialized ONCE, driver-side, after subquery evaluation; per-row
  * codegen touches it only through a reference object. This mirrors how
  * Spark's own runtime-filter `might_contain` works, and it matters: a
  * binary column read per row out of a joined/broadcast row copies the
  * whole serialized filter (hundreds of KB) for every probed row, which
  * turns an O(1) bit probe into a memcpy storm. The hot path at 100 TB is
  * this probe over every corpus shingle inside whole-stage codegen.
  * No false negatives; false positives at the filter's designed rate. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.LongType) =>
        left match {
          case e if e.foldable => TypeCheckResult.TypeCheckSuccess
          // correlated subqueries would make the filter row-dependent,
          // which the once-per-query materialization cannot honor
          case p: PlanExpression[_]
              if !p.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.OUTER_REFERENCE) =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"the filter input to $prettyName must be a constant or an " +
              "uncorrelated scalar subquery, so it can be materialized once " +
              "per query instead of once per row")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY, BIGINT), got ($l, $r)")
    }

  /** Materialized once per query execution (after subquery evaluation);
    * shared by every row this expression instance probes. */
  @transient private lazy val filterBytes: Array[Byte] =
    left.eval(null).asInstanceOf[Array[Byte]]

  override def eval(input: InternalRow): Any = {
    if (filterBytes == null) null
    else {
      val v = right.eval(input)
      if (v == null) null
      else BloomMath.contains(filterBytes, v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filterBytes == null) {
      ev.copy(isNull = TrueLiteral, value = FalseLiteral)
    } else {
      val bits = ctx.addReferenceObj("graftBloomBits", filterBytes, "byte[]")
      val rightEval = right.genCode(ctx)
      ev.copy(code = code"""
        ${rightEval.code}
        boolean ${ev.isNull} = ${rightEval.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = org.apache.spark.sql.graft.BloomMath.contains(
            $bits, ${rightEval.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
