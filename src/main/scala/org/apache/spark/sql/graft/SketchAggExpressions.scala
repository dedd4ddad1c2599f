package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import graft.functions.Sketches
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** Mergeable Misra-Gries heavy-hitters summary over a string column
  * (Agarwal et al., "Mergeable Summaries", PODS'12): at most `k` counters;
  * an untracked item with all counters busy decrements every counter
  * (amortized O(1)/row — each decrement round retires k+1 units of total
  * count); merging sums counters pairwise, then subtracts the (k+1)-th
  * largest count and drops non-positives, which preserves the MG bound.
  *
  * Contract: every reported count ≤ true count, every item with true count
  * > n/(k+1) is present, and reported ≥ true − n/(k+1). Fixed-size partial
  * state through the shuffle — the only viable exact-top-k alternative at
  * 100 TB is a full (term, count) aggregation whose distinct-term
  * cardinality is unbounded.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k > 0, "heavy-hitters capacity must be positive")

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(
      buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString // copies out of the reused UTF8String buffer
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          val dead = List.newBuilder[String]
          buf.foreachEntry((t, c) => if (c == 1) dead += t else buf.update(t, c - 1))
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      x: scala.collection.mutable.HashMap[String, Long],
      y: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    y.foreachEntry((t, c) => x.update(t, x.getOrElse(t, 0L) + c))
    if (x.size > k) {
      val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = List.newBuilder[String]
      x.foreachEntry((t, c) => if (c - cut <= 0) dead += t else x.update(t, c - cut))
      dead.result().foreach(x.remove)
    }
    x
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), c) }
      .toArray[Any])

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
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

/** One-pass distinct rolling-window byte-shingle fingerprints of a binary
  * column: every 8-byte window of the payload folds base-256 modulo the
  * prime `p` (`acc = (acc * 256 + byte) % p` — with `p < 2^40` every
  * intermediate stays below 2^48, so the identical arithmetic replays in
  * engines without 64-bit wraparound multiply, e.g. a DuckDB oracle
  * working from `hex(payload)`), and first-occurrence-distinct
  * fingerprints come back as one `array<long>` ready for
  * [[SimHashOfArray]] / [[MinHashOfArray]].
  *
  * This expression exists because the declarative form is a plan poison:
  * building the byte array via `split(hex(payload), "")` +
  * `transform`/`aggregate` HOFs gets re-inlined across every alias
  * consumer (the round-2 `element_at` poison), turning an O(L) build into
  * O(L²) interpreted work with per-character string allocation — 229 s at
  * sf0.1 for 5k docs of ~330 bytes. Here the payload is walked ONCE as raw
  * bytes inside whole-stage codegen (the generated code is a single static
  * call), and a payload shorter than one window yields an empty array —
  * callers gate with `length(payload) >= 8`, the exact octet-count
  * equivalent of the oracle's `len(bv) >= 8`.
  */
case class ByteShingles(child: Expression, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(p > 0 && p < (1L << 40), s"shingle modulus must be in (0, 2^40): $p")

  override def prettyName: String = "graft_byte_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ByteShingles.compute(input.asInstanceOf[Array[Byte]], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.graft.ByteShingles.compute($b, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): ByteShingles =
    copy(child = newChild)
}

object ByteShingles {
  /** The kernel the generated code calls: rolling 8-byte base-256-mod-p
    * fingerprints, first-occurrence distinct, one pass, no boxing beyond
    * the dedup set. */
  def compute(b: Array[Byte], p: Long): GenericArrayData = {
    val nw = b.length - 7
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(nw * 2, 1 << 16))
    val out = new Array[Long](nw)
    var m = 0
    var j = 0
    while (j < nw) {
      var acc = 0L
      var i = 0
      while (i < 8) { acc = (acc * 256L + (b(j + i) & 0xffL)) % p; i += 1 }
      if (seen.add(acc)) { out(m) = acc; m += 1 }
      j += 1
    }
    new GenericArrayData(if (m == nw) out else java.util.Arrays.copyOf(out, m))
  }
}

/** One-pass distinct xxhash64 token-3-gram shingles of a text column —
  * the exact-set sibling of [[TokenShingles]], computing the SAME values
  * as the declarative `transform(split(lower(text), " "), t =>
  * xxhash64(t))` + `xxhash64(h1, h2, h3)` 3-gram pipeline (token hash =
  * Spark's seed-42 xxhash64 of the token string; 3-gram hash = the
  * multi-child fold, each long hashed with the previous result as seed),
  * first-occurrence distinct. The 64-bit space keeps collision odds
  * ~1e-10, which is why q41's EXACT Jaccard uses this prep rather than
  * the replayable 2^40 fold. Fewer than 3 tokens yields an empty array.
  * Exists for the same reason as [[TokenShingles]]: one codegen'd leaf
  * instead of a HOF pipeline the optimizer re-inlines into scan and join
  * conditions. */
case class XxTokenShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_xxh_token_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    XxTokenShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.XxTokenShingles.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): XxTokenShingles =
    copy(child = newChild)
}

object XxTokenShingles {

  private val Seed = 42L

  /** One walk over the lowered UTF-8 bytes: byte-level split on 0x20
    * (space is never a continuation byte), each token hashed through the
    * SAME code path the xxhash64 expression uses (zero-copy UTF8String
    * views over the lowered buffer), 3-grams folded with the multi-child
    * seed-chaining rule. */
  def compute(text: UTF8String): GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType => LT, StringType => ST}
    val lowered = text.toLowerCase
    val b = lowered.getBytes
    var hw = new Array[Long](math.max(16, b.length / 5))
    var n = 0
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (n == hw.length) hw = java.util.Arrays.copyOf(hw, n * 2)
        hw(n) = XxHash64Function.hash(
          UTF8String.fromBytes(b, start, i - start), ST, Seed)
        n += 1
        start = i + 1
      }
      i += 1
    }
    val nw = n - 2
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(nw * 2, 1 << 16))
    val out = new Array[Long](nw)
    var cnt = 0
    var j = 0
    while (j < nw) {
      var h = XxHash64Function.hash(hw(j), LT, Seed)
      h = XxHash64Function.hash(hw(j + 1), LT, h)
      h = XxHash64Function.hash(hw(j + 2), LT, h)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      j += 1
    }
    new GenericArrayData(if (cnt == nw) out else java.util.Arrays.copyOf(out, cnt))
  }
}

/** One-pass distinct token-3-gram shingle fingerprints of a text column —
  * the text twin of [[ByteShingles]], and the same replayable arithmetic
  * the dedup family's declarative form computes: lowercase, split on
  * single spaces (empties kept, as `split(lower(text), " ", -1)` keeps
  * them), each token folded base-31 over each character's Unicode code
  * point (Spark `ascii` semantics: `codePointAt(0)`) mod 1e9+7, then each
  * token-hash 3-gram folded `((h1*m + h2) % p) * m + h3) % p`,
  * first-occurrence distinct. Fewer than 3 tokens yields an empty array —
  * callers gate on the token count of the scan column, exactly like the
  * declarative form's `size(split(lower(text), " ")) >= 3` filter.
  *
  * This expression exists because the declarative HOF pipeline is a plan
  * poison whenever the signature frame feeds a join:
  * `InferFiltersFromConstraints` copies the ALIAS-FLATTENED pipeline into
  * an `isnotnull(...)` scan condition, and inside that flattened copy the
  * token-hash array is re-inlined at every `element_at` site — O(tokens²)
  * interpreted work per row per referencing site (58 s at sf0.1 for the
  * q262 scoreboard's band self-join). As a single codegen'd leaf the same
  * inference costs one O(bytes) pass. Intermediates stay below 2^62
  * ((p−1)·m with p < 2^40, m < 2^22), so a DuckDB oracle replays the
  * identical arithmetic without wraparound multiply. */
case class TokenShingles(child: Expression, m: Long, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(p > 0 && p < (1L << 40), s"shingle modulus must be in (0, 2^40): $p")
  require(m > 0 && m < (1L << 22), s"shingle multiplier must be in (0, 2^22): $m")

  override def prettyName: String = "graft_token_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[UTF8String], m, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenShingles.compute($t, ${m}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {

  /** Token fold modulus — the base-31 character fold's 1e9+7, shared with
    * [[graft.functions.TextQueries.base31Fold]]'s literal. */
  val TokP = 1000000007L

  /** The kernel the generated code calls: one walk over the lowered
    * UTF-8 bytes. Space (0x20) can never be a continuation byte, so the
    * byte-level token split is exact; a character's contribution is its
    * full Unicode CODE POINT (Spark's `ascii(c)` is `codePointAt(0)`),
    * decoded in place from the lead byte. */
  def compute(text: UTF8String, m: Long, p: Long): GenericArrayData = {
    val b = text.toLowerCase.getBytes
    var hw = new Array[Long](math.max(16, b.length / 5))
    var n = 0
    var h = 0L
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (n == hw.length) hw = java.util.Arrays.copyOf(hw, n * 2)
        hw(n) = h; n += 1; h = 0L
        i += 1
      } else {
        val lead = b(i) & 0xff
        var cp = 0
        if (lead < 0x80) { cp = lead; i += 1 }
        else if (lead < 0xe0) {
          cp = ((lead & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2
        } else if (lead < 0xf0) {
          cp = ((lead & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) |
            (b(i + 2) & 0x3f); i += 3
        } else {
          cp = ((lead & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); i += 4
        }
        h = (h * 31L + cp) % TokP
      }
    }
    val nw = n - 2
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(nw * 2, 1 << 16))
    val out = new Array[Long](nw)
    var cnt = 0
    var j = 0
    while (j < nw) {
      val v = ((hw(j) * m + hw(j + 1)) % p * m + hw(j + 2)) % p
      if (seen.add(v)) { out(cnt) = v; cnt += 1 }
      j += 1
    }
    new GenericArrayData(if (cnt == nw) out else java.util.Arrays.copyOf(out, cnt))
  }
}

/** One-pass content-defined chunk fingerprints of a binary column — the
  * large-payload sibling of [[ByteShingles]]: the SAME rolling 8-byte
  * base-256-mod-`p` fingerprint stream, but instead of emitting every
  * window, a chunk boundary is cut AFTER byte i whenever the window
  * fingerprint satisfies `fp % divisor == 0` (expected chunk length ≈
  * `divisor` bytes), and each chunk's bytes fold to one fingerprint
  * (left fold, base-256 mod `p` — every intermediate < 2^48, replayable
  * from `hex(payload)` in engines without wraparound multiply). The final
  * partial chunk always emits; a payload shorter than one window is one
  * chunk. Output order is payload order, duplicates preserved — distinct
  * and set algebra belong to the query, not the kernel.
  *
  * WHY content-defined: a fixed-size chunker misaligns every boundary
  * after a single inserted byte, so two payloads differing by one
  * insertion share almost nothing. Here boundaries depend only on LOCAL
  * window content, so the chunk streams of the two payloads re-synchronize
  * at the first boundary after the edit and every later chunk fingerprint
  * matches — the storage-dedup property (LBFS, Muthitacharoen et al.,
  * SOSP'01) that makes chunk-level containment a real near-dup signal for
  * large media where whole-payload shingling is too fine-grained.
  */
case class CdcChunks(child: Expression, divisor: Long, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(divisor > 0, s"chunk divisor must be positive: $divisor")
  require(p > 0 && p < (1L << 40), s"chunk modulus must be in (0, 2^40): $p")

  override def prettyName: String = "graft_cdc_chunks"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]], divisor, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.graft.CdcChunks.compute($b, ${divisor}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** The kernel: one pass, two running fingerprints (the 8-byte window fp
    * deciding boundaries, the unbounded chunk fp being emitted). */
  def compute(b: Array[Byte], divisor: Long, p: Long): GenericArrayData = {
    if (b.length == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new scala.collection.mutable.ArrayBuffer[Long](b.length / divisor.toInt + 2)
    // pow256(7) mod p — the coefficient of the byte leaving the window
    var hi = 1L
    var k = 0
    while (k < 7) { hi = (hi * 256L) % p; k += 1 }
    var win = 0L   // rolling fp of the last min(i+1, 8) bytes
    var chunk = 0L // fold of the current chunk's bytes
    var chunkStart = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xffL
      win = if (i < 8) (win * 256L + x) % p
            else (((win - (((b(i - 8) & 0xffL) * hi) % p) + p) % p) * 256L + x) % p
      chunk = (chunk * 256L + x) % p
      if (i >= 7 && win % divisor == 0L) {
        out += chunk
        chunk = 0L
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < b.length) out += chunk
    new GenericArrayData(out.toArray)
  }
}

/** Bounded exact top-k aggregation buffer: the k best (score, id) pairs
  * under the total order (score DESC, id ASC), kept as a binary heap whose
  * ROOT is the worst retained pair — an arriving row that cannot beat the
  * root costs one comparison, so a scan of n candidates does O(n + k·log k
  * · ln(n/k)) work instead of the O(n·log n) full sort the window-based
  * prune pays. */
final class TopPairsBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** a strictly worse than b under (score DESC, id ASC). Double.compare,
    * not `<`: Spark's sort order totals NaN above every value and
    * -0.0 below 0.0, and the heap must rank EXACTLY like the row_number
    * window it replaces on any input, NaN cosines included. */
  @inline private def worse(as: Double, ai: Long, bs: Double, bi: Long): Boolean = {
    val c = java.lang.Double.compare(as, bs)
    c < 0 || (c == 0 && ai > bi)
  }

  def offer(s: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Entries best-first — (score DESC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      })
    out
  }
}

/** Exact per-group top-k as a TypedImperativeAggregate —
  * `graft_top_pairs(score, id, k)` → `array<struct<score:double,id:bigint>>`
  * best-first under (score DESC, id ASC), the q43 tie-break.
  *
  * This replaces the salted two-phase row_number window for candidate
  * pruning: the window form must SORT every candidate row before its
  * partial group limit can cut (O(n·log n) per partition — measured 47 s
  * of q236's 48 s at 10× sf0.1, where scoring the same rows costs 0.6 s),
  * while this buffer streams candidates through a k-bounded heap with
  * map-side partial aggregation, so the exchange carries at most
  * (map partitions × k) pairs per query and nothing ever sorts more than
  * k elements. Same total order, bitwise-identical survivors — the
  * replay oracles are untouched. */
case class TopPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopPairsBuf]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "graft_top_pairs"
  override def left: Expression = scoreExpr
  override def right: Expression = idExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopPairsBuf = new TopPairsBuf(k)

  override def update(buf: TopPairsBuf, input: InternalRow): TopPairsBuf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(x: TopPairsBuf, y: TopPairsBuf): TopPairsBuf = {
    var i = 0
    while (i < y.n) { x.offer(y.scores(i), y.ids(i)); i += 1 }
    x
  }

  override def eval(buf: TopPairsBuf): Any = {
    val best = buf.sorted
    new GenericArrayData(best.map { case (s, id) =>
      org.apache.spark.sql.catalyst.InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopPairsBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopPairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopPairsBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      buf.offer(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)
}
