package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** One-pass sketch aggregators for near-duplicate detection.
  *
  * Both are `Aggregator`s (partial-aggregate capable): the map side folds every
  * shingle hash into a fixed-size buffer and the shuffle carries ONE buffer per
  * (partition, doc) — never the shingles themselves. That is the property that
  * makes MinHash/SimHash viable at 100 TB, where a per-(doc, hash-index)
  * explode (64× the shingle count) would dominate the shuffle.
  *
  * All parameters derive from a fixed seed via SplitMix64, so signatures are
  * deterministic across JVMs, sessions and partitionings.
  */
object Sketches {

  /** SplitMix64 (Steele et al., OOPSLA'14; the `java.util.SplittableRandom`
    * mixer) — deterministic parameter derivation. */
  private def splitMix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val NumMinHashes = 64

  /** Mersenne prime 2^31-1: (a*h + b) stays < 2^62 — no Long overflow. */
  val MinHashPrime = 2147483647L

  /** Universal-hash params a_i (non-zero), b_i for h_i(x) = (a·x + b) mod p. */
  private[graft] val (hashA, hashB): (Array[Long], Array[Long]) = {
    val a = new Array[Long](NumMinHashes)
    val b = new Array[Long](NumMinHashes)
    var s = 42L
    var i = 0
    while (i < NumMinHashes) {
      s = splitMix64(s); a(i) = Math.floorMod(s, MinHashPrime - 1) + 1
      s = splitMix64(s); b(i) = Math.floorMod(s, MinHashPrime)
      i += 1
    }
    (a, b)
  }

  private val longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** Fold one element hash into a MinHash buffer (shared by the Aggregator
    * reference model and the native TypedImperativeAggregate). */
  def minhashReduce(buf: Array[Long], h: Long): Array[Long] = {
    val hm = Math.floorMod(h, MinHashPrime)
    var i = 0
    while (i < NumMinHashes) {
      val v = Math.floorMod(hashA(i) * hm + hashB(i), MinHashPrime)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  /** Fold one element hash into a SimHash counter buffer.
    *
    * Bit k of an element is derived from the SAME affine family as MinHash
    * — ((a_k·h + b_k) mod p) thresholded at p/2 — instead of reading the
    * element's own bit k. Two reasons: the per-bit streams stay pairwise
    * independent even when element hashes occupy a narrow range (q39/q40's
    * replayable 2^40-space fingerprints would leave bits 40-63 constant
    * under raw bit-reading, collapsing the upper LSH bands into one hot
    * bucket), and every step is bounded below 2^62, so the whole SimHash
    * index replays as DuckDB SQL (VERDICT r4 item 1 — DuckDB BIGINT
    * overflow is an error, which is what rules out wrapping bit-mix
    * hashes like xxhash64 there). */
  def simhashReduce(buf: Array[Long], h: Long): Array[Long] = {
    val hm = Math.floorMod(h, MinHashPrime)
    var k = 0
    while (k < 64) {
      val v = Math.floorMod(hashA(k) * hm + hashB(k), MinHashPrime)
      buf(k) += (if (v < 1073741824L) 1L else -1L)
      k += 1
    }
    buf
  }

  /** Collapse SimHash counters to the 64-bit signature. */
  def simhashFinish(buf: Array[Long]): Long = {
    var out = 0L
    var k = 0
    while (k < 64) { if (buf(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  /** MinHash signature of a set of 64-bit element hashes (Broder '97).
    * IN = element hash (e.g. xxhash64 of a shingle); OUT = 64 minima of
    * pairwise-independent hashes — Pr[sig_i(A)=sig_i(B)] = Jaccard(A,B). */
  class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(NumMinHashes)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = minhashReduce(buf, h)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumMinHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** 64-bit SimHash of a multiset of element hashes: bit k of the output is 1
    * iff more elements have bit k set than unset (Charikar, STOC'02). Near
    * duplicates land at small Hamming distance. */
  class SimHashAgg extends Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = new Array[Long](64)
    def reduce(buf: Array[Long], h: Long): Array[Long] = simhashReduce(buf, h)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0
      while (k < 64) { x(k) += y(k); k += 1 }
      x
    }
    def finish(buf: Array[Long]): Long = simhashFinish(buf)
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Aggregate a column of 64-bit element hashes into a MinHash signature.
    * Backed by the native TypedImperativeAggregate (raw buffer per
    * partition, serialized only at shuffle) — see
    * org.apache.spark.sql.graft.SketchAggExpressions. */
  def minhash(col: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, MinHashSketch}
    ColumnBridge.column(MinHashSketch(ColumnBridge.expression(col)).toAggregateExpression())
  }

  /** Aggregate a column of 64-bit element hashes into a 64-bit SimHash. */
  def simhash(col: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, SimHashSketch}
    ColumnBridge.column(SimHashSketch(ColumnBridge.expression(col)).toAggregateExpression())
  }

  /** Row-local MinHash of an `array<long>` column — no explode, no shuffle;
    * identical signatures to the aggregate form. */
  def minhashArray(col: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, MinHashOfArray}
    ColumnBridge.column(MinHashOfArray(ColumnBridge.expression(col)))
  }

  /** Row-local SimHash of an `array<long>` column. */
  def simhashArray(col: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, SimHashOfArray}
    ColumnBridge.column(SimHashOfArray(ColumnBridge.expression(col)))
  }

  /** Exact per-group top-k of (score, id) pairs under (score DESC, id ASC)
    * — `array<struct<score,id>>` best-first, k-bounded heap buffer with
    * map-side partial aggregation. The scale-correct replacement for the
    * salted two-phase row_number prune: nothing ever sorts more than k
    * elements and the exchange carries ≤ map_partitions·k pairs per
    * group. See org.apache.spark.sql.graft.TopPairs. */
  def topPairs(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, TopPairs}
    ColumnBridge.column(TopPairs(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
  }

  /** One-pass distinct rolling 8-byte shingle fingerprints of a binary
    * column (base-256 mod `p`), codegen'd — the scan-stage byte twin of
    * the token-shingle arrays feeding [[simhashArray]]/[[minhashArray]]. */
  def byteShingles(col: Column, p: Long): Column = {
    import org.apache.spark.sql.graft.{ByteShingles, ColumnBridge}
    ColumnBridge.column(ByteShingles(ColumnBridge.expression(col), p))
  }

  /** One-pass distinct replayable token-3-gram shingle fingerprints of a
    * text column (base-31 token fold mod 1e9+7, 3-gram fold base-`m` mod
    * `p`), codegen'd — the scan-stage text twin of [[byteShingles]] and
    * the native form of the dedup family's declarative shingle build. */
  def tokenShingles(col: Column, m: Long, p: Long): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, TokenShingles}
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(col), m, p))
  }

  /** One-pass distinct xxhash64 token-3-gram shingles of a text column —
    * the exact-set (64-bit) sibling of [[tokenShingles]], identical values
    * to the declarative split/xxhash64 pipeline. */
  def xxhTokenShingles(col: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, XxTokenShingles}
    ColumnBridge.column(XxTokenShingles(ColumnBridge.expression(col)))
  }

  /** One-pass content-defined chunk fingerprints of a binary column
    * (boundaries where the rolling 8-byte fp ≡ 0 mod `divisor`; chunk
    * bytes fold base-256 mod `p`) — insert-resistant chunking for
    * chunk-level media dedup. */
  def cdcChunks(col: Column, divisor: Long, p: Long): Column = {
    import org.apache.spark.sql.graft.{CdcChunks, ColumnBridge}
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(col), divisor, p))
  }

  /** Mergeable Misra-Gries heavy-hitters summary of a string column:
    * ≤ k (term, cnt) entries, every true count > n/(k+1) guaranteed
    * present, estimates within n/(k+1) of truth. */
  def heavyHitters(col: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, HeavyHitters}
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(col), k).toAggregateExpression())
  }

  /** Mergeable Bloom filter over a column of 64-bit key hashes: fixed
    * `numBits`-wide binary state through the shuffle, bitwise-OR merge.
    * Size with m ≈ −n·ln(p)/(ln 2)² for target false-positive rate p. */
  def bloom(col: Column, numBits: Int): Column = {
    import org.apache.spark.sql.graft.{BloomSketch, ColumnBridge}
    ColumnBridge.column(
      BloomSketch(ColumnBridge.expression(col), numBits).toAggregateExpression())
  }

  /** Next-power-of-two Bloom width for ~`targetBits` (≈10 bits/key at 1%
    * fp), clamped to [2^20, 2^30] — 2^30 bits (128 MB) is the practical
    * single-buffer ceiling; beyond it, stripe the key space over several
    * filters rather than growing one buffer. One definition so every
    * Bloom consumer (q96, q108) sizes identically. */
  def bloomBits(targetBits: Long): Int =
    math.max(1L << 20,
      java.lang.Long.highestOneBit(
        math.min(math.max(targetBits, 2L), 1L << 30) - 1) << 1).toInt

  /** Build a Bloom filter over `keys`' `keyHash` column as an uncorrelated
    * scalar subquery: the filter aggregation runs ONCE per query and its
    * serialized bytes become a query-constant every [[bloomContains]] probe
    * shares — never a per-row binary column read, which would memcpy the
    * whole filter for each probed row. */
  def bloomOf(keys: org.apache.spark.sql.DataFrame, keyHash: Column,
      numBits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.scalarSubquery(keys.agg(bloom(keyHash, numBits).as("bf")))
  }

  /** Membership probe against a [[bloomOf]] filter (or a literal filter) —
    * codegen'd, probes the serialized bytes in place through a reference
    * object materialized once per query. No false negatives. */
  def bloomContains(filter: Column, keyHash: Column): Column = {
    import org.apache.spark.sql.graft.{BloomMightContain, ColumnBridge}
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(filter), ColumnBridge.expression(keyHash)))
  }
}
