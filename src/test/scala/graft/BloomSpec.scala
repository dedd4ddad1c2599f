package graft

import graft.functions.Sketches.{bloomContains, bloomOf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMath

/** Bloom filter contracts: zero false negatives (the exactness guarantee
  * q96 leans on), a bounded false-positive rate at the designed operating
  * point, byte-layout agreement between the builder's serialized form and
  * the probe, and partial-aggregation merge correctness across partitions.
  */
class BloomSpec extends SparkSpec {

  test("local math: every inserted key probes true through the serialized bytes") {
    val words = new Array[Long](1 << 8) // 2^14 bits
    val keys = (0L until 2000L).map(i => i * 0x9E3779B97F4A7C15L)
    keys.foreach(BloomMath.set(words, _))
    // serialize exactly as SketchAggBase does: big-endian longs
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    val bytes = bb.array()
    assert(keys.forall(BloomMath.contains(bytes, _)), "false negative")
  }

  test("false-positive rate stays near the designed operating point") {
    val words = new Array[Long](1 << 8) // m = 2^14 bits
    val n = 1000
    (0 until n).foreach(i => BloomMath.set(words, i * 0x9E3779B97F4A7C15L + 13L))
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    val bytes = bb.array()
    // k=5, n/m=0.061 → (1 − e^(−kn/m))^5 = (1 − e^−0.305)^5 ≈ 0.13%
    // theoretical; assert at 1% (~8× margin) so probe-schedule regressions
    // that correlate the k probes (doubling+ the rate) still fail
    val trials = 20000
    val fp = (1 to trials).count(i => BloomMath.contains(bytes, -i * 0xC2B2AE3D27D4EB4FL))
    assert(fp.toDouble / trials < 0.01, s"fp rate ${fp.toDouble / trials}")
  }

  test("DataFrame build + probe: no false negatives, merge across partitions") {
    import spark.implicits._
    val keys = (1L to 5000L).toDF("k").repartition(7)
      .select(xxhash64(col("k")).as("h"))
    val filter = bloomOf(keys, col("h"), numBits = 1 << 17)
    val missed = keys.filter(!bloomContains(filter, col("h"))).count()
    assert(missed == 0L, s"$missed false negatives after 7-partition merge")
  }

  test("q96 (bloom path) returns exactly q76's (broadcast-join path) result") {
    val a = SparkEntry.queries("q76_decontaminate")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q96_bloom_decontaminate")(spark, sf).collect().toSeq
    assert(a == b, "bloom prefilter changed the exact decontamination result")
  }
}
