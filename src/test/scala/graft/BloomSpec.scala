package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bloom

class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("sizing formulas (lib.rs:41-48) incl. the /8 quirk") {
    // 100 items at fp=0.01: 100*ln(.01)/(-8*ln2^2) = 119.83 -> 120 bits
    assert(Bloom.numBits(100, 0.01) == 120L)
    // textbook (no /8) would be 959 — the reference quirk is pinned
    assert(Bloom.numBits(100, 0.01) * 8 == 960L)
    assert(Bloom.numHashes(120, 100) == 1L)
    assert(Bloom.numHashes(1, 1000000) == 1L) // max(.,1)
  }

  test("U64 filter: reference test vectors (lib.rs test_bloom_filter)") {
    val bf = new Bloom.U64BloomFilter(100, 0.01)
    (1L to 5L).foreach(bf.insert)
    (1L to 5L).foreach(i => assert(bf.contains(i), s"fn for $i"))
    (6L to 10L).foreach(i => assert(!bf.contains(i), s"fp for $i"))
  }

  test("estimate_card reproduces the integer-truncated ln (lib.rs:107-123)") {
    val bf = new Bloom.U64BloomFilter(100, 0.01) // 120 bits
    assert(bf.estimateCard == 0L)
    // 60/120 ones: ln(0.5) = -0.69 truncates to 0 -> estimate 0
    bf.words(0) = -1L  // bits 0-63... set exactly 60: words(0)=2^60-1
    bf.words(0) = (1L << 60) - 1
    assert(bf.countOnes == 60)
    assert(bf.estimateCard == 0L)
    // 100/120 ones: ln(1/6) = -1.79 truncates to -1 -> estimate = m
    bf.words(0) = -1L
    bf.words(1) = (1L << 36) - 1
    assert(bf.countOnes == 100)
    assert(bf.estimateCard == 120L)
    // full -> u64::MAX bit pattern
    val full = new Bloom.U64BloomFilter(100, 0.01)
    full.fill()
    assert(full.countOnes == 120)
    assert(full.estimateCard == -1L)
  }

  test("union ORs; emptyFrom matches length") {
    val a = new Bloom.U64BloomFilter(100, 0.01)
    val b = Bloom.U64BloomFilter.emptyFrom(a)
    a.insert(1L); b.insert(999L)
    a.union(b)
    assert(a.contains(1L) && a.contains(999L))
    val c = new Bloom.U64BloomFilter(1000, 0.01)
    intercept[IllegalArgumentException](a.union(c))
  }

  test("distributed aggregator build == driver-side inserts") {
    import spark.implicits._
    val items = (0L until 4000L).map(i => i * 31 + 7)
    val m = Bloom.numBits(4000, 0.01)
    val words = items.toDS().repartition(8)
      .select(new Bloom.U64BloomAgg(m).toColumn).head()
    val driver = new Bloom.U64BloomFilter(4000, 0.01)
    items.foreach(driver.insert)
    assert(words.toSeq == driver.words.toSeq)
  }

  test("bytes filter: no false negatives, deterministic, multi-probe") {
    val bf = new Bloom.BytesBloomFilter(1000, 0.01)
    assert(bf.hashes >= 1)
    val r = new scala.util.Random(3)
    val in = (0 until 300).map(_ => r.nextString(12).getBytes("UTF-8"))
    in.foreach(bf.insert)
    in.foreach(x => assert(bf.contains(x)))
    val bf2 = new Bloom.BytesBloomFilter(1000, 0.01)
    in.foreach(bf2.insert)
    assert(bf.contains(in.head) == bf2.contains(in.head))
  }
}
