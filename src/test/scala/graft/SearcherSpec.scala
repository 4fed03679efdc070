package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.index._

/** Driver-side serving searcher == the distributed query path. */
class SearcherSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val corpus = Corpus.generate(spark, 500, seed = 88L).cache()
  private lazy val index = {
    val d = java.nio.file.Files.createTempDirectory("graftsrv").toString
    IndexBuilder.build(spark, corpus, d, IndexBuilder.Config(numSegments = 3,
      indexStemmed = true, indexBigrams = true))
    new InvertedIndex(spark, d)
  }
  private lazy val searcher = new Searcher(index)

  test("serving results == distributed results across modes") {
    val cases = Seq(
      ("spark session", "or", Nil), ("query engine data", "or", Nil),
      ("the license", "and", Nil), ("data table", "phrase", Nil),
      ("merging data tables", "or+", Nil), ("spark", "or", Seq("batch")),
      ("nosuchtok qqq", "or", Nil), ("spark data", "exhaustive", Nil),
      ("spark query data", "dismax", Nil), ("spark data", "bitset", Nil))
    cases.foreach { case (q, mode, minus) =>
      val a = searcher.searchRaw(q, 15, mode, minus).toSeq
      val b = index.searchRaw(q, 15, mode, minus).toSeq
      assert(a == b, s"'$q' mode=$mode minus=$minus")
    }
  }

  test("repeated queries are served from the term cache, identically") {
    val q = "spark data table"
    val first = searcher.searchRaw(q, 10).toSeq
    // cached path (no fetch) must return the same thing
    (0 until 3).foreach(_ => assert(searcher.searchRaw(q, 10).toSeq == first))
    // warm serving latency is driver-local: well under job latency
    val t0 = System.nanoTime()
    searcher.searchRaw(q, 10)
    val warmMs = (System.nanoTime() - t0) / 1e6
    assert(warmMs < 100.0, s"warm serving took ${warmMs}ms")
  }
}
