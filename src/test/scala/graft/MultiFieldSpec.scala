package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Bm25, PorterStemmer, Tokenizers}
import graft.index._

class PorterStemmerSpec extends AnyFunSuite {
  test("classic examples") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "agreed" -> "agre", "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "digitizer" -> "digit", "operator" -> "oper",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "activate" -> "activ",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    cases.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("stability: stemming a stem is idempotent on common words") {
    Seq("running", "connection", "searches", "indexed", "merging").foreach { w =>
      val s1 = PorterStemmer.stem(w)
      assert(s1.nonEmpty && s1.length <= w.length)
    }
  }
}

/** Field-expanded queries: stemmed + bigram shadow fields. */
class MultiFieldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graftmf").toString

  private lazy val corpus = Corpus.generate(spark, 500, seed = 11L).cache()

  private lazy val index = {
    val d = tmpDir()
    IndexBuilder.build(spark, corpus, d, IndexBuilder.Config(
      numSegments = 3, indexStemmed = true, indexBigrams = true, indexTrigrams = true))
    new InvertedIndex(spark, d)
  }

  test("expanded WAND == expanded exhaustive") {
    Seq("spark session", "merge sort", "data tables merging", "the license")
      .foreach { q =>
        val w = index.searchRaw(q, 20, "or+")
        val e = index.searchRaw(q, 20, "exhaustive+")
        assert(w.toSeq == e.toSeq, s"query '$q'")
      }
  }

  test("stemmed field recalls inflected forms") {
    // corpus vocab has "merge"; query "merging" stems to "merg" — both
    // sides meet in the stemmed field
    val plain = index.searchRaw("merging", 10, "or")
    val expanded = index.searchRaw("merging", 10, "or+")
    // "merging" never appears literally, so the unexpanded query is empty
    assert(plain.isEmpty)
    assert(expanded.nonEmpty)
    // and the top hit must actually contain "merge"
    val hits = index.resolve(expanded, expanded.length)
    val docsWithMerge = corpus.collect()
      .filter(d => Tokenizers.default(d.content).exists(t => PorterStemmer.stem(t) == PorterStemmer.stem("merging")))
      .map(d => (d.repo, d.path)).toSet
    assert(hits.map(h => (h.repo, h.path)).toSet.subsetOf(docsWithMerge))
  }

  test("compound bigram field boosts adjacent pairs") {
    // docs where "hash join" occurs adjacently get the bigram's extra
    // contribution; a doc with both words non-adjacent does not
    val expanded = index.searchRaw("hash join", 50, "or+").toSeq
    assert(expanded.nonEmpty)
    val adjacent = corpus.collect().filter { d =>
      Tokenizers.default(d.content).sliding(2).exists(p =>
        p.length == 2 && p(0) == "hash" && p(1) == "join")
    }.map(d => (d.repo, d.path)).toSet
    if (adjacent.nonEmpty) {
      val resolved = index.resolve(expanded.toArray, expanded.length)
      val topAdj = resolved.take(math.min(3, adjacent.size))
        .map(h => (h.repo, h.path))
      assert(topAdj.exists(adjacent.contains),
        "adjacent-pair docs should rank at the top under compound expansion")
    }
  }

  test("merge preserves multi-field results") {
    val d2 = tmpDir()
    // rebuild source dir to merge from (merge needs its own copy)
    val src = tmpDir()
    IndexBuilder.build(spark, corpus, src, IndexBuilder.Config(
      numSegments = 3, indexStemmed = true, indexBigrams = true, indexTrigrams = true))
    SegmentMerge.merge(spark, src, d2, fanIn = 3)
    val merged = new InvertedIndex(spark, d2)
    Seq("merging data", "hash join", "the license").foreach { q =>
      val a = index.search(q, 15, "or+").map(h => (h.repo, h.path, h.score)).toSet
      val b = merged.search(q, 15, "or+").map(h => (h.repo, h.path, h.score)).toSet
      assert(a == b, s"query '$q'")
    }
  }
}
