package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{ErrorModel, ErrorModelIO}
import graft.core.ErrorModel.{Del, Ins, Sub}
import graft.ops.SpellTrain

class SpellTrainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + cost)
    }
    m(a.length)(b.length)
  }

  test("possibleErrors matches the reference's test vectors") {
    // error_model.rs test_possible_errors, including emission order
    assert(ErrorModel.possibleErrors("hello", "hello").isEmpty)
    assert(ErrorModel.possibleErrors("hello", "helo").get == Vector(Del('l')))
    assert(ErrorModel.possibleErrors("hello", "hellol").get == Vector(Ins('l')))
    assert(ErrorModel.possibleErrors("hello", "heo").get ==
      Vector(Del('l'), Del('l')))
    assert(ErrorModel.possibleErrors("hello", "helli").get ==
      Vector(Sub('o', 'i')))
    // a transposition surfaces as two substitutions (the reference's
    // DP never emits its Transposition variant)
    assert(ErrorModel.possibleErrors("teh", "the").get ==
      Vector(Sub('h', 'e'), Sub('e', 'h')))
  }

  test("possibleErrors property: None iff equal; op count == edit distance") {
    val r = new scala.util.Random(17)
    def word(): String =
      (0 until 1 + r.nextInt(10)).map(_ => ('a' + r.nextInt(4)).toChar).mkString
    (0 until 300).foreach { _ =>
      val a = word(); val b = word()
      val e = ErrorModel.possibleErrors(a, b)
      if (a == b) assert(e.isEmpty)
      else {
        assert(e.nonEmpty)
        // each op is one unit edit along an optimal path
        assert(e.get.length == lev(a, b), s"'$a'->'$b'")
      }
    }
  }

  test("maxEditsFor length buckets (trainer.rs:106-115)") {
    assert(ErrorModel.maxEditsFor("tble") == 1)
    assert(ErrorModel.maxEditsFor("tables") == 2)
    assert(ErrorModel.maxEditsFor("abcdefghijkl") == 2) // 12 chars
    assert(ErrorModel.maxEditsFor("abcdefghijklm") == 3) // 13 chars
  }

  test("error model smoothing + serialization round-trip") {
    val m = ErrorModel(Map("I(a)" -> 3L, "D(x)" -> 1L), 4L)
    // log2(3) - log2(5) for seen, -log2(5) for unseen
    assert(math.abs(m.logProbKey("I(a)") -
      (math.log(3) - math.log(5)) / math.log(2)) < 1e-12)
    assert(math.abs(m.logProbKey("ZZZ") + math.log(5) / math.log(2)) < 1e-12)
    // seen sequences factor higher than unseen
    assert(m.editFactor("tble", "table") > math.pow(2.0, m.logProbKey("ZZ")))
    assert(m.editFactor("same", "same") == 1.0)
    val rt = ErrorModelIO.parse(m.serialize)
    assert(rt == m)
  }

  test("variant bucketing recall equals brute force on a synthetic dictionary") {
    import spark.implicits._
    val dict = Seq(
      ("table", 500L), ("tble", 3L), ("tables", 40L), ("cable", 90L),
      ("merge", 300L), ("mrge", 2L), ("mergee", 1L), ("marge", 4L),
      ("window", 200L), ("wndow", 5L), ("widow", 8L), ("windows", 60L),
      ("partition", 150L), ("partiton", 2L), ("prtition", 1L),
      ("x", 50L), ("xy", 400L))
    val terms = dict.map { case (t, c) => SpellTrain.TermCount(t, c) }
    val cfg = SpellTrain.Config(maxBucket = Int.MaxValue)
    val got = SpellTrain.candidatePairs(spark.createDataset(terms), cfg)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = (for {
      (a, ca) <- dict; (b, cb) <- dict
      if a != b && cb > 10 * ca && lev(a, b) <= ErrorModel.maxEditsFor(a)
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.contains(("tble", "table")))
    assert(want.contains(("wndow", "window")))
  }

  test("end-to-end: planted typo is harvested into the error model") {
    import spark.implicits._
    // "on table top" dominates; "on tble top" is a frequent-enough
    // misspelling context (>= minContextCount) of a 10x-rarer term.
    // Two planted typos SHARE the edit key I(a): with the reference's
    // +1 smoothing a count-1 sequence scores exactly the unseen floor
    // (log2(1)=0), so distinguishing seen-from-unseen needs count >= 2.
    val docs = (
      Seq.fill(140)("put it on table top now") ++
      Seq.fill(12)("put it on tble top now") ++
      Seq.fill(140)("set it in partition slot now") ++
      Seq.fill(12)("set it in prtition slot now") ++
      Seq.fill(60)("unrelated filler text rows here")
    ).toDF("text")
    val m = SpellTrain.train(docs, "text")
    assert(m.total >= 2)
    assert(m.counts.getOrElse("I(a)", 0L) >= 2L, s"counts=${m.counts}")
    // harvested factor beats the unseen-sequence floor
    assert(m.editFactor("tble", "table") >
      math.pow(2.0, m.logProbKey("unseen")))
  }

  test("winner tie-break mirrors the reference (original term wins ties)") {
    import spark.implicits._
    // context counts equal for candidate and original -> original wins
    // -> no winning pair -> empty model input
    val pairs = Seq(("wrd", 2L, "word", 50L)).toDF("a", "a_cnt", "b", "b_cnt")
    val tri = spark.createDataset(Seq(
      SpellTrain.Trigram("the", "wrd", "is", 20L),
      SpellTrain.Trigram("the", "word", "is", 20L)))
    val winners = SpellTrain.winningPairs(pairs, tri)
    assert(winners.count() == 0)
    // strictly greater candidate count -> correction wins
    val tri2 = spark.createDataset(Seq(
      SpellTrain.Trigram("the", "wrd", "is", 20L),
      SpellTrain.Trigram("the", "word", "is", 21L)))
    val winners2 = SpellTrain.winningPairs(pairs, tri2)
    assert(winners2.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("wrd", "word")))
  }
}
