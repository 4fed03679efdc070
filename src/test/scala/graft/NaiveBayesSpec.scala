package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def fitOn(rows: Seq[(String, String)]): NaiveBayes.Model = {
    import spark.implicits._
    NaiveBayes.fit(rows.toDF("text", "label"), "text", "label")
  }

  test("reference test vector analog (naive_bayes.rs test_naive_bayes)") {
    // the rust test: 5 ham docs with features {t0,t1}, 5 spam docs with
    // {t1,t2}; a t0-only sample must classify ham, t2-only spam
    val m = fitOn(Seq.fill(5)(("t0 t1", "ham")) ++ Seq.fill(5)(("t1 t2", "spam")))
    assert(NaiveBayes.predict(m, "t0")._1 == "ham")
    assert(NaiveBayes.predict(m, "t2")._1 == "spam")
  }

  test("model internals: sorted vocab, idf / smoothing / prior formulas") {
    // class a: "x x y"; class b: "y z"  (N=2 docs)
    val m = fitOn(Seq(("x x y", "a"), ("y z", "b")))
    assert(m.classes.toSeq == Seq("a", "b"))
    assert(m.vocab.toSeq == Seq("x", "y", "z"))
    // idf = ln(N/(1+df)) + 1  (naive_bayes.rs:86)
    def idf(df: Long): Float = (math.log(2.0 / (1.0 + df)) + 1.0).toFloat
    assert(m.idf.toSeq == Seq(idf(1), idf(2), idf(1)))
    assert(m.prior.toSeq == Seq(0.5, 0.5))
    assert(m.priorLn.toSeq == Seq(math.log(0.5).toFloat, math.log(0.5).toFloat))
    // class a counts: x->2, y->1; total = 2*idf(x) + 1*idf(y)
    val ix = m.idf(0).toDouble; val iy = m.idf(1).toDouble; val iz = m.idf(2).toDouble
    val totalA = 2.0 * ix + 1.0 * iy
    assert(m.flp(0)(0) == math.log((2.0 * ix + 1.0) / (totalA + 1.0)).toFloat)
    assert(m.flp(0)(1) == math.log((1.0 * iy + 1.0) / (totalA + 1.0)).toFloat)
    assert(!m.flp(0).contains(2)) // z unseen in class a -> not in the map
    val totalB = 1.0 * iy + 1.0 * iz
    assert(m.flp(1)(2) == math.log((1.0 * iz + 1.0) / (totalB + 1.0)).toFloat)
  }

  test("reference quirks: min-logprob selection and +0.5 unseen constant") {
    val m = fitOn(Seq(("x x y", "a"), ("y z", "b")))
    // sample "x": seen in a (negative contribution), unseen in b
    // (+0.5 per tf-idf unit) -> a's score is strictly smaller -> a wins
    val ix = m.idf(0).toDouble
    val sa = m.priorLn(0).toDouble + 1.0 * (ix * m.flp(0)(0).toDouble)
    val sb = m.priorLn(1).toDouble + 1.0 * (ix * 0.5)
    assert(sa < sb)
    val (label, conf) = NaiveBayes.predict(m, "x")
    assert(label == "a")
    assert(conf == math.max(sa / (sa + sb), 0.0).toFloat)
  }

  test("empty / out-of-vocab sample scores on priors alone (rarest class wins)") {
    // priors a=3/4, b=1/4 -> ln is smallest for the RAREST class, and
    // the reference picks the minimum — pin that behavior
    val m = fitOn(Seq(("x", "a"), ("x", "a"), ("x", "a"), ("z", "b")))
    assert(NaiveBayes.predict(m, "")._1 == "b")
    assert(NaiveBayes.predict(m, "notinvocab")._1 == "b")
  }

  test("determinism: fit twice produces identical models") {
    val rows = (0 until 60).map { i =>
      val words = (0 until 8).map(j => s"w${(i * 7 + j * 3) % 13}").mkString(" ")
      (words, s"c${i % 3}")
    }
    val m1 = fitOn(rows); val m2 = fitOn(rows)
    assert(m1.classes.toSeq == m2.classes.toSeq)
    assert(m1.vocab.toSeq == m2.vocab.toSeq)
    assert(m1.idf.toSeq == m2.idf.toSeq)
    assert(m1.priorLn.toSeq == m2.priorLn.toSeq)
    assert(m1.flp.toSeq == m2.flp.toSeq)
  }

  test("predictDf is bit-identical to driver predict (incl. empty-token docs)") {
    import spark.implicits._
    val rows = (0 until 50).map { i =>
      val words =
        if (i == 17) "" // zero in-vocab tokens -> prior-only path
        else (0 until 6).map(j => s"w${(i * 5 + j * 11) % 9}").mkString(" ")
      (i.toLong, words, s"c${i % 3}")
    }
    val df = rows.toDF("id", "text", "label")
    val m = NaiveBayes.fit(df, "text", "label")
    val got = NaiveBayes.predictDf(m, df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getFloat(2)))).toMap
    rows.foreach { case (id, text, _) =>
      val want = NaiveBayes.predict(m, text)
      assert(got(id) == want, s"id=$id text='$text'")
    }
  }

  test("evaluate: accuracy/precision/recall/f1 from exact counts") {
    import spark.implicits._
    // truth:  p p p n n ; pred: p n p p n
    val df = Seq(("p", "p"), ("p", "n"), ("p", "p"), ("n", "p"), ("n", "n"))
      .toDF("truth", "pred")
    val r = NaiveBayes.evaluate(df, "truth", "pred", "p").collect().head
    assert(r.getDouble(0) == 3.0 / 5.0)        // accuracy
    assert(r.getDouble(1) == 2.0 / 3.0)        // precision: tp=2, predP=3
    assert(r.getDouble(2) == 2.0 / 3.0)        // recall: tp=2, truthP=3
    val p = 2.0 / 3.0
    assert(r.getDouble(3) == 2.0 * p * p / (p + p))
  }
}
