package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Summarizer

class SummarizerSpec extends AnyFunSuite {

  private def windows(text: String, w: Int, o: Int): Seq[String] =
    Summarizer.overlappingSents(text, w, o).map(_._1).toSeq

  test("overlapping windows match the reference's test vectors (summarizer.rs:283-330)") {
    assert(windows("this is a test sentence", 3, 1) ==
      Seq("this is a", "a test sentence", "sentence"))
    assert(windows("this is a test sentence", 3, 0) ==
      Seq("this is a", "test sentence"))
    assert(windows("this is a test sentence", 3, 2) ==
      Seq("this is a", "is a test", "a test sentence", "sentence"))
    assert(windows("this", 3, 1) == Seq("this"))
    // the reference's own "not really great, but close enough" case
    assert(windows("this ", 3, 0) == Seq("this "))
    intercept[IllegalArgumentException](windows("x y", 2, 2))
  }

  test("window ranges index back into the text (reference property)") {
    val text = "this is a test sentence"
    Summarizer.overlappingSents(text, 3, 1).foreach { case (p, r) =>
      assert(p == text.substring(r.start, r.end))
    }
  }

  test("query-specific summary selects, re-orders and joins passages") {
    val s = new Summarizer.ExtractiveSummarizer(
      new Summarizer.TokenOverlapScorer, topNPassages = 2,
      windowSize = 3, overlap = 1)
    // windows: "one two three" / "three four five" / "five query match
    // here" ... the query-matching windows win and non-adjacent
    // selections join with '. \n'
    val text = "one two three four five query match here tail words pad pad"
    val out = s.summarize("query match", text)
    assert(out.contains("query match"))
    // deterministic across runs
    assert(out == s.summarize("query match", text))
  }

  test("adjacent selected windows are overlap-trimmed, not duplicated") {
    val s = new Summarizer.ExtractiveSummarizer(
      new Summarizer.TokenOverlapScorer, topNPassages = 2,
      windowSize = 3, overlap = 1)
    // both top windows overlap on the shared word; the reference trims
    // the second window's range to start at the first's end
    val text = "alpha query match query beta gamma"
    val out = s.summarize("query", text)
    // the shared region must not appear twice back-to-back
    assert(!out.contains("query match query match"))
    assert(out == s.summarize("query", text))
  }

  test("fallback: unembeddable query returns the first 1000 words") {
    val s = new Summarizer.ExtractiveSummarizer(
      new Summarizer.TokenOverlapScorer, topNPassages = 2,
      windowSize = 3, overlap = 1)
    assert(s.summarize("", "a b c") == "a b c")
    val long = (0 until 1500).map(i => s"w$i").mkString(" ")
    val fb = s.summarize("", long)
    assert(fb.split(" ").length == 1000)
    assert(fb.startsWith("w0 w1") && fb.endsWith("w999"))
  }

  /** Closed form of overlappingSents(text, 8, 1) offsets, as the
    * q_sum_windows DuckDB oracle computes them: ws(k) = 0-based char
    * position of the k-th space (1-based rank); window n starts at
    * ws(7n)+1 (0 for n=0) and ends at ws(7n+8), or text end if that
    * rank does not exist; window n>=1 exists iff ws(7n) exists and
    * the start lies strictly inside the text. */
  private def closedFormWindows(text: String): Seq[(Int, Int, Int)] = {
    if (text.isEmpty) return Seq.empty
    val ws = text.indices.filter(i => text.charAt(i) == ' ')
    def pos(rank: Int): Option[Int] =
      if (rank >= 1 && rank <= ws.length) Some(ws(rank - 1)) else None
    (0 to ws.length / 7).flatMap { n =>
      val start = if (n == 0) Some(0)
        else pos(7 * n).map(_ + 1).filter(_ < text.length)
      start.map { s => (n, s, pos(7 * n + 8).getOrElse(text.length)) }
    }
  }

  test("closed-form window offsets equal the iterator for arbitrary space placements (q_sum_windows oracle)") {
    val rnd = new scala.util.Random(424242)
    def randomText(): String = {
      val n = rnd.nextInt(80)
      (0 until n).map { _ =>
        if (rnd.nextInt(3) == 0) ' ' else ('a' + rnd.nextInt(4)).toChar
      }.mkString
    }
    val cases = Seq("", " ", "a", "a b c d e f g h i j",
      "  leading and  double  spaces trail ", "a b c d e f g",
      "a b c d e f g ", "one two three four five six seven eight") ++
      (0 until 300).map(_ => randomText())
    cases.foreach { text =>
      val it = Summarizer.overlappingSents(text, 8, 1).zipWithIndex
        .map { case ((_, r), i) => (i, r.start, r.end) }.toSeq
      assert(closedFormWindows(text) == it, s"text='${text}'")
    }
  }
}
