package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Snippets

/** Snippet generation semantics (mirroring the reference's own test
  * intents, snippet.rs:394-600: query-term passage selection, stemmed
  * fallback highlighting, empty query/text, no panics on fuzz). */
class SnippetSpec extends AnyFunSuite {

  private val text =
    """Scala is a strongly typed language that runs on the JVM.
      |It unifies object oriented and functional programming in one design.
      |The query engine builds an inverted index over source files.
      |Posting lists compress doc ids with delta encoding and bit packing.
      |Block max metadata lets the scorer skip whole blocks during search.
      |A merge pass concatenates segments without re-encoding the blocks.""".stripMargin

  test("best passage contains the query terms and highlights them") {
    val s = Snippets.generate("inverted index", text)
    val str = s.unhighlightedString
    assert(str.contains("inverted index"))
    val hl = s.fragments.filter(_.highlighted).map(_.text.toLowerCase)
    assert(hl.contains("inverted") && hl.contains("index"))
    // highlighting keeps the full fragment text intact
    assert(s.html("<b>", "</b>").replace("<b>", "").replace("</b>", "") == str)
  }

  test("passage BM25 prefers the denser match") {
    val s = Snippets.generate("blocks", text)
    assert(s.unhighlightedString.toLowerCase.contains("block"))
    assert(s.fragments.exists(_.highlighted))
  }

  test("stemmed fallback highlights inflected forms") {
    // 'compresses'/'compress' vs text 'compress' — query a form absent
    // literally so the stemmed pass must fire
    val s = Snippets.generate("compressing", text)
    assert(s.fragments.exists(f => f.highlighted &&
      f.text.toLowerCase.startsWith("compress")))
  }

  test("length control: desired chars +/- delta") {
    val cfg = Snippets.Config(desiredNumChars = 120, deltaNumChars = 30)
    val s = Snippets.generate("index", text, cfg)
    assert(s.unhighlightedString.length <= 150)
    assert(s.unhighlightedString.nonEmpty)
  }

  test("empty query returns leading words; empty text returns nothing") {
    val s = Snippets.generate("", text)
    assert(s.fragments.nonEmpty && !s.fragments.exists(_.highlighted))
    assert(Snippets.generate("query", "").fragments.isEmpty)
  }

  test("abbreviations do not split sentences") {
    val r = Snippets.sentenceRanges("Dr. Smith wrote code. It compiled.")
    assert(r.length == 2)
    assert(r.head._1 == 0 && "Dr. Smith wrote code.".length == r.head._2)
  }

  test("never panics on arbitrary input (fuzz)") {
    val rnd = new scala.util.Random(4242)
    (0 until 500).foreach { _ =>
      val t = rnd.nextString(rnd.nextInt(120))
      val q = rnd.nextString(rnd.nextInt(24))
      Snippets.generate(q, t) // must not throw
    }
  }
}
