package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Rake

/** RAKE keyword extraction semantics (rake.rs:31-226). */
class RakeSpec extends AnyFunSuite {

  test("classic RAKE scoring on a hand-computable example") {
    // one sentence, stopword 'of' splits two phrases
    val text = "inverted index of inverted lists"
    val kws = Rake.keywords(text, stopwords = Set("of"))
    // phrases: [inverted, index], [inverted, lists]
    // freq: inverted 2, index 1, lists 1; degree: inverted 2, index 1, lists 1
    // score(inverted index) = (2/2 + 1/1) / 2 = 1.0, same for inverted lists
    // degree.size = 3 -> take 1
    assert(kws.length == 1)
    assert(kws.head.text == "inverted index") // tie broken by text
    assert(math.abs(kws.head.score - 1.0) < 1e-12)
  }

  test("multi-word technical phrases beat single words") {
    val text =
      """the block max wand of this engine is fast.
        |a posting list is stored with delta encoding for speed.
        |the block max wand needs a score bound on each block.
        |the delta encoding of a posting list is effective.""".stripMargin
    val kws = Rake.keywords(text)
    assert(kws.nonEmpty)
    // every keyword is stopword-free and at least two words
    kws.foreach { k =>
      val ws = k.text.split(" ")
      assert(ws.length >= 2 && ws.length <= 5, k.text)
      assert(!ws.exists(Rake.DefaultStopwords.contains), k.text)
    }
    // the repeated long phrases should surface
    val texts = kws.map(_.text)
    assert(texts.exists(t => t.contains("block max wand") ||
      t.contains("posting list compression")), texts.mkString("; "))
  }

  test("deterministic, and robust on junk") {
    val text = "alpha beta, gamma delta. alpha beta!"
    assert(Rake.keywords(text) == Rake.keywords(text))
    assert(Rake.keywords("").isEmpty)
    assert(Rake.keywords("...,,,!!!").isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach(_ => Rake.keywords(rnd.nextString(rnd.nextInt(80))))
  }
}
