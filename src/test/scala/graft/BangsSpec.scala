package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bangs

class BangsSpec extends AnyFunSuite {

  private val ytJson =
    """[{
      |  "c": "Multimedia",
      |  "d": "www.youtube.com",
      |  "r": 1646,
      |  "s": "Youtube",
      |  "sc": "Video",
      |  "t": "ty",
      |  "u": "https://www.youtube.com/results?search_query={{{s}}}"
      |}]""".stripMargin

  test("reference test vectors (bangs.rs simple_bang)") {
    val bangs = Bangs.fromJson(ytJson)
    assert(bangs.hit("no bangs").isEmpty)
    assert(bangs.hit("!no bangs").isEmpty)
    val h = bangs.hit("!ty bangs").get
    assert(h.redirectTo == "https://www.youtube.com/results?search_query=bangs")
    assert(h.bang.tag == "ty")
    assert(h.bang.site.contains("Youtube"))
    assert(h.bang.domain.contains("www.youtube.com"))
    assert(h.bang.category.contains("Multimedia"))
    assert(h.bang.subCategory.contains("Video"))
    assert(h.bang.ranking.contains(1646L))
  }

  test("rest-of-query joins, percent-encodes, keeps unmatched bang terms") {
    val bangs = Bangs.fromJson(ytJson)
    // multi-term rest keeps order; space -> %20 (urlencoding crate
    // behavior, not '+')
    assert(bangs.hit("spark !ty shuffle join").get.redirectTo ==
      "https://www.youtube.com/results?search_query=spark%20shuffle%20join")
    // an unmatched bang term stays in the query (only the winning tag
    // is removed, every occurrence of it)
    assert(bangs.hit("!zz !ty x !ty").get.redirectTo ==
      "https://www.youtube.com/results?search_query=%21zz%20x")
    // fullwidth prefix matches the same tag
    assert(bangs.hit("！ty bangs").get.redirectTo ==
      "https://www.youtube.com/results?search_query=bangs")
  }

  test("scheme fallback and encoding of reserved characters") {
    val bangs = Bangs(Seq(
      Bangs.Bang("g", "www.example.com/q={{{s}}}")))
    assert(bangs.hit("!g a+b&c").get.redirectTo ==
      "https://www.example.com/q=a%2Bb%26c")
    assert(Bangs.percentEncode("a-b_c.d~e") == "a-b_c.d~e")
    assert(Bangs.percentEncode("ü") == "%C3%BC") // utf-8 bytes
  }

  test("first matching bang wins; bare prefix is not a bang") {
    val bangs = Bangs(Seq(
      Bangs.Bang("a", "a.com/{{{s}}}"),
      Bangs.Bang("b", "b.com/{{{s}}}")))
    assert(bangs.hit("x !b y !a").get.redirectTo == "https://b.com/x%20y%20%21a")
    assert(bangs.hit("! x").isEmpty) // length-1 term: no tag
    assert(bangs.hit("").isEmpty)
  }

  test("fromJson: later duplicate tags win; missing t/u rejected") {
    val b = Bangs.fromJson(
      """[{"t":"x","u":"one.com/{{{s}}}"},{"t":"x","u":"two.com/{{{s}}}"}]""")
    assert(b.hit("!x q").get.redirectTo == "https://two.com/q")
    intercept[IllegalArgumentException](Bangs.fromJson("""[{"t":"x"}]"""))
    intercept[IllegalArgumentException](Bangs.fromJson("""{"t":"x"}"""))
  }
}
