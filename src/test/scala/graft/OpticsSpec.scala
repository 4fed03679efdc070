package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Optics
import graft.index.Optics._

/** Optics DSL: parser, pattern semantics, the reference boost fold
  * (computer/mod.rs:471-496) and the pipeline integration. */
class OpticsSpec extends AnyFunSuite {

  test("parser: rules, actions, host preferences, discard-non-matching") {
    val o = Optics.parse(
      """DiscardNonMatching;
        |Rule {
        |  Matches { Site("|github.com|") , Url("*scala*") },
        |  Matches { Title("readme*") },
        |  Action(Boost(3))
        |};
        |Rule { Matches { Domain("example") }, Action(Discard) }
        |Like(Site("good.org"));
        |Dislike(Site("bad.org"))""".stripMargin)
    assert(o.discardNonMatching)
    assert(o.rules.length == 4) // 2 rules + Like + Dislike
    assert(o.rules(0).matches.length == 2) // OR of two AND-groups
    assert(o.rules(0).matches(0).length == 2) // AND inside the first
    assert(o.rules(0).action == Boost(3))
    assert(o.rules(1).action == Discard)
    assert(o.rules(2).action == Boost(Optics.HostPrefWeight))
    assert(o.rules(3).action == Downrank(Optics.HostPrefWeight))
  }

  test("parser: a rule without an action defaults to Boost(0)") {
    val o = Optics.parse("""Rule { Matches { Site("x") } }""")
    assert(o.rules.head.action == Boost(0)) // reference lib.rs:130
  }

  test("parser rejects token-level locations loudly") {
    intercept[Optics.ParseError] {
      Optics.parse("""Rule { Matches { Content("foo") }, Action(Discard) }""")
    }
  }

  test("pattern semantics: anchors, wildcards, substring default") {
    def m(pat: String, s: String): Boolean =
      java.util.regex.Pattern.compile(regexOf(lexPattern(pat))).matcher(s).matches()
    assert(m("|github.com|", "github.com"))
    assert(!m("|github.com|", "api.github.com"))  // full anchor
    assert(m("github", "api.github.com"))          // substring default
    assert(m("|org0*", "org001/repo1"))            // prefix + wildcard
    assert(!m("|org0*", "xorg001"))
    assert(m("*.md|", "docs/readme.md"))           // suffix anchor
    assert(!m("*.md|", "readme.md.bak"))
    assert(m("a*c", "abc") && m("a*c", "axxxc") && !m("a*c", "ab"))
    // regex metachars in raw text stay literal
    assert(m("|a.b|", "a.b") && !m("|a.b|", "axb"))
  }

  test("multiplier: the reference boost fold") {
    assert(Optics.multiplier(Nil).contains(1.0))
    assert(Optics.multiplier(Seq(Boost(3))).contains(4.0))
    assert(Optics.multiplier(Seq(Boost(3), Downrank(1))).contains(3.0))
    // downrank dominance switches to the reciprocal form
    assert(Optics.multiplier(Seq(Downrank(4))).contains(1.0 / 5.0))
    assert(Optics.multiplier(Seq(Boost(1), Downrank(3))).contains(1.0 / 3.0))
    assert(Optics.multiplier(Seq(Boost(2), Discard)).isEmpty)
  }

  test("scorer: discard and discard-non-matching gate candidates") {
    val o = Optics.parse(
      """DiscardNonMatching;
        |Rule { Matches { Site("|org001*") }, Action(Boost(2)) };
        |Rule { Matches { Title("*.rs|") }, Action(Discard) }""".stripMargin)
    val score = Optics.scorer(o)
    assert(score("org001/repo1", "src/a.scala").contains((3.0, true)))
    assert(score("org001/repo1", "src/a.rs").isEmpty)      // discard rule
    assert(score("org999/repo9", "src/a.scala").isEmpty)   // non-matching
  }

  test("pipeline integration: boost reorders, discard removes") {
    val spark = SparkTestSession.spark
    val corpus = graft.index.Corpus.generate(spark, 300, seed = 55L).cache()
    val dir = java.nio.file.Files.createTempDirectory("graftoptic").toString
    graft.index.IndexBuilder.build(spark, corpus, dir,
      graft.index.IndexBuilder.Config(numSegments = 2, indexStemmed = true,
        indexBigrams = true, indexMeta = true, computeSimhash = true))
    val idx = new graft.index.InvertedIndex(spark, dir)
    val plain = graft.index.SearchPipeline.run(idx, "data table", 10)
    assert(plain.nonEmpty)
    val favourite = plain.last.repo // a low-ranked repo to boost up
    val boosted = graft.index.SearchPipeline.run(idx, "data table", 10,
      cfg = graft.index.SearchPipeline.Config(
        optic = Some(Optics.parse(s"""Like(Site("|$favourite|"))"""))))
    assert(boosted.head.repo == favourite,
      s"expected $favourite first, got ${boosted.head.repo}")
    val discarded = graft.index.SearchPipeline.run(idx, "data table", 10,
      cfg = graft.index.SearchPipeline.Config(
        optic = Some(Optics.parse(
          s"""Rule { Matches { Site("|$favourite|") }, Action(Discard) }"""))))
    assert(discarded.forall(_.repo != favourite))
  }
}
