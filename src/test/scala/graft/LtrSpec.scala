package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Ltr

/** LambdaMART inference: LightGBM text-layout parse + hand-traced
  * predictions (mean of tree outputs, left on <=, missing = 0.0). */
class LtrSpec extends AnyFunSuite {

  private val text =
    """feature_names=f0 f1
      |other_header=ignored
      |
      |tree
      |num_leaves=3
      |split_feature=0 1
      |threshold=1.5 0.25
      |left_child=1 -1
      |right_child=-2 -3
      |leaf_value=10.0 20.0 30.0
      |
      |tree
      |num_leaves=1
      |split_feature=
      |threshold=
      |left_child=
      |right_child=
      |leaf_value=4.0
      |
      |end of trees""".stripMargin

  test("parse: trees, leaves, constant tree, load-time leaf shift") {
    val m = Ltr.parse(text)
    assert(m.featureNames.toSeq == Seq("f0", "f1"))
    assert(m.trees.length == 2)
    // parse applies the reference's per-tree |min leaf|+1 shift
    // (lambdamart.rs:155-175): tree0 min 10 -> +11, tree1 min 4 -> +5
    assert(m.trees(0).leaf.toSeq == Seq(21.0, 31.0, 41.0))
    assert(m.trees(1).splitFeature.isEmpty && m.trees(1).leaf.toSeq == Seq(9.0))
    // negative leaves end strictly positive (the shift's purpose)
    val neg = Ltr.parse(
      "feature_names=f0\n\ntree\nsplit_feature=0\nthreshold=1.0\n" +
        "left_child=-1\nright_child=-2\nleaf_value=-2.0 3.0\n\nend of trees")
    assert(neg.trees(0).leaf.toSeq == Seq(1.0, 6.0))
  }

  test("parse accepts genuine LightGBM 'Tree=N' block headers") {
    // a real `model.txt` dump opens blocks with Tree=0 / Tree=1 and
    // carries extra key=value lines; the parser must skip what it does
    // not know (the reference's split_once('=') behavior) instead of
    // demanding a literal 'tree' token
    val lgbm =
      """tree
        |version=v4
        |num_class=1
        |feature_names=f0 f1
        |
        |Tree=0
        |num_leaves=3
        |num_cat=0
        |split_feature=0 1
        |split_gain=12.5 3.25
        |threshold=1.5 0.25
        |decision_type=2 2
        |left_child=1 -1
        |right_child=-2 -3
        |leaf_value=10.0 20.0 30.0
        |leaf_weight=5 5 5
        |internal_value=0 0
        |shrinkage=0.1
        |
        |Tree=1
        |num_leaves=1
        |split_feature=
        |threshold=
        |left_child=
        |right_child=
        |leaf_value=4.0
        |
        |end of trees
        |
        |feature_importances:
        |f0=7""".stripMargin
    val m = Ltr.parse(lgbm)
    assert(m.featureNames.toSeq == Seq("f0", "f1"))
    assert(m.trees.length == 2)
    // identical semantics to the toy layout: same trees, same predict
    val toy = Ltr.parse(text)
    assert(m.predict(Map("f0" -> 1.0, "f1" -> 0.25)) ==
      toy.predict(Map("f0" -> 1.0, "f1" -> 0.25)))
  }

  test("predict: traversal, tie-on-threshold goes left, missing reads 0") {
    val m = Ltr.parse(text)
    // shifted leaves: tree0 (21, 31, 41), tree1 const 9
    // f0 <= 1.5 -> node1; f1 <= 0.25 -> leaf0 (21); +9 const; /2
    assert(m.predict(Map("f0" -> 1.0, "f1" -> 0.2)) == (21.0 + 9.0) / 2)
    // f1 > 0.25 -> leaf2 (41)
    assert(m.predict(Map("f0" -> 1.5, "f1" -> 0.3)) == (41.0 + 9.0) / 2)
    // f0 > 1.5 -> leaf1 (31)
    assert(m.predict(Map("f0" -> 2.0)) == (31.0 + 9.0) / 2)
    // missing features read 0.0 -> left, left
    assert(m.predict(Map.empty) == (21.0 + 9.0) / 2)
  }

  test("parse errors are loud") {
    intercept[Ltr.ParseError](Ltr.parse("feature_names=a\n\nend of trees"))
    intercept[Ltr.ParseError](Ltr.parse("no_names=1\n\ntree\nleaf_value=1\n\nend of trees"))
  }

  test("malformed child graphs fail at parse, not at query time") {
    def model(lc: String, rc: String, lv: String) =
      s"feature_names=f0\n\ntree\nsplit_feature=0\nthreshold=1.0\n" +
        s"left_child=$lc\nright_child=$rc\nleaf_value=$lv\n\nend of trees"
    // child index beyond the node array
    intercept[Ltr.ParseError](Ltr.parse(model("5", "-1", "1.0 2.0")))
    // self-reference (would spin Tree.score forever)
    intercept[Ltr.ParseError](Ltr.parse(model("0", "-1", "1.0 2.0")))
    // leaf id beyond leaf_value
    intercept[Ltr.ParseError](Ltr.parse(model("-1", "-4", "1.0 2.0")))
    // well-formed control still parses
    assert(Ltr.parse(model("-1", "-2", "1.0 2.0")).trees.length == 1)
  }
}
