package graft.core

/** LambdaMART / GBDT inference (reference: ranking/models/lambdamart.rs
  * — "Designed for efficient inference of lightgbm compatible models"
  * over signal features). The reference repo ships NO trained model
  * artifact, so TRAINING stays scoped out; this is the inference
  * machinery and the public LightGBM text layout: per tree, parallel
  * arrays split_feature / threshold / left_child / right_child /
  * leaf_value where a negative child id addresses leaf ~id, prediction
  * is the MEAN of the tree outputs (lambdamart.rs:305-310) and
  * traversal goes left on value <= threshold with missing features
  * reading 0.0 (:81-90). */
object Ltr {

  final case class Tree(splitFeature: Array[Int], threshold: Array[Double],
                        left: Array[Int], right: Array[Int],
                        leaf: Array[Double]) {
    def score(feature: Int => Double): Double = {
      if (splitFeature.isEmpty) return if (leaf.nonEmpty) leaf(0) else 0.0
      var node = 0
      while (true) {
        val next =
          if (feature(splitFeature(node)) <= threshold(node)) left(node)
          else right(node)
        if (next < 0) return leaf(-next - 1)
        node = next
      }
      0.0 // unreachable
    }
  }

  final case class Ensemble(featureNames: Array[String], trees: Array[Tree]) {
    /** Mean of tree outputs; the per-tree sum folds left in tree order
      * (the oracle's SQL parenthesizes identically). Leaves already
      * carry the reference's load-time |min leaf|+1 per-tree shift
      * (applied in parse, lambdamart.rs:155-175), so absolute scores
      * match the reference's inference, not just the order. */
    def predict(values: Map[String, Double]): Double = {
      if (trees.isEmpty) return 0.0 // a hand-built empty ensemble is a no-op, not NaN
      val f = (i: Int) => values.getOrElse(featureNames(i), 0.0)
      var s = 0.0
      trees.foreach(t => s += t.score(f))
      s / trees.length
    }
  }

  final case class ParseError(msg: String) extends Exception(msg)

  /** Parse the LightGBM-style text layout:
    * header lines (must include `feature_names=a b c`), blank line,
    * tree blocks of key=value lines separated by blank lines,
    * terminated by `end of trees`. Mirrors the reference parser's
    * tolerance (lambdamart.rs Tree::parse splits on '=' and skips
    * anything else): a genuine LightGBM dump opens each block with
    * `Tree=0` (an ignored key), the toy layout with a bare `tree`
    * (a no-op line) — both parse; any block carrying the recognized
    * per-tree arrays becomes a tree, other lines are ignored. */
  def parse(text: String): Ensemble = {
    val lines = text.linesIterator.toArray
    val headerEnd = lines.indexWhere(_.trim.isEmpty)
    if (headerEnd < 0) throw ParseError("no blank line after header")
    val names = lines.take(headerEnd).collectFirst {
      case l if l.startsWith("feature_names=") =>
        l.substring("feature_names=".length).trim.split("\\s+")
    }.getOrElse(throw ParseError("feature_names missing"))
    val endTrees = lines.indexWhere(_.trim == "end of trees")
    if (endTrees < 0) throw ParseError("no end of trees")
    val trees = scala.collection.mutable.ArrayBuffer[Tree]()
    var i = headerEnd + 1
    while (i < endTrees) {
      while (i < endTrees && lines(i).trim.isEmpty) i += 1
      if (i < endTrees) {
        var sf = Array.empty[Int]; var th = Array.empty[Double]
        var lc = Array.empty[Int]; var rc = Array.empty[Int]
        var lv = Array.empty[Double]
        var sawArray = false
        while (i < endTrees && lines(i).trim.nonEmpty) {
          val l = lines(i).trim
          val eq = l.indexOf('=')
          if (eq > 0) {
            val vals = l.substring(eq + 1).trim
            def ints = if (vals.isEmpty) Array.empty[Int]
                       else vals.split("\\s+").map(_.toInt)
            def dbls = if (vals.isEmpty) Array.empty[Double]
                       else vals.split("\\s+").map(_.toDouble)
            l.substring(0, eq) match {
              case "split_feature" => sf = ints; sawArray = true
              case "threshold"     => th = dbls; sawArray = true
              case "left_child"    => lc = ints; sawArray = true
              case "right_child"   => rc = ints; sawArray = true
              case "leaf_value"    => lv = dbls; sawArray = true
              case _               => () // Tree=N, num_leaves etc. — ignored
            }
          } // a bare 'tree' / stray text line is a no-op, like the
            // reference's split_once('=') skip
          i += 1
        }
        if (!sawArray) {
          // a block with none of the per-tree arrays (e.g. a stray
          // comment section) is not a tree at all — skip it
        } else {
        if (lv.isEmpty) throw ParseError("tree without leaf_value")
        if (sf.length != th.length || sf.length != lc.length ||
            sf.length != rc.length)
          throw ParseError("inconsistent tree arrays")
        sf.foreach(f => if (f < 0 || f >= names.length)
          throw ParseError(s"split feature $f out of range"))
        // child validation keeps query-time traversal total: an
        // internal child must reference a LATER node (strictly
        // descending trees terminate; a cycle or self-reference would
        // spin Tree.score forever) and a leaf id must exist
        (lc ++ rc).zipWithIndex.foreach { case (child, at) =>
          val node = at % math.max(sf.length, 1)
          if (child >= 0) {
            if (child >= sf.length)
              throw ParseError(s"child $child beyond ${sf.length} nodes")
            if (child <= node)
              throw ParseError(s"child $child does not descend from node $node")
          } else if (-child - 1 >= lv.length)
            throw ParseError(s"leaf ${-child - 1} beyond ${lv.length} leaves")
        }
        // the reference's load-time leaf shift (lambdamart.rs:155-175):
        // every leaf gains |min leaf| + 1 — it wants strictly-positive
        // scores. Applied even when the min is positive, exactly like
        // the reference; a constant per-tree shift leaves ranking
        // order untouched. The q_ltr oracle generates from this SAME
        // parsed ensemble, so both engines shift in lockstep.
        val offset = math.abs(lv.min) + 1.0
        trees += Tree(sf, th, lc, rc, lv.map(_ + offset))
        }
      }
    }
    if (trees.isEmpty) throw ParseError("no trees")
    Ensemble(names, trees.toArray)
  }
}
