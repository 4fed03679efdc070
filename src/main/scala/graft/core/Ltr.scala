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
      * (the oracle's SQL parenthesizes identically). */
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
    * tree blocks (`tree` then key=value lines) separated by blank
    * lines, terminated by `end of trees`. */
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
        if (lines(i).trim != "tree") throw ParseError(s"expected 'tree' at line $i")
        i += 1
        var sf = Array.empty[Int]; var th = Array.empty[Double]
        var lc = Array.empty[Int]; var rc = Array.empty[Int]
        var lv = Array.empty[Double]
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
              case "split_feature" => sf = ints
              case "threshold"     => th = dbls
              case "left_child"    => lc = ints
              case "right_child"   => rc = ints
              case "leaf_value"    => lv = dbls
              case _               => () // num_leaves etc. — ignored
            }
          }
          i += 1
        }
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
        trees += Tree(sf, th, lc, rc, lv)
      }
    }
    if (trees.isEmpty) throw ParseError("no trees")
    Ensemble(names, trees.toArray)
  }
}
