package graft.core

/** Boolean query trees with the reference's clause semantics
  * (crates/tantivy/src/query/boolean_query/boolean_weight.rs:112-147):
  *
  *  - a node matches iff ALL `must` children match, NO `mustNot` child
  *    matches, and — when `must` is empty — at least one `should`
  *    child matches;
  *  - score = sum of must-scores + sum of MATCHING should-scores (the
  *    RequiredOptionalScorer: optional clauses contribute score without
  *    being required, reqopt_scorer.rs);
  *  - mustNot children contribute no score.
  *
  * `factor` applies the distributive rewrite of the reference planner
  * (crates/core/src/query/plan/node.rs:215-274):
  * (A|B) & (A|C) -> A | (B&C) — match-set preserving (checked by
  * property test). SCORE caveat: evaluate() on the factored tree
  * counts a shared clause ONCE, while the original structure sums it
  * per clause occurrence (the reference's scorers do the latter) — so
  * callers wanting reference score fidelity must evaluate the
  * ORIGINAL tree and use the factored one only where raw membership
  * or cheaper evaluation is the goal. */
object BooleanQuery {

  sealed trait Node
  final case class Term(term: String) extends Node
  final case class Bool(must: Seq[Node] = Nil, should: Seq[Node] = Nil,
                        mustNot: Seq[Node] = Nil) extends Node

  def and(children: Node*): Node = Bool(must = children)
  def or(children: Node*): Node = Bool(should = children)
  def not(positive: Node, negative: Node*): Node =
    Bool(must = Seq(positive), mustNot = negative)

  /** All positive (must/should) leaf terms — the candidate driver set. */
  def positiveTerms(n: Node): Seq[String] = n match {
    case Term(t) => Seq(t)
    case Bool(m, s, _) => (m ++ s).flatMap(positiveTerms).distinct
  }

  /** Every leaf term incl. mustNot (cursor construction). */
  def allTerms(n: Node): Seq[String] = n match {
    case Term(t) => Seq(t)
    case Bool(m, s, x) => (m ++ s ++ x).flatMap(allTerms).distinct
  }

  /** Evaluate the tree for one doc given per-term (matched, score).
    * Returns (matches, score). */
  def evaluate(n: Node, termScore: String => Option[Float]): (Boolean, Float) =
    n match {
      case Term(t) =>
        termScore(t) match {
          case Some(s) => (true, s)
          case None => (false, 0.0f)
        }
      case Bool(must, should, mustNot) =>
        var score = 0.0f
        var ok = true
        must.foreach { c =>
          val (m, s) = evaluate(c, termScore)
          if (!m) ok = false else score += s
        }
        if (ok) mustNot.foreach { c =>
          if (evaluate(c, termScore)._1) ok = false
        }
        if (ok) {
          var anyShould = false
          should.foreach { c =>
            val (m, s) = evaluate(c, termScore)
            if (m) { anyShould = true; score += s }
          }
          if (must.isEmpty && !anyShould) ok = false
        }
        if (ok) (true, score) else (false, 0.0f)
    }

  /** Distributive factoring: inside an AND, pull clauses common to ALL
    * pure-disjunction children out: (A|B) & (A|C) -> A | (B&C).
    * Recursive; structural equality decides "common". */
  def factor(n: Node): Node = n match {
    case t: Term => t
    case Bool(must, should, mustNot) =>
      val m = must.map(factor)
      val s = should.map(factor)
      val x = mustNot.map(factor)
      // candidates: pure-or children of the AND part
      val ors = m.collect { case b @ Bool(Nil, sh, Nil) if sh.nonEmpty => b }
      if (ors.length >= 2) {
        val common = ors.map(_.should.toSet).reduce(_ intersect _)
        val reduced = ors.map(b => Bool(should = b.should.filterNot(common)))
        // bail if any disjunction was ENTIRELY common: (A) & (A|C) is
        // just A-required, not A|(...) — the rewrite would widen it
        if (common.nonEmpty && reduced.forall(_.should.nonEmpty)) {
          val rest = m.filterNot(ors.contains)
          val commonSeq = ors.head.should.filter(common) // stable order
          val inner = Bool(should = commonSeq :+ Bool(must = reduced))
          return factorOnce(Bool(must = rest :+ inner, should = s, mustNot = x))
        }
      }
      Bool(m, s, x)
  }

  private def factorOnce(n: Node): Node = n match {
    case Bool(Seq(only), Nil, Nil) => only // unwrap trivial AND
    case other => other
  }
}
