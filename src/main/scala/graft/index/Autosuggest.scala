package graft.index

/** Autosuggest, re-derived from the reference (crates/core/src/
  * autosuggest.rs): built from the TopKeyPhrases output — the sorted
  * distinct phrase texts play the fst::Set, phrase→score the side map.
  * `suggestions` streams prefix matches in LEXICOGRAPHIC order (fst
  * prefix-automaton semantics) capped at 64 candidates, ranks them by
  * key-phrase score keeping 10, and returns those alphabetically. The
  * reference's score sort leaves ties unspecified; here the stable
  * sort over the lexicographic stream makes ties resolve
  * alphabetically, deterministically. */
final class Autosuggest(phrases: Seq[(String, Double)]) {
  private val sorted: Vector[String] = phrases.map(_._1).distinct.sorted.toVector
  private val scores: Map[String, Double] = phrases.toMap

  def suggestions(query: String, cap: Int = 64, k: Int = 10): Seq[String] = {
    val q = query.toLowerCase
    sorted.iterator.filter(_.startsWith(q)).take(cap).toSeq
      .map(s => (s, scores.getOrElse(s, 0.0)))
      .sortBy(-_._2)
      .take(k).map(_._1).sorted
  }
}

object Autosuggest {
  /** Build from an index with stored key phrases
    * (Config.indexKeyPhrases), `pool` = TopKeyPhrases breadth. */
  def fromIndex(idx: InvertedIndex, pool: Int = 100): Autosuggest =
    new Autosuggest(idx.topKeyPhrases(pool))
}
