package graft.core

/** Exact phrase matching — positions-intersection of terms at relative
  * offsets, re-derived from the reference's PhraseScorer semantics
  * (crates/tantivy/src/query/phrase_query/phrase_scorer.rs): docs are
  * candidates when every term matches (leapfrog intersection); the
  * phrase frequency is the number of alignment positions; the score is
  * the multi-term BM25 weight (idf summed over the phrase's terms,
  * tantivy bm25.rs:98-132) applied to (fieldnorm, phraseFreq). */
object Phrase {

  /** Count p in pos(0) such that pos(k) contains p + k for all k. */
  def phraseFreq(positions: Array[Array[Int]]): Int = {
    var candidates = positions(0)
    var k = 1
    while (k < positions.length && candidates.length > 0) {
      val next = positions(k)
      val out = new Array[Int](math.min(candidates.length, next.length))
      var n = 0
      var i = 0
      var j = 0
      while (i < candidates.length && j < next.length) {
        val want = candidates(i) + k
        if (next(j) == want) { out(n) = candidates(i); n += 1; i += 1; j += 1 }
        else if (next(j) < want) j += 1
        else i += 1
      }
      candidates = java.util.Arrays.copyOf(out, n)
      k += 1
    }
    candidates.length
  }

  /** Phrase top-k over one segment: cursors in phrase-token order
    * (duplicates allowed), `weight` = Bm25 weight with idf summed over
    * the phrase terms. Callback receives (doc, phraseFreq, score). */
  def run(cursors: Seq[TermCursor], weight: Bm25Weight,
          fnorms: Array[Byte], callback: (Int, Int, Float) => Unit): Unit = {
    if (cursors.isEmpty) return
    BlockWand.intersect(cursors, (doc, _) => {
      val pos = new Array[Array[Int]](cursors.length)
      var i = 0
      while (i < cursors.length) { pos(i) = cursors(i).positions; i += 1 }
      val freq = phraseFreq(pos)
      if (freq > 0) callback(doc, freq, weight.score(fnorms(doc), freq))
    })
  }
}
