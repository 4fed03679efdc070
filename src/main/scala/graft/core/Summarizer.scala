package graft.core

/** Query-specific extractive summarization (reference:
  * crates/core/src/summarizer.rs). The text is cut into overlapping
  * word windows (`OverlappingSents`, reproduced below with the
  * reference's own edge-case semantics and pinned by its test vectors
  * in SummarizerSpec), each window is scored against the query by a
  * pluggable `PassageScorer`, the top-n windows are re-ordered by
  * position, overlap-trimmed, and joined — consecutive windows
  * directly, gaps with ". \n" (summarizer.rs:177-243). The fallback
  * when nothing scores is the first 1000 whitespace words
  * (summarizer.rs:244-248).
  *
  * The reference's production scorer is a BERT dual-encoder model
  * artifact (models/dual_encoder.rs) which does not exist in this
  * sandbox — its own test skips when the artifact is missing
  * (summarizer.rs:300-304). `TokenOverlapScorer` is the deterministic
  * stand-in: scores = |query∩passage tokens| / sqrt(passage len), f32.
  * The PassageScorer trait is the same seam the reference uses, so a
  * real encoder drops in.
  *
  * Indexing note: the reference walks UTF-8 byte indices with
  * char-boundary ceiling; this port walks UTF-16 code units with a
  * surrogate-pair ceiling — identical passages for any BMP text. */
object Summarizer {

  /** ceil_char_boundary analog for UTF-16: step past a low surrogate. */
  private def ceilCharBoundary(text: String, idx: Int): Int =
    if (idx < text.length && Character.isLowSurrogate(text.charAt(idx))) idx + 1
    else idx

  /** The reference's OverlappingSents iterator (summarizer.rs:58-144):
    * each window spans `windowSize` whitespace-delimited words; the
    * next window starts after the (windowSize - overlap)-th word. */
  def overlappingSents(text0: String, windowSize: Int,
                       overlap: Int): Iterator[(String, Range)] = {
    require(overlap < windowSize, "overlap needs to be smaller than window size")
    new Iterator[(String, Range)] {
      private var text = text0
      private var prevEnd = 0
      private val nextStart = new scala.collection.mutable.ArrayDeque[Int]()

      override def hasNext: Boolean = text.nonEmpty

      override def next(): (String, Range) = {
        var end = text.length
        var missingWords = windowSize
        nextStart.clear()
        var i = 0
        var ci = 0
        var break = false
        while (ci < text.length && !break) {
          if (Character.isWhitespace(text.charAt(ci))) {
            if (i >= windowSize) break = true
            else {
              missingWords -= 1
              if (nextStart.length > overlap) nextStart.removeHead()
              nextStart.append(ci)
              end = ci
              i += 1
            }
          }
          ci += 1
        }
        if (missingWords > 0) {
          end = text.length
          (0 until missingWords).foreach { _ =>
            if (nextStart.nonEmpty) nextStart.removeHead()
          }
        }
        val res = text.substring(0, end)
        val range = Range(prevEnd, prevEnd + end)
        if (nextStart.nonEmpty) {
          val ns = nextStart.removeHead()
          if (ns == 0) { text = ""; prevEnd += end }
          else {
            val ns2 = ceilCharBoundary(text, ns + 1)
            text = text.substring(ns2)
            prevEnd += ns2
          }
        } else { text = ""; prevEnd += end }
        (res, range)
      }
    }
  }

  /** The reference's PassageScorer seam (summarizer.rs:146-154). */
  trait PassageScorer {
    type QueryEmbedding
    type PassageEmbedding
    def embedQuery(query: String): Option[QueryEmbedding]
    def embedPassage(passage: String): Option[PassageEmbedding]
    def score(q: QueryEmbedding, p: PassageEmbedding): Float
  }

  /** Deterministic dual-encoder stand-in (see header). */
  final class TokenOverlapScorer extends PassageScorer {
    type QueryEmbedding = Set[String]
    type PassageEmbedding = Seq[String]
    private def toks(s: String): Seq[String] =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def embedQuery(query: String): Option[Set[String]] = {
      val t = toks(query).toSet
      if (t.isEmpty) None else Some(t)
    }
    def embedPassage(passage: String): Option[Seq[String]] = {
      val t = toks(passage)
      if (t.isEmpty) None else Some(t)
    }
    def score(q: Set[String], p: Seq[String]): Float =
      (p.count(q.contains).toDouble / math.sqrt(p.length.toDouble)).toFloat
  }

  private final case class Candidate(passage: String, range: Range,
                                     index: Int, score: Float)

  final class ExtractiveSummarizer(scorer: PassageScorer,
                                   topNPassages: Int = 3,
                                   windowSize: Int = 64,
                                   overlap: Int = 1) {

    /** summarizer.rs query_specific: heap-select the top-n windows
      * (strict <, so the earliest window wins ties), re-order by
      * position, trim range overlaps, join (consecutive directly,
      * gaps with ". \n"). */
    private[core] def querySpecific(query: String, text: String): Option[String] = {
      val qEmb = scorer.embedQuery(query).getOrElse(return None)
      val best = scala.collection.mutable.ArrayBuffer[Candidate]()
      overlappingSents(text, windowSize, overlap).zipWithIndex.foreach {
        case ((passage, range), index) =>
          scorer.embedPassage(passage).foreach { pEmb =>
            val c = Candidate(passage, range, index, scorer.score(qEmb, pEmb))
            if (best.length >= topNPassages) {
              val worstIx = best.indices.minBy(i => (best(i).score, -best(i).index))
              if (best(worstIx).score < c.score) best(worstIx) = c
            } else best += c
          }
      }
      if (best.isEmpty) return None
      val byPos = best.sortBy(_.index).toVector
      val trimmed = new scala.collection.mutable.ArrayBuffer[Candidate]()
      trimmed += byPos.head
      byPos.sliding(2).foreach {
        case Seq(a, b0) =>
          val b = if (a.range.end > b0.range.start) {
            val ns = ceilCharBoundary(text, a.range.end)
            b0.copy(range = Range(ns, b0.range.end),
              passage = text.substring(ns, b0.range.end))
          } else b0
          trimmed += b
        case _ => ()
      }
      val sb = new StringBuilder(trimmed.head.passage)
      trimmed.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          if (b.index == a.index + 1) sb.append(b.passage)
          else { sb.append(". \n"); sb.append(b.passage) }
        case _ => ()
      }
      Some(sb.toString)
    }

    /** summarizer.rs:244-248 incl. the 1000-word fallback. */
    def summarize(query: String, text: String): String =
      querySpecific(query, text).getOrElse(
        text.split("\\s+").filter(_.nonEmpty).take(1000).mkString(" "))
  }
}
