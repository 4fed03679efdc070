package graft.core

/** Query-biased snippet generation, re-derived from the reference's
  * Lucene-UnifiedHighlighter-style algorithm
  * (crates/core/src/snippet.rs:150-300): the document text is treated as
  * a corpus of sentence passages; each passage is BM25-scored against
  * the query terms with passage-level statistics (idf over passages,
  * doc length = DISTINCT term count, average via integer division —
  * both reproduced from snippet.rs:203-221); the best passage seeds the
  * snippet, following passages append until the desired length, and
  * query terms highlight. If nothing highlights, a stemmed pass retries
  * (snippet.rs:295-315). Sentence boundaries follow
  * web-spell sentence_ranges (lib.rs:142-176): split after [.\n?!] only
  * when followed by whitespace, honoring a small abbreviation skip
  * list. */
object Snippets {

  final case class Config(desiredNumChars: Int = 275, deltaNumChars: Int = 50,
                          minPassageWidth: Int = 20,
                          emptyQueryWords: Int = 50)

  final case class Fragment(text: String, highlighted: Boolean)

  final case class TextSnippet(fragments: Seq[Fragment]) {
    def unhighlightedString: String = fragments.map(_.text).mkString
    def html(pre: String = "<b>", post: String = "</b>"): String =
      fragments.map(f => if (f.highlighted) pre + f.text + post else f.text).mkString
  }

  private val AbbrevSkip = Seq("mr.", "ms.", "dr.")

  /** Sentence passage boundaries (web-spell lib.rs:142-176). */
  def sentenceRanges(text: String): Seq[(Int, Int)] = {
    val res = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var lastStart = 0
    val lower = text.toLowerCase
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '.' || c == '\n' || c == '?' || c == '!') {
        val end = i + 1
        val sent = lower.substring(lastStart, end)
        val isAbbrev = AbbrevSkip.exists(sent.endsWith)
        val followedByWs = end < text.length && text.charAt(end).isWhitespace
        if (!isAbbrev && (followedByWs || end == text.length)) {
          // trim leading whitespace of the passage
          var start = lastStart
          while (start < end && text.charAt(start).isWhitespace) start += 1
          if (start < end) res += ((start, end))
          lastStart = end
        }
      }
      i += 1
    }
    if (lastStart < text.length) {
      var start = lastStart
      while (start < text.length && text.charAt(start).isWhitespace) start += 1
      if (start < text.length) res += ((start, text.length))
    }
    res.toSeq
  }

  private final case class Passage(text: String, terms: Map[String, Int]) {
    var score: Double = 0.0
  }

  private def passagesOf(text: String, cfg: Config,
                         tokenize: String => Array[String]): Seq[Passage] =
    sentenceRanges(text)
      .filter { case (s, e) => e - s > cfg.minPassageWidth }
      .map { case (s, e) =>
        val sent = text.substring(s, e)
        val m = scala.collection.mutable.HashMap[String, Int]()
        tokenize(sent).foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
        Passage(sent, m.toMap)
      }

  /** BM25 over passages-as-corpus (snippet.rs:181-221: idf over passage
    * df, length = distinct-term count, avg length integer-divided). */
  private def scorePassages(ps: Seq[Passage], terms: Set[String]): Unit = {
    if (ps.isEmpty) return
    val idf: Map[String, Double] = terms.map { t =>
      val n = ps.count(_.terms.contains(t)).toDouble
      t -> math.log((ps.length.toDouble - n + 0.5) / (n + 0.5) + 1.0)
    }.toMap
    val avg = ps.map(_.terms.size).sum / ps.length // integer division, as in the reference
    ps.foreach { p =>
      terms.foreach { t =>
        val f = p.terms.getOrElse(t, 0).toDouble
        p.score += idf(t) * (f * 2.2) /
          (f + 1.2 * (1.0 - 0.75 + 0.75 * (p.terms.size.toDouble / avg.toDouble)))
      }
    }
  }

  private def highlight(fragment: String, terms: Set[String],
                        matchTerm: String => String): TextSnippet = {
    if (fragment.isEmpty) return TextSnippet(Nil)
    val frags = scala.collection.mutable.ArrayBuffer[Fragment]()
    var plainStart = 0
    // walk default-tokenizer tokens with their offsets via a simple
    // re-scan: alnum runs are candidates (the tokenizer's token chars)
    var i = 0
    while (i < fragment.length) {
      if (Character.isLetterOrDigit(fragment.charAt(i))) {
        var j = i
        while (j < fragment.length && Character.isLetterOrDigit(fragment.charAt(j))) j += 1
        val tok = Tokenizers.normalize(fragment.substring(i, j))
        if (terms.contains(matchTerm(tok))) {
          if (plainStart < i) frags += Fragment(fragment.substring(plainStart, i), false)
          frags += Fragment(fragment.substring(i, j), true)
          plainStart = j
        }
        i = j
      } else i += 1
    }
    if (plainStart < fragment.length)
      frags += Fragment(fragment.substring(plainStart), false)
    TextSnippet(frags.toSeq)
  }

  private def build(text: String, queryTerms: Seq[String], cfg: Config,
                    termOf: String => String): TextSnippet = {
    val terms: Set[String] =
      queryTerms.flatMap(Tokenizers.default(_)).map(termOf).toSet
    val tokenize: String => Array[String] =
      s => Tokenizers.default(s).map(termOf)
    val ps = passagesOf(text, cfg, tokenize)
    var fragment =
      if (ps.isEmpty) text.take(cfg.desiredNumChars)
      else {
        scorePassages(ps, terms)
        var bestIdx = 0
        var i = 1
        while (i < ps.length) { if (ps(i).score > ps(bestIdx).score) bestIdx = i; i += 1 }
        val sb = new StringBuilder(ps(bestIdx).text)
        if (sb.length <= cfg.desiredNumChars + cfg.deltaNumChars) {
          var next = bestIdx + 1
          while (sb.length < cfg.desiredNumChars - cfg.deltaNumChars && next < ps.length) {
            sb.append(' ').append(ps(next).text)
            next += 1
          }
        }
        sb.toString
      }
    if (fragment.length > cfg.desiredNumChars + cfg.deltaNumChars)
      fragment = fragment.take(cfg.desiredNumChars + cfg.deltaNumChars)
    highlight(fragment, terms, termOf)
  }

  /** Generate a query-biased snippet; falls back to stemmed matching
    * when the literal pass highlights nothing (snippet.rs:295-315). */
  def generate(query: String, text: String,
               cfg: Config = Config()): TextSnippet = {
    if (text == null || text.isEmpty) return TextSnippet(Nil)
    val qTerms = Tokenizers.default(query).toSeq
    if (qTerms.isEmpty)
      return TextSnippet(Seq(Fragment(
        text.split("\\s+").take(cfg.emptyQueryWords).mkString(" "), false)))
    val literal = build(text, qTerms, cfg, identity)
    if (literal.fragments.exists(_.highlighted)) literal
    else build(text, qTerms, cfg, PorterStemmer.stem)
  }
}
