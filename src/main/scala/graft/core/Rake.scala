package graft.core

/** RAKE keyword extraction, re-derived from the reference
  * (crates/core/src/rake.rs:31-226): lowercase -> punctuation-split
  * sentences -> SMMRY pre-pass keeping the top `summarySentences`
  * sentences by summed non-stopword word frequency -> candidate phrases
  * are maximal stopword-free runs of 2..maxWords words -> classic RAKE
  * scoring: word degree = Σ over containing phrases of (len-1), word
  * freq = Σ occurrences; phrase score = mean over its words of
  * degree/freq; keep the top numDistinctWords/3 phrases with score > 0.
  * (Rose et al., "Automatic Keyword Extraction from Individual
  * Documents", 2010.) */
object Rake {

  final case class Keyword(text: String, score: Double)

  final case class Params(summarySentences: Int = 16, maxWords: Int = 5)

  private val SentSplitChars =
    Array(',', '.', '!', '?', '\n', '\r', '\t', '…', '‥', '․')

  def keywords(text: String,
               stopwords: Set[String] = DefaultStopwords,
               params: Params = Params()): Seq[Keyword] = {
    if (text == null || text.isEmpty) return Nil
    val lower = text.toLowerCase
    val sentences = lower.split(SentSplitChars).toSeq.filter(_.nonEmpty)

    // SMMRY pre-pass (rake.rs:74-112)
    val wordFreq = scala.collection.mutable.HashMap[String, Long]()
    sentences.foreach(_.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
      if (!stopwords.contains(w)) wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1)
    })
    val topSentences = sentences
      .map { s =>
        val words = s.split("\\s+").filter(_.nonEmpty)
        (s, words.iterator.map(w => wordFreq.getOrElse(w, 0L)).sum, words.nonEmpty)
      }
      .filter(_._3)
      .sortBy(-_._2)
      .take(params.summarySentences)
      .map(_._1)

    // candidate phrases: stopword-free runs of 2..maxWords (rake.rs:42-72)
    val phrases = topSentences.flatMap { s =>
      // no per-word punctuation cleanup needed: ',' and '.' are
      // sentence-split chars, so they can never appear inside a word
      // (other glued punctuation like ';' stays attached — the oracle
      // replicates exactly this)
      val words = s.split("\\s+").iterator.filter(_.nonEmpty).toSeq
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var run = scala.collection.mutable.ArrayBuffer[String]()
      def flush(): Unit = {
        if (run.length > 1 && run.length <= params.maxWords) out += run.toSeq
        run = scala.collection.mutable.ArrayBuffer[String]()
      }
      words.foreach { w =>
        if (stopwords.contains(w)) flush() else run += w
      }
      flush()
      out.toSeq
    }

    // degree/frequency scoring (rake.rs:186-216)
    val freq = scala.collection.mutable.HashMap[String, Double]()
    val degree = scala.collection.mutable.HashMap[String, Double]()
    phrases.foreach { p =>
      val d = p.length.toDouble - 1.0
      p.foreach { w =>
        freq.update(w, freq.getOrElse(w, 0.0) + 1.0)
        degree.update(w, degree.getOrElse(w, 0.0) + d)
      }
    }
    val scored = phrases.distinct.map { p =>
      Keyword(p.mkString(" "), p.iterator.map(w => degree(w) / freq(w)).sum / p.length)
    }
    scored
      .sortBy(k => (-k.score, k.text))
      .take(degree.size / 3)
      .filter(k => k.text.length > 1 && k.score > 0.0)
  }

  /** English stopword list shared with TextOps (the reference loads
    * per-language lists from the stopwords crate). */
  val DefaultStopwords: Set[String] =
    graft.ops.TextOps.EnglishStopwords.toSet ++ Set(
      "we", "you", "they", "he", "she", "i", "but", "not", "so", "if",
      "then", "than", "can", "could", "will", "would", "there",
      "their", "them", "these", "those", "have", "has", "had", "do",
      "does", "did", "from", "into", "its", "our", "your", "his", "her")
}
