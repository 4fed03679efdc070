package graft.core

import java.text.Normalizer

/** Text tokenizers, re-derived (not ported) from the reference engine's
  * observable behavior.
  *
  * Semantics studied from /root/reference:
  *  - crates/core/src/tokenizer/fields/default.rs:59-80 (pipeline:
  *    segment -> script tokenize -> Lowercase -> NFKD -> strip diacritics)
  *  - crates/core/src/tokenizer/script_tokenizer.rs:27-42 (Latin splitter:
  *    whitespace split, then split-preserving every non-alphanumeric char
  *    as its own single-char token)
  *  - crates/core/src/tokenizer/segmenter.rs:73-108 (script segmentation;
  *    both scripts currently dispatch to the Latin splitter, so
  *    segmentation only splits a leading non-ASCII run from the rest)
  *  - crates/core/src/tokenizer/normalizer/unicode/diacritics.rs
  *    (diacritic ranges stripped after NFKD)
  *  - crates/core/src/tokenizer/fields/bigram.rs:39-47 (n-gram fields are
  *    concatenations of n consecutive default tokens, no separator)
  *
  * Token vectors from default.rs:142-218 are replicated in
  * TokenizerSpec. Everything here is pure Scala so it runs inside typed
  * Dataset stages (map/flatMap) and stays allocation-light; it is the
  * hottest function of the index build.
  */
object Tokenizers {

  @inline private def isDiacritic(cp: Int): Boolean =
    (cp >= 0x0300 && cp <= 0x036f) ||
      (cp >= 0x1ab0 && cp <= 0x1aff) ||
      (cp >= 0x1dc0 && cp <= 0x1dff) ||
      (cp >= 0x20d0 && cp <= 0x20ff) ||
      (cp >= 0xfe20 && cp <= 0xfe2f)

  /** Alphanumeric in the splitter's sense: Unicode alphabetic or numeric
    * (Nd, Nl, No) — the complement set each become single-char tokens. */
  @inline private def isTokenChar(cp: Int): Boolean = {
    if (Character.isAlphabetic(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }
  }

  /** Normalize one raw token: lowercase, NFKD, strip combining diacritics. */
  private def normalize(raw: String): String = {
    var s = raw
    // cheap ASCII fast path (dominant for a source-code corpus)
    var ascii = true
    var hasUpper = false
    var i = 0
    while (i < s.length && ascii) {
      val c = s.charAt(i)
      if (c >= 0x80) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) {
      if (!hasUpper) return s
      return s.toLowerCase(java.util.Locale.ROOT)
    }
    s = s.toLowerCase(java.util.Locale.ROOT)
    s = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(s.length)
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      if (!isDiacritic(cp)) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    sb.toString
  }

  /** Latin-path split of one whitespace-free chunk: runs of alphanumeric
    * chars are tokens; every other char is its own single-char token. */
  private def splitChunk(chunk: String, out: java.util.ArrayList[String]): Unit = {
    var i = 0
    var runStart = -1
    while (i < chunk.length) {
      val cp = chunk.codePointAt(i)
      val n = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (runStart < 0) runStart = i
      } else {
        if (runStart >= 0) { out.add(chunk.substring(runStart, i)); runStart = -1 }
        out.add(chunk.substring(i, i + n))
      }
      i += n
    }
    if (runStart >= 0) out.add(chunk.substring(runStart))
  }

  /** The default tokenizer ("tokenizer" in the reference schema).
    * "example.com" -> [example, ., com]; "c++" -> [c, +, +];
    * "café" -> [cafe]. */
  def default(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new java.util.ArrayList[String](16 + text.length / 6)
    // whitespace split (Unicode whitespace, empties skipped)
    var i = 0
    var start = -1
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      if (Character.isWhitespace(cp) || Character.isSpaceChar(cp)) {
        if (start >= 0) {
          splitNormChunk(text.substring(start, i), out); start = -1
        }
      } else if (start < 0) start = i
      i += n
    }
    if (start >= 0) splitNormChunk(text.substring(start), out)
    out.toArray(new Array[String](out.size))
  }

  private def splitNormChunk(chunk: String, out: java.util.ArrayList[String]): Unit = {
    val tmp = new java.util.ArrayList[String](8)
    splitChunk(chunk, tmp)
    var k = 0
    while (k < tmp.size) {
      val t = normalize(tmp.get(k))
      if (t.nonEmpty) out.add(t)
      k += 1
    }
  }

  /** Default tokens with a stopword filter (reference:
    * default.rs:32-38 with_stopwords). */
  def defaultWithStopwords(text: String, stopwords: Set[String]): Array[String] =
    default(text).filterNot(stopwords.contains)

  /** N-gram shadow-field tokenizer: concatenation of n consecutive default
    * tokens ("this is a" -> [thisis, isa] for n=2). Empty stopword list,
    * matching the reference (bigram.rs:26-32). */
  def ngrams(text: String, n: Int): Array[String] = {
    val toks = default(text)
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) { sb.append(toks(i + j)); j += 1 }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  def bigrams(text: String): Array[String] = ngrams(text, 2)
  def trigrams(text: String): Array[String] = ngrams(text, 3)

  /** Identity tokenizer: the whole value as one token (exact-match fields). */
  def identity(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty else Array(text)

  /** Newline tokenizer (key-phrase fields): split on newlines. */
  def newlines(text: String): Array[String] =
    if (text == null) Array.empty
    else text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toArray

  /** Whitespace word tokenizer. */
  def words(text: String): Array[String] =
    if (text == null) Array.empty
    else text.split("\\s+").iterator.filter(_.nonEmpty).toArray

  /** Term-frequency map over the default tokenizer — the unit emitted per
    * document by the index build. Insertion-order independent. */
  def termFreqs(text: String): java.util.HashMap[String, Int] = {
    val toks = default(text)
    val m = new java.util.HashMap[String, Int](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      m.put(t, m.getOrDefault(t, 0) + 1)
      i += 1
    }
    m
  }
}
