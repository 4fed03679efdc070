package graft.core

/** Porter stemming algorithm (M.F. Porter, 1980, public domain
  * algorithm), implemented from the published definition. Stands in for
  * the reference's per-language Snowball stemmers on the stemmed shadow
  * field (reference: tokenizer/fields/stemmed.rs; round-1 scope is
  * English — the corpus language — with identity fallback elsewhere). */
object PorterStemmer {

  @inline private def isVowelAt(w: StringBuilder, i: Int): Boolean = {
    w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowelAt(w, i - 1)
      case _ => false
    }
  }

  /** Measure m of w[0..end]: number of VC sequences. */
  private def measure(w: StringBuilder, end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i <= end && !isVowelAt(w, i)) i += 1
    while (i <= end) {
      // in vowel run
      while (i <= end && isVowelAt(w, i)) i += 1
      if (i > end) return m
      m += 1
      while (i <= end && !isVowelAt(w, i)) i += 1
    }
    m
  }

  private def hasVowel(w: StringBuilder, end: Int): Boolean = {
    var i = 0
    while (i <= end) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  private def endsWith(w: StringBuilder, s: String): Boolean = {
    if (w.length < s.length) return false
    var i = 0
    val off = w.length - s.length
    while (i < s.length) {
      if (w.charAt(off + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  private def doubleConsonant(w: StringBuilder): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && !isVowelAt(w, n - 1)
  }

  /** cvc at end, second c not w/x/y. */
  private def cvc(w: StringBuilder): Boolean = {
    val n = w.length
    if (n < 3) return false
    if (isVowelAt(w, n - 1) || !isVowelAt(w, n - 2) || isVowelAt(w, n - 3)) return false
    val c = w.charAt(n - 1)
    c != 'w' && c != 'x' && c != 'y'
  }

  /** Replace suffix `s` by `r` if measure of the stem > m0. */
  private def repl(w: StringBuilder, s: String, r: String, m0: Int): Boolean = {
    if (!endsWith(w, s)) return false
    val stemEnd = w.length - s.length - 1
    if (stemEnd < 0 || measure(w, stemEnd) <= m0) return true // matched, no change
    w.setLength(w.length - s.length)
    w.append(r)
    true
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // only plain-ascii lowercase words
      i += 1
    }
    val w = new StringBuilder(word)

    // Step 1a
    if (endsWith(w, "sses")) w.setLength(w.length - 2)
    else if (endsWith(w, "ies")) w.setLength(w.length - 2)
    else if (!endsWith(w, "ss") && endsWith(w, "s")) w.setLength(w.length - 1)

    // Step 1b
    var extra = false
    if (endsWith(w, "eed")) {
      if (measure(w, w.length - 4) > 0) w.setLength(w.length - 1)
    } else if (endsWith(w, "ed") && hasVowel(w, w.length - 3)) {
      w.setLength(w.length - 2); extra = true
    } else if (endsWith(w, "ing") && w.length > 3 && hasVowel(w, w.length - 4)) {
      w.setLength(w.length - 3); extra = true
    }
    if (extra) {
      if (endsWith(w, "at") || endsWith(w, "bl") || endsWith(w, "iz")) w.append('e')
      else if (doubleConsonant(w) && !endsWith(w, "l") && !endsWith(w, "s") && !endsWith(w, "z"))
        w.setLength(w.length - 1)
      else if (measure(w, w.length - 1) == 1 && cvc(w)) w.append('e')
    }

    // Step 1c
    if (endsWith(w, "y") && hasVowel(w, w.length - 2)) w.setCharAt(w.length - 1, 'i')

    // Step 2
    val step2 = Array(
      ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
      ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
      ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
      ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
      ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"))
    var done = false
    i = 0
    while (i < step2.length && !done) {
      done = repl(w, step2(i)._1, step2(i)._2, 0)
      i += 1
    }

    // Step 3
    val step3 = Array(
      ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
      ("ical", "ic"), ("ful", ""), ("ness", ""))
    done = false
    i = 0
    while (i < step3.length && !done) {
      done = repl(w, step3(i)._1, step3(i)._2, 0)
      i += 1
    }

    // Step 4
    val step4 = Array("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    done = false
    i = 0
    while (i < step4.length && !done) {
      val s = step4(i)
      if (endsWith(w, s)) {
        val stemEnd = w.length - s.length - 1
        if (stemEnd >= 0 && measure(w, stemEnd) > 1) w.setLength(w.length - s.length)
        done = true
      } else if (s == "ent" && endsWith(w, "ion")) {
        // handled below
      }
      i += 1
    }
    if (!done && endsWith(w, "ion") && w.length >= 4) {
      val c = w.charAt(w.length - 4)
      // stem = w[0 .. len-4] (keeps the preceding s/t), per Porter S4
      if ((c == 's' || c == 't') && measure(w, w.length - 4) > 1)
        w.setLength(w.length - 3)
    }

    // Step 5a
    if (endsWith(w, "e")) {
      val m = measure(w, w.length - 2)
      if (m > 1) w.setLength(w.length - 1)
      else if (m == 1) {
        w.setLength(w.length - 1)
        if (cvc(w)) w.append('e')
      }
    }
    // Step 5b
    if (doubleConsonant(w) && endsWith(w, "l") && measure(w, w.length - 1) > 1)
      w.setLength(w.length - 1)

    w.toString
  }
}
