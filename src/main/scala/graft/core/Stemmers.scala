package graft.core

/** Multi-language stemming (reference: Snowball stemmers selected per
  * document language, crates/core/src/schema/text_field.rs:294-326 +
  * tokenizer/fields/stemmed.rs; the reference links 17 languages from
  * the tantivy/rust-stemmers crate). This file re-derives the published
  * Snowball algorithms (snowballstem.org) for German, French and
  * Spanish; English remains the existing PorterStemmer. Unsupported
  * languages fall back to English, like the reference's
  * `unwrap_or(Lang::Eng)` paths.
  *
  * Fidelity note: these are from-scratch implementations of the
  * published algorithm descriptions, verified by hand-checked common
  * vectors in StemmerSpec (the sandbox has no Snowball binary to diff
  * against); they intentionally favor the documented mainline rules. */
object Stemmers {

  /** Language dispatch (ISO 639-1 codes and a few names). */
  def forLanguage(lang: String): String => String =
    Option(lang).map(_.toLowerCase).getOrElse("") match {
      case "de" | "german" | "deutsch"  => german
      case "fr" | "french" | "francais" => french
      case "es" | "spanish" | "espanol" => spanish
      case _                            => PorterStemmer.stem
    }

  val SupportedLanguages: Seq[String] = Seq("en", "de", "fr", "es")

  @inline private def isVowel(c: Char, vowels: String): Boolean =
    vowels.indexOf(c) >= 0

  /** Standard region: position after the first non-vowel following a
    * vowel (or end). */
  private def regionAfterVC(s: String, from: Int, vowels: String): Int = {
    var i = from
    while (i < s.length && !isVowel(s.charAt(i), vowels)) i += 1 // find vowel
    while (i < s.length && isVowel(s.charAt(i), vowels)) i += 1  // vowel run
    // now at first non-vowel after a vowel... need V then C: redo properly
    i = from
    var seenVowel = false
    while (i < s.length) {
      val v = isVowel(s.charAt(i), vowels)
      if (seenVowel && !v) return i + 1
      if (v) seenVowel = true
      i += 1
    }
    s.length
  }

  // ---------------------------------------------------------------- German

  private val DeVowels = "aeiouyäöü"

  /** Snowball German (snowballstem.org/algorithms/german/stemmer.html). */
  def german(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase.replace("ß", "ss")
    // protect u/y between vowels
    val cs = w.toCharArray
    var i = 1
    while (i < cs.length - 1) {
      if (cs(i) == 'u' && isVowel(cs(i - 1), DeVowels) && isVowel(cs(i + 1), DeVowels))
        cs(i) = 'U'
      if (cs(i) == 'y' && isVowel(cs(i - 1), DeVowels) && isVowel(cs(i + 1), DeVowels))
        cs(i) = 'Y'
      i += 1
    }
    w = new String(cs)
    var r1 = regionAfterVC(w, 0, DeVowels)
    if (r1 < 3) r1 = 3 // R1 is adjusted so that the region before it has >= 3 chars
    val r2 = regionAfterVC(w, r1, DeVowels)

    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    val sEnding = "bdfghklmnrt"
    val stEnding = "bdfghklmnt"

    // step 1
    var done = false
    for (suf <- Seq("ern", "em", "er") if !done) {
      if (w.endsWith(suf) && inR1(w.length - suf.length)) {
        w = w.dropRight(suf.length); done = true
      }
    }
    if (!done) {
      for (suf <- Seq("en", "es", "e") if !done) {
        if (w.endsWith(suf) && inR1(w.length - suf.length)) {
          w = w.dropRight(suf.length)
          if (w.endsWith("niss")) w = w.dropRight(1)
          done = true
        }
      }
    }
    if (!done && w.endsWith("s") && inR1(w.length - 1) &&
      w.length >= 2 && sEnding.indexOf(w.charAt(w.length - 2)) >= 0)
      w = w.dropRight(1)

    // step 2
    done = false
    for (suf <- Seq("est", "en", "er") if !done) {
      if (w.endsWith(suf) && inR1(w.length - suf.length)) {
        w = w.dropRight(suf.length); done = true
      }
    }
    if (!done && w.endsWith("st") && inR1(w.length - 2) &&
      w.length - 2 >= 4 && stEnding.indexOf(w.charAt(w.length - 3)) >= 0)
      w = w.dropRight(2)

    // step 3 (derivational, R2)
    if ((w.endsWith("end") || w.endsWith("ung")) && inR2(w.length - 3)) {
      w = w.dropRight(3)
      if (w.endsWith("ig") && inR2(w.length - 2) &&
        !(w.length >= 3 && w.charAt(w.length - 3) == 'e'))
        w = w.dropRight(2)
    } else if ((w.endsWith("isch") && inR2(w.length - 4) &&
      !(w.length >= 5 && w.charAt(w.length - 5) == 'e'))) {
      w = w.dropRight(4)
    } else if ((w.endsWith("ik") || w.endsWith("ig")) && inR2(w.length - 2) &&
      !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) {
      w = w.dropRight(2)
    } else if ((w.endsWith("lich") || w.endsWith("heit")) && inR2(w.length - 4)) {
      w = w.dropRight(4)
      if ((w.endsWith("er") || w.endsWith("en")) && inR1(w.length - 2))
        w = w.dropRight(2)
    } else if (w.endsWith("keit") && inR2(w.length - 4)) {
      w = w.dropRight(4)
      if (w.endsWith("lich") && inR2(w.length - 4)) w = w.dropRight(4)
      else if (w.endsWith("ig") && inR2(w.length - 2)) w = w.dropRight(2)
    }

    w.replace('U', 'u').replace('Y', 'y')
      .replace("ä", "a").replace("ö", "o").replace("ü", "u")
  }

  // ---------------------------------------------------------------- French

  private val FrVowels = "aeiouyâàëéêèïîôûù"

  private def frRV(w: String): Int = {
    // RV: if word starts with two vowels -> after 3rd char; else after
    // the first vowel not at position 0; special-cases par/col/tap
    if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap")) return 3
    if (w.length >= 2 && isVowel(w.charAt(0), FrVowels) && isVowel(w.charAt(1), FrVowels))
      return math.min(3, w.length)
    var i = 1
    while (i < w.length) {
      if (isVowel(w.charAt(i), FrVowels)) return i + 1
      i += 1
    }
    w.length
  }

  /** Snowball French (snowballstem.org/algorithms/french/stemmer.html) —
    * the mainline suffix steps (standard suffixes, verb suffixes in RV,
    * residual e/é + final cleanups). */
  def french(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
    val rv = frRV(w)
    val r1 = regionAfterVC(w, 0, FrVowels)
    val r2 = regionAfterVC(w, r1, FrVowels)
    @inline def inR2(pos: Int) = pos >= r2
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inRV(pos: Int) = pos >= rv
    val orig = w
    var changed = false

    // step 1: standard suffixes (longest match; the high-traffic table)
    val std: Seq[(String, Int => Boolean)] = Seq(
      "issements" -> ((p: Int) => inR1(p) && p > 0 && !isVowel(w.charAt(p - 1), FrVowels)),
      "issement" -> ((p: Int) => inR1(p) && p > 0 && !isVowel(w.charAt(p - 1), FrVowels)),
      "atrices" -> inR2 _, "atrice" -> inR2 _, "ateurs" -> inR2 _, "ateur" -> inR2 _,
      "ations" -> inR2 _, "ation" -> inR2 _,
      "logies" -> inR2 _, "logie" -> inR2 _,
      "usions" -> inR2 _, "usion" -> inR2 _, "utions" -> inR2 _, "ution" -> inR2 _,
      "ences" -> inR2 _, "ence" -> inR2 _,
      "ements" -> ((p: Int) => inRV(p)), "ement" -> ((p: Int) => inRV(p)),
      "ités" -> inR2 _, "ité" -> inR2 _,
      "ives" -> inR2 _, "ive" -> inR2 _, "ifs" -> inR2 _, "if" -> inR2 _,
      "ances" -> inR2 _, "ance" -> inR2 _,
      "iques" -> inR2 _, "ique" -> inR2 _,
      "ismes" -> inR2 _, "isme" -> inR2 _,
      "ables" -> inR2 _, "able" -> inR2 _,
      "istes" -> inR2 _, "iste" -> inR2 _,
      "eux" -> inR2 _,
      "euses" -> inR2 _, "euse" -> inR2 _,
      "ments" -> ((p: Int) => p > 0 && isVowel(w.charAt(p - 1), FrVowels) && inRV(p - 1)),
      "ment" -> ((p: Int) => p > 0 && isVowel(w.charAt(p - 1), FrVowels) && inRV(p - 1)))
    var matchedStd = false
    for ((suf, ok) <- std if !matchedStd) {
      if (w.endsWith(suf)) {
        val p = w.length - suf.length
        if (ok(p)) {
          if (suf == "logies" || suf == "logie") w = w.substring(0, p) + "log"
          else if (suf.startsWith("usion") || suf.startsWith("ution")) w = w.substring(0, p) + "u"
          else if (suf.startsWith("ence")) w = w.substring(0, p) + "ent"
          else w = w.substring(0, p)
          matchedStd = true
          changed = true
          // "ation"/"ateur" etc: delete preceding ic -> iqU if not in R2
          if (w.endsWith("ic")) {
            if (inR2(w.length - 2)) w = w.dropRight(2)
            else w = w.dropRight(2) + "iqu"
          }
        }
      }
    }

    // step 2 (only if step 1 changed nothing): verb suffixes
    if (!changed) {
      // 2a: suffixes beginning with i, preceded by a non-vowel, in RV
      val i2a = Seq("issaient", "issantes", "iraient", "issante", "issants",
        "issions", "irions", "issais", "issait", "issant", "issent", "issiez",
        "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
        "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
        "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
      var m2a = false
      for (suf <- i2a if !m2a) {
        if (w.endsWith(suf)) {
          val p = w.length - suf.length
          if (inRV(p) && p > 0 && !isVowel(w.charAt(p - 1), FrVowels) && inRV(p - 1)) {
            w = w.substring(0, p); m2a = true; changed = true
          }
        }
      }
      // 2b: other verb suffixes in RV
      if (!m2a) {
        val i2bE = Seq("eraient", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "ées", "era",
          "iez", "ée", "és", "er", "ez", "é") // delete in RV
        val i2bA = Seq("assions", "assent", "assiez", "aient", "antes",
          "asses", "ions", "ante", "ants", "asse", "ais", "ait", "ant",
          "ât", "ai", "as", "a") // delete in RV; preceding e also removed
        var m2b = false
        for (suf <- i2bE if !m2b) {
          if (w.endsWith(suf) && inRV(w.length - suf.length)) {
            w = w.dropRight(suf.length); m2b = true; changed = true
          }
        }
        for (suf <- i2bA if !m2b) {
          if (w.endsWith(suf) && inRV(w.length - suf.length)) {
            w = w.dropRight(suf.length)
            if (w.endsWith("e") && inRV(w.length - 1)) w = w.dropRight(1)
            m2b = true; changed = true
          }
        }
      }
    }

    // step 4-ish residuals
    if (w == orig) {
      // no change at all: nothing more to do for many short words
    }
    if (w.endsWith("s") && w.length >= 2 &&
      "aiouès".indexOf(w.charAt(w.length - 2)) < 0 && w.charAt(w.length - 2) != 's') {
      // final non-grammatical s after a consonant that survived: keep
      // (full algorithm has a narrower rule; conservative here)
    }
    if ((w.endsWith("é") || w.endsWith("è")) && inRV(w.length - 1))
      w = w.dropRight(1) + "e"
    // final e in RV preceded by a non-vowel drops (residual suffix)
    if (w.endsWith("e") && inRV(w.length - 1) && w.length >= 2 &&
      !isVowel(w.charAt(w.length - 2), FrVowels) && changed)
      w = w.dropRight(1)

    w.replace('U', 'u').replace('I', 'i')
  }

  // ---------------------------------------------------------------- Spanish

  private val EsVowels = "aeiouáéíóúü"

  private def esRV(w: String): Int = {
    if (w.length < 3) return w.length
    val c2 = w.charAt(1)
    if (!isVowel(c2, EsVowels)) {
      // consonant at 2nd position: RV after next vowel
      var i = 2
      while (i < w.length && !isVowel(w.charAt(i), EsVowels)) i += 1
      return math.min(i + 1, w.length)
    }
    if (isVowel(w.charAt(0), EsVowels) && isVowel(c2, EsVowels)) {
      // two vowels: after next consonant
      var i = 2
      while (i < w.length && isVowel(w.charAt(i), EsVowels)) i += 1
      return math.min(i + 1, w.length)
    }
    math.min(3, w.length)
  }

  private def esDeaccent(w: String): String =
    w.replace('á', 'a').replace('é', 'e').replace('í', 'i')
      .replace('ó', 'o').replace('ú', 'u')

  /** Snowball Spanish (snowballstem.org/algorithms/spanish/stemmer.html)
    * — attached pronouns, standard suffixes, verb suffixes, residuals. */
  def spanish(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
    val rv = esRV(w)
    val r1 = regionAfterVC(w, 0, EsVowels)
    val r2 = regionAfterVC(w, r1, EsVowels)
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    @inline def inRV(pos: Int) = pos >= rv

    // step 0: attached pronouns after gerund/infinitive endings
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    val preGerund = Seq("ándo", "iéndo", "ando", "iendo", "ár", "ér", "ír",
      "ar", "er", "ir")
    for (p <- pronouns if w.endsWith(p)) {
      val stem = w.dropRight(p.length)
      val hit = preGerund.find(g => stem.endsWith(g) && inRV(stem.length - g.length))
      if (hit.isDefined) {
        w = esDeaccent(stem)
      }
    }

    var changed = false
    // step 1: standard suffixes
    val del2 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
      "anza", "icos", "icas", "ico", "ica", "ismos", "ismo", "ables",
      "able", "ibles", "ible", "istas", "ista", "osos", "osas", "oso",
      "osa", "aciones", "ación", "aciónes")
    for (suf <- del2 if !changed) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); changed = true
      }
    }
    if (!changed) {
      for (suf <- Seq("logías", "logía") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length) + "log"; changed = true
        }
      }
      for (suf <- Seq("uciones", "ución") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length) + "u"; changed = true
        }
      }
      for (suf <- Seq("encias", "encia") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length) + "ente"; changed = true
        }
      }
      for (suf <- Seq("idades", "idad") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length); changed = true
          for (pre <- Seq("abil", "ic", "iv") if w.endsWith(pre) && inR2(w.length - pre.length))
            w = w.dropRight(pre.length)
        }
      }
      for (suf <- Seq("amente") if !changed) {
        if (w.endsWith(suf) && inR1(w.length - suf.length)) {
          w = w.dropRight(suf.length); changed = true
          if (w.endsWith("iv") && inR2(w.length - 2)) w = w.dropRight(2)
          else for (pre <- Seq("os", "ic", "ad") if w.endsWith(pre) && inR2(w.length - pre.length))
            w = w.dropRight(pre.length)
        }
      }
      for (suf <- Seq("mente") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length); changed = true
          for (pre <- Seq("ante", "able", "ible") if w.endsWith(pre) && inR2(w.length - pre.length))
            w = w.dropRight(pre.length)
        }
      }
      for (suf <- Seq("ivas", "ivos", "iva", "ivo") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length); changed = true
          if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
        }
      }
      for (suf <- Seq("adoras", "adores", "adora", "ador", "antes", "ante",
        "ancias", "ancia") if !changed) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length); changed = true
        }
      }
    }

    // step 2: verb suffixes in RV (if step 1 changed nothing)
    if (!changed) {
      // 2a: preceded by 'u'
      val y2a = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
        "yes", "ya", "ye", "yo", "yó")
      var m = false
      for (suf <- y2a if !m) {
        if (w.endsWith(suf) && inRV(w.length - suf.length) &&
          w.length > suf.length && w.charAt(w.length - suf.length - 1) == 'u') {
          w = w.dropRight(suf.length); m = true; changed = true
        }
      }
      if (!m) {
        val verbs = Seq("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
          "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
          "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
          "ásemos", "arían", "arías", "aréis", "erían", "erías", "eréis",
          "irían", "irías", "iréis", "ieran", "iesen", "ieron", "iendo",
          "ieras", "ieses", "abais", "arais", "aseis", "íamos", "emos",
          "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
          "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
          "aron", "ando", "abas", "adas", "idas", "aras", "ases", "íais",
          "ados", "idos", "amos", "imos", "ará", "aré", "erá", "eré",
          "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado",
          "ido", "ías", "áis", "éis", "ía", "ad", "ed", "id", "an", "ió",
          "ar", "er", "ir", "as", "ís", "en", "es")
        for (suf <- verbs if !m) {
          if (w.endsWith(suf) && inRV(w.length - suf.length)) {
            w = w.dropRight(suf.length)
            // 'en'/'es'/'éis'/'emos' drop a preceding gu -> g
            if ((suf == "en" || suf == "es" || suf == "éis" || suf == "emos") &&
              w.endsWith("gu")) w = w.dropRight(1)
            m = true; changed = true
          }
        }
      }
    }

    // step 3: residual suffix
    for (suf <- Seq("os", "a", "o", "á", "í", "ó") if w.endsWith(suf) &&
      inRV(w.length - suf.length)) {
      w = w.dropRight(suf.length)
    }
    if ((w.endsWith("e") || w.endsWith("é")) && inRV(w.length - 1)) {
      w = w.dropRight(1)
      if (w.endsWith("gu") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    esDeaccent(w)
  }
}
