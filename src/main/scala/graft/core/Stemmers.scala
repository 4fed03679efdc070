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

  /** Language dispatch (ISO 639-1 codes and a few names). Unknown
    * languages — including programming languages in a code corpus —
    * fall back to Porter English so existing indexes stay
    * byte-identical (golden-fixture invariant). */
  def forLanguage(lang: String): String => String =
    Option(lang).map(_.toLowerCase).getOrElse("") match {
      case "de" | "german" | "deutsch"       => german
      case "fr" | "french" | "francais"      => french
      case "es" | "spanish" | "espanol"      => spanish
      case "ru" | "russian"                  => russian
      case "pt" | "portuguese" | "portugues" => portuguese
      case "it" | "italian" | "italiano"     => italian
      case "nl" | "dutch" | "nederlands"     => dutch
      case "sv" | "swedish" | "svenska"      => swedish
      case "da" | "danish" | "dansk"         => danish
      case "ro" | "romanian" | "romana"      => romanian
      case _                                 => PorterStemmer.stem
    }

  val SupportedLanguages: Seq[String] =
    Seq("en", "de", "fr", "es", "ru", "pt", "it", "nl", "sv", "da", "ro")

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

  /** RV of the Spanish family (Spanish/Portuguese/Italian share the
    * definition): consonant at position 1 -> after the next vowel; two
    * leading vowels -> after the next consonant; else position 3. */
  private def rvIberian(w: String, vowels: String): Int = {
    if (w.length < 3) return w.length
    val c2 = w.charAt(1)
    if (!isVowel(c2, vowels)) {
      var i = 2
      while (i < w.length && !isVowel(w.charAt(i), vowels)) i += 1
      return math.min(i + 1, w.length)
    }
    if (isVowel(w.charAt(0), vowels) && isVowel(c2, vowels)) {
      var i = 2
      while (i < w.length && isVowel(w.charAt(i), vowels)) i += 1
      return math.min(i + 1, w.length)
    }
    math.min(3, w.length)
  }

  // ---------------------------------------------------------------- Russian

  private val RuVowels = "аеиоуыэюя"

  /** One suffix pattern of a Russian group: `keep` leading chars of the
    * matched pattern survive (1 for the а/я-conditioned group, encoded
    * into the pattern like the Snowball among does). */
  private final case class RuSuf(pat: String, keep: Int)

  private def ruGroup(plain: Seq[String], ayPrefixed: Seq[String]): Seq[RuSuf] =
    (plain.map(RuSuf(_, 0)) ++
      ayPrefixed.flatMap(s => Seq(RuSuf("а" + s, 1), RuSuf("я" + s, 1))))
      .sortBy(-_.pat.length)

  private val RuGerund = ruGroup(
    Seq("ив", "ивши", "ившись", "ыв", "ывши", "ывшись"),
    Seq("в", "вши", "вшись"))
  private val RuReflexive = ruGroup(Seq("ся", "сь"), Nil)
  private val RuAdjective = ruGroup(Seq("ее", "ие", "ые", "ое", "ими",
    "ыми", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "его", "ого",
    "ему", "ому", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею"), Nil)
  private val RuParticiple = ruGroup(
    Seq("ивш", "ывш", "ующ"), Seq("ем", "нн", "вш", "ющ", "щ"))
  private val RuVerb = ruGroup(
    Seq("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
      "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
      "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю"),
    Seq("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
      "ет", "ют", "ны", "ть", "ешь", "нно"))
  private val RuNoun = ruGroup(Seq("а", "ев", "ов", "ие", "ье", "е",
    "иями", "ями", "ами", "еи", "ии", "и", "ией", "ей", "ой", "ий", "й",
    "иям", "ям", "ием", "ем", "ам", "ом", "о", "у", "ах", "иях", "ях",
    "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я"), Nil)

  /** Snowball Russian (snowballstem.org/algorithms/russian/stemmer.html):
    * perfective gerund | [reflexive] (adjectival | verb | noun), then
    * trailing и, the derivational ость/ост in R2, and the superlative/
    * double-н/soft-sign cleanup. All suffix tests run in RV. */
  def russian(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase.replace('ё', 'е')
    val rv = {
      var i = 0
      while (i < w.length && !isVowel(w.charAt(i), RuVowels)) i += 1
      math.min(i + 1, w.length)
    }
    val r1 = regionAfterVC(w, 0, RuVowels)
    val r2 = regionAfterVC(w, r1, RuVowels)
    @inline def inRV(pos: Int) = pos >= rv
    @inline def inR2(pos: Int) = pos >= r2

    def drop(group: Seq[RuSuf]): Boolean = {
      for (s <- group) {
        val p = w.length - s.pat.length
        if (p >= 0 && w.endsWith(s.pat) && inRV(p)) {
          w = w.substring(0, p + s.keep)
          return true
        }
      }
      false
    }

    // step 1
    if (!drop(RuGerund)) {
      drop(RuReflexive)
      if (drop(RuAdjective)) drop(RuParticiple)
      else if (!drop(RuVerb)) drop(RuNoun)
    }
    // step 2: trailing и
    if (w.endsWith("и") && inRV(w.length - 1)) w = w.dropRight(1)
    // step 3: derivational (R2)
    var der = false
    for (suf <- Seq("ость", "ост")
         if !der && w.endsWith(suf) && inR2(w.length - suf.length)) {
      w = w.dropRight(suf.length); der = true
    }
    // step 4: undouble н / superlative / soft sign
    if (w.endsWith("нн") && inRV(w.length - 2)) w = w.dropRight(1)
    else {
      var sup = false
      for (suf <- Seq("ейше", "ейш")
           if !sup && w.endsWith(suf) && inRV(w.length - suf.length)) {
        w = w.dropRight(suf.length); sup = true
        if (w.endsWith("нн") && inRV(w.length - 2)) w = w.dropRight(1)
      }
      if (!sup && w.endsWith("ь") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    w
  }

  // ------------------------------------------------------------- Portuguese

  private val PtVowels = "aeiouáéíóúâêôãõ"

  /** Snowball Portuguese (snowballstem.org/algorithms/portuguese/
    * stemmer.html) — standard suffixes under R1/R2/RV, verb suffixes in
    * RV, residual vowel + final e/é/ê cleanup, ç -> c. The nasal ã/õ
    * are treated as plain vowels (the spec's a~/o~ digraph detour only
    * shifts region boundaries on rare shapes). */
  def portuguese(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
    val rv = rvIberian(w, PtVowels)
    val r1 = regionAfterVC(w, 0, PtVowels)
    val r2 = regionAfterVC(w, r1, PtVowels)
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    @inline def inRV(pos: Int) = pos >= rv
    var changed = false

    // step 1: standard suffixes, longest match first
    val del2 = Seq("amentos", "imentos", "amento", "imento", "adoras",
      "adores", "adora", "ações", "ância", "antes", "ador", "ação",
      "ezas", "icos", "icas", "ismos", "áveis", "íveis", "istas", "osos",
      "osas", "ante", "eza", "ico", "ica", "ismo", "ável", "ível",
      "ista", "oso", "osa").sortBy(-_.length)
    var m = false
    // amente/mente before the shorter generic table would mis-order:
    // handle the replacement/compound rules in spec order
    if (w.endsWith("amente") && inR1(w.length - 6)) {
      w = w.dropRight(6); m = true; changed = true
      if (w.endsWith("iv") && inR2(w.length - 2)) {
        w = w.dropRight(2)
        if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
      } else {
        for (pre <- Seq("os", "ic", "ad")
             if w.endsWith(pre) && inR2(w.length - 2)) w = w.dropRight(2)
      }
    }
    if (!m && w.endsWith("mente") && inR2(w.length - 5)) {
      w = w.dropRight(5); m = true; changed = true
      for (pre <- Seq("ante", "avel", "ível")
           if w.endsWith(pre) && inR2(w.length - 4)) w = w.dropRight(4)
    }
    if (!m) for (suf <- Seq("logias", "logia") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "log"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("uções", "ução") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "u"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("ências", "ência") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "ente"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("idades", "idade") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
        for (pre <- Seq("abil", "ic", "iv")
             if w.endsWith(pre) && inR2(w.length - pre.length))
          w = w.dropRight(pre.length)
      }
    }
    if (!m) for (suf <- Seq("ivas", "ivos", "iva", "ivo") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
        if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
      }
    }
    if (!m) for (suf <- Seq("iras", "ira") if !m) {
      val p = w.length - suf.length
      if (w.endsWith(suf) && inRV(p) && p > 0 && w.charAt(p - 1) == 'e') {
        w = w.substring(0, p) + "ir"; m = true; changed = true
      }
    }
    if (!m) for (suf <- del2 if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
      }
    }

    // step 2: verb suffixes in RV (only if step 1 changed nothing)
    if (!changed) {
      val verbs = Seq("aríamos", "eríamos", "iríamos", "ássemos",
        "êssemos", "íssemos", "aríeis", "eríeis", "iríeis", "ásseis",
        "ésseis", "ísseis", "áramos", "éramos", "íramos", "ávamos",
        "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
        "assem", "essem", "issem", "arão", "erão", "irão", "arias",
        "erias", "irias", "ardes", "erdes", "irdes", "asses", "esses",
        "isses", "astes", "estes", "istes", "áreis", "areis", "éreis",
        "ereis", "íreis", "ireis", "áveis", "íamos", "armos", "ermos",
        "irmos", "aria", "eria", "iria", "asse", "esse", "isse", "aste",
        "este", "iste", "arei", "erei", "irei", "aram", "eram", "iram",
        "avam", "arem", "erem", "irem", "ando", "endo", "indo", "adas",
        "idas", "arás", "aras", "erás", "eras", "irás", "avas", "ares",
        "eres", "ires", "íeis", "ados", "idos", "ámos", "amos", "emos",
        "imos", "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá",
        "ava", "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ia",
        "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu",
        "iu", "ou").sortBy(-_.length)
      for (suf <- verbs if !m) {
        if (w.endsWith(suf) && inRV(w.length - suf.length)) {
          w = w.dropRight(suf.length); m = true; changed = true
        }
      }
    }

    // step 3 / step 4
    if (changed) {
      if (w.endsWith("i") && inRV(w.length - 1) &&
        w.length >= 2 && w.charAt(w.length - 2) == 'c') w = w.dropRight(1)
    } else {
      for (suf <- Seq("os", "a", "i", "o", "á", "í", "ó")
           if w.endsWith(suf) && inRV(w.length - suf.length))
        w = w.dropRight(suf.length)
    }
    // step 5: final e/é/ê + gu/ci + cedilla
    if ((w.endsWith("e") || w.endsWith("é") || w.endsWith("ê")) &&
      inRV(w.length - 1)) {
      w = w.dropRight(1)
      if ((w.endsWith("gu") || w.endsWith("ci")) && inRV(w.length - 1))
        w = w.dropRight(1)
    }
    if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    w
  }

  // ---------------------------------------------------------------- Italian

  private val ItVowels = "aeiouàèìòù"

  /** Snowball Italian (snowballstem.org/algorithms/italian/stemmer.html)
    * — attached pronouns after gerund/infinitive endings, standard
    * suffixes under R1/R2/RV, verb suffixes in RV, final-vowel and
    * ch/gh cleanup. */
  def italian(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
      .replace('á', 'à').replace('é', 'è').replace('í', 'ì')
      .replace('ó', 'ò').replace('ú', 'ù')
    // protect i/u between vowels (and u after q) from counting as vowels
    val cs = w.toCharArray
    var i = 1
    while (i < cs.length - 1) {
      if ((cs(i) == 'i' || cs(i) == 'u') &&
        isVowel(cs(i - 1), ItVowels) && isVowel(cs(i + 1), ItVowels))
        cs(i) = (cs(i) - 32).toChar
      if (cs(i) == 'u' && cs(i - 1) == 'q') cs(i) = 'U'
      i += 1
    }
    w = new String(cs)
    val rv = rvIberian(w, ItVowels)
    val r1 = regionAfterVC(w, 0, ItVowels)
    val r2 = regionAfterVC(w, r1, ItVowels)
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    @inline def inRV(pos: Int) = pos >= rv

    // step 0: attached pronouns after -ando/-endo (delete) or
    // -ar/-er/-ir (replace with e), all in RV
    val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
      "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
      "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
      "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
      "li", "lo", "mi", "ne", "si", "ti", "vi").sortBy(-_.length)
    var pm = false
    for (p <- pronouns if !pm) {
      if (w.endsWith(p)) {
        val stem = w.dropRight(p.length)
        if (Seq("ando", "endo").exists(g =>
          stem.endsWith(g) && inRV(stem.length - g.length))) {
          w = stem; pm = true
        } else if (Seq("ar", "er", "ir").exists(g =>
          stem.endsWith(g) && inRV(stem.length - g.length))) {
          w = stem + "e"; pm = true
        }
      }
    }

    var changed = false
    var m = false
    // step 1: standard suffixes (spec order: the compound rules first)
    if (w.endsWith("amente") && inR1(w.length - 6)) {
      w = w.dropRight(6); m = true; changed = true
      if (w.endsWith("iv") && inR2(w.length - 2)) {
        w = w.dropRight(2)
        if (w.endsWith("at") && inR2(w.length - 2)) w = w.dropRight(2)
      } else {
        for (pre <- Seq("os", "ic", "abil")
             if w.endsWith(pre) && inR2(w.length - pre.length))
          w = w.dropRight(pre.length)
      }
    }
    if (!m) for (suf <- Seq("azione", "azioni", "atore", "atori") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
        if (w.endsWith("ic") && inR2(w.length - 2)) w = w.dropRight(2)
      }
    }
    if (!m) for (suf <- Seq("logia", "logie") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "log"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("uzione", "uzioni", "usione", "usioni") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "u"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("enza", "enze") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.substring(0, w.length - suf.length) + "ente"; m = true; changed = true
      }
    }
    if (!m) for (suf <- Seq("amento", "amenti", "imento", "imenti") if !m) {
      if (w.endsWith(suf) && inRV(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
      }
    }
    if (!m && w.endsWith("ità") && inR2(w.length - 3)) {
      w = w.dropRight(3); m = true; changed = true
      for (pre <- Seq("abil", "ic", "iv")
           if w.endsWith(pre) && inR2(w.length - pre.length))
        w = w.dropRight(pre.length)
    }
    if (!m) for (suf <- Seq("ivo", "ivi", "iva", "ive") if !m) {
      if (w.endsWith(suf) && inR2(w.length - suf.length)) {
        w = w.dropRight(suf.length); m = true; changed = true
        if (w.endsWith("at") && inR2(w.length - 2)) {
          w = w.dropRight(2)
          if (w.endsWith("ic") && inR2(w.length - 2)) w = w.dropRight(2)
        }
      }
    }
    if (!m) {
      val del2 = Seq("atrice", "atrici", "mente", "abile", "abili",
        "ibile", "ibili", "anza", "anze", "iche", "ichi", "ismo",
        "ismi", "ista", "iste", "isti", "ante", "anti", "ico", "ici",
        "ica", "ice", "oso", "osi", "osa", "ose").sortBy(-_.length)
      for (suf <- del2 if !m) {
        if (w.endsWith(suf) && inR2(w.length - suf.length)) {
          w = w.dropRight(suf.length); m = true; changed = true
        }
      }
    }

    // step 2: verb suffixes in RV (only if step 1 changed nothing)
    if (!changed) {
      val verbs = Seq("erebbero", "irebbero", "assero", "assimo",
        "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero",
        "iranno", "irebbe", "iremmo", "ireste", "iresti", "iscano",
        "iscono", "issero", "arono", "avamo", "avano", "avate",
        "eremo", "erete", "erono", "evamo", "evano", "evate", "iremo",
        "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
        "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
        "erei", "iamo", "immo", "irai", "irei", "isca", "isce", "isci",
        "isco", "ano", "are", "ata", "ate", "ati", "ato", "ava", "avi",
        "avo", "erà", "ere", "erò", "ete", "eva", "evi", "evo", "irà",
        "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi", "ivo",
        "ono", "uta", "ute", "uti", "uto", "ar", "ir").sortBy(-_.length)
      var vm = false
      for (suf <- verbs if !vm) {
        if (w.endsWith(suf) && inRV(w.length - suf.length)) {
          w = w.dropRight(suf.length); vm = true; changed = true
        }
      }
    }

    // step 3a: final vowel (and a preceding i), in RV
    var v3 = false
    for (suf <- Seq("a", "e", "i", "o", "à", "è", "ì", "ò")
         if !v3 && w.endsWith(suf) && inRV(w.length - 1)) {
      w = w.dropRight(1); v3 = true
      if (w.endsWith("i") && inRV(w.length - 1)) w = w.dropRight(1)
    }
    // step 3b: ch/gh -> c/g in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(w.length - 1))
      w = w.dropRight(1)
    w.replace('I', 'i').replace('U', 'u')
  }

  // ------------------------------------------------------------------ Dutch

  private val NlVowels = "aeiouyè"

  /** Snowball Dutch (snowballstem.org/algorithms/dutch/stemmer.html) —
    * en/s plural endings with valid-ending guards and kk/dd/tt
    * undoubling, the e/heid steps, derivational end/ing/lijk/baar, and
    * the double-vowel undoubling. */
  def dutch(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
      .replace('ä', 'a').replace('ë', 'e').replace('ï', 'i')
      .replace('ö', 'o').replace('ü', 'u')
      .replace('á', 'a').replace('é', 'e').replace('í', 'i')
      .replace('ó', 'o').replace('ú', 'u')
    // protect: initial y, y after a vowel, i between vowels
    val cs = w.toCharArray
    if (cs.nonEmpty && cs(0) == 'y') cs(0) = 'Y'
    var i = 1
    while (i < cs.length) {
      if (cs(i) == 'y' && isVowel(cs(i - 1), NlVowels)) cs(i) = 'Y'
      if (i < cs.length - 1 && cs(i) == 'i' &&
        isVowel(cs(i - 1), NlVowels) && isVowel(cs(i + 1), NlVowels))
        cs(i) = 'I'
      i += 1
    }
    w = new String(cs)
    var r1 = regionAfterVC(w, 0, NlVowels)
    if (r1 < 3) r1 = 3
    val r2 = regionAfterVC(w, r1, NlVowels)
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    def undouble(): Unit =
      if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt"))
        w = w.dropRight(1)
    def validEn(p: Int): Boolean =
      p > 0 && !isVowel(w.charAt(p - 1), NlVowels) &&
        !w.substring(0, p).endsWith("gem")
    def validS(p: Int): Boolean =
      p > 0 && !isVowel(w.charAt(p - 1), NlVowels) && w.charAt(p - 1) != 'j'

    // step 1
    if (w.endsWith("heden") && inR1(w.length - 5))
      w = w.dropRight(5) + "heid"
    else if (w.endsWith("ene") && inR1(w.length - 3) && validEn(w.length - 3)) {
      w = w.dropRight(3); undouble()
    } else if (w.endsWith("en") && inR1(w.length - 2) && validEn(w.length - 2)) {
      w = w.dropRight(2); undouble()
    } else if (w.endsWith("se") && inR1(w.length - 2) && validS(w.length - 2))
      w = w.dropRight(2)
    else if (w.endsWith("s") && inR1(w.length - 1) && validS(w.length - 1))
      w = w.dropRight(1)

    // step 2: final e after a non-vowel, in R1
    var eRemoved = false
    if (w.endsWith("e") && inR1(w.length - 1) && w.length >= 2 &&
      !isVowel(w.charAt(w.length - 2), NlVowels)) {
      w = w.dropRight(1); eRemoved = true; undouble()
    }

    // step 3a: heid (not after c), then en
    if (w.endsWith("heid") && inR2(w.length - 4) &&
      !(w.length >= 5 && w.charAt(w.length - 5) == 'c')) {
      w = w.dropRight(4)
      if (w.endsWith("en") && inR1(w.length - 2) && validEn(w.length - 2)) {
        w = w.dropRight(2); undouble()
      }
    }
    // step 3b: derivational
    if ((w.endsWith("end") || w.endsWith("ing")) && inR2(w.length - 3)) {
      w = w.dropRight(3)
      if (w.endsWith("ig") && inR2(w.length - 2) &&
        !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) w = w.dropRight(2)
      else undouble()
    } else if (w.endsWith("ig") && inR2(w.length - 2) &&
      !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) {
      w = w.dropRight(2)
    } else if (w.endsWith("lijk") && inR2(w.length - 4)) {
      w = w.dropRight(4)
      if (w.endsWith("e") && inR1(w.length - 1) && w.length >= 2 &&
        !isVowel(w.charAt(w.length - 2), NlVowels)) {
        w = w.dropRight(1); undouble()
      }
    } else if (w.endsWith("baar") && inR2(w.length - 4)) {
      w = w.dropRight(4)
    } else if (w.endsWith("bar") && inR2(w.length - 3) && eRemoved) {
      w = w.dropRight(3)
    }

    // step 4: undouble double vowel in C-VV-C
    if (w.length >= 4) {
      val d = w.charAt(w.length - 1)
      val v1 = w.charAt(w.length - 2)
      val v2 = w.charAt(w.length - 3)
      val c = w.charAt(w.length - 4)
      if (!isVowel(d, NlVowels) && d != 'I' && v1 == v2 &&
        "aeou".indexOf(v1) >= 0 && !isVowel(c, NlVowels))
        w = w.substring(0, w.length - 2) + d
    }
    w.replace('Y', 'y').replace('I', 'i')
  }

  // -------------------------------------------------------------- Romanian

  private val RoVowels = "aăâeiîou"

  /** Snowball Romanian
    * (snowballstem.org/algorithms/romanian/stemmer.html), mainline
    * rules: plural/article step 0, the combining-suffix loop, standard
    * suffixes in R2, the common verb suffixes in RV (only when steps
    * 1-2 removed nothing), final-vowel removal. Comma-below ș/ț
    * normalize to the cedilla forms the algorithm is defined over.
    * Pipeline note: index tokens arrive diacritic-stripped
    * (Tokenizers NFKD fold), so only the ASCII suffix subset fires
    * there — identically on doc and query sides, which is what
    * conflation needs. */
  def romanian(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase.replace('ș', 'ş').replace('ț', 'ţ')
    // protect i/u between vowels
    val cs = w.toCharArray
    var i = 1
    while (i < cs.length - 1) {
      if ((cs(i) == 'i' || cs(i) == 'u') &&
        isVowel(cs(i - 1), RoVowels) && isVowel(cs(i + 1), RoVowels))
        cs(i) = if (cs(i) == 'i') 'I' else 'U'
      i += 1
    }
    w = new String(cs)
    val r1 = regionAfterVC(w, 0, RoVowels)
    val r2 = regionAfterVC(w, r1, RoVowels)
    val rv = rvIberian(w, RoVowels)
    @inline def inR1(pos: Int) = pos >= r1
    @inline def inR2(pos: Int) = pos >= r2
    @inline def inRV(pos: Int) = pos >= rv
    /** Longest pattern of `pats` matching within the region; replace
      * with `to`. Returns true when applied. */
    def replaceIn(pats: Seq[String], to: String, in: Int => Boolean): Boolean = {
      val hit = pats.sortBy(-_.length)
        .find(p => w.endsWith(p) && in(w.length - p.length))
      hit match {
        case Some(p) => w = w.dropRight(p.length) + to; true
        case None => false
      }
    }

    // step 0: plurals / articles (in R1; alternatives are longest-match
    // within the combined among, so probe longest-first across groups)
    val step0: Seq[(Seq[String], String)] = Seq(
      (Seq("ului", "ul"), ""),
      (Seq("aua"), "a"),
      (Seq("elor", "ele", "ea"), "e"),
      (Seq("iilor", "iile", "iua", "iei", "ii"), "i"),
      (Seq("atei"), "at"),
      (Seq("aţie", "aţia"), "aţi"))
    val all0 = step0.flatMap { case (ps, to) => ps.map(p => (p, to)) } ++
      Seq(("ilor", "i"))
    val best0 = (all0 ++ Seq(("ile", "i")))
      .filter { case (p, _) => w.endsWith(p) && inR1(w.length - p.length) }
      .filter { case (p, _) => p != "ile" || !w.dropRight(3).endsWith("ab") }
      .sortBy { case (p, _) => -p.length }
      .headOption
    best0.foreach { case (p, to) => w = w.dropRight(p.length) + to }

    // step 1: combining suffixes, repeated while any fires (in R1)
    var removed12 = false
    var changed = true
    while (changed) {
      changed =
        replaceIn(Seq("abilitate", "abilitati", "abilităi", "abilităţi"),
          "abil", inR1) ||
        replaceIn(Seq("ibilitate"), "ibil", inR1) ||
        replaceIn(Seq("ivitate", "ivitati", "ivităi", "ivităţi"), "iv", inR1) ||
        replaceIn(Seq("icitate", "icitati", "icităi", "icităţi", "icator",
          "icatori", "icive", "icivi", "icivă", "iciv", "icale", "icali",
          "icală", "ical"), "ic", inR1) ||
        replaceIn(Seq("aţiune", "atoare", "atori", "ative", "ativi", "ativă",
          "ativ", "ator", "ătoare", "ători", "ător"), "at", inR1) ||
        replaceIn(Seq("iţiune", "itoare", "itive", "itivi", "itivă", "itiv",
          "itori", "itor"), "it", inR1)
      if (changed) removed12 = true
    }

    // step 2: standard suffixes (in R2)
    val del2 = Seq("abila", "abile", "abili", "abilă", "abil", "ibila",
      "ibile", "ibili", "ibilă", "ibil", "itate", "itati", "ităţi", "ităi",
      "atori", "ator", "oasa", "oasă", "oase", "anta", "ante", "anti",
      "antă", "ant", "ata", "ată", "ati", "ate", "at", "uta", "ută", "uti",
      "ute", "ut", "ita", "ită", "iti", "ite", "it", "ica", "ice", "ici",
      "ică", "ic", "osi", "oşi", "os", "iva", "ive", "ivi", "ivă", "iv")
    val ist2 = Seq("isme", "ism", "ista", "iste", "isti", "istă", "işti", "ist")
    val iune2 = Seq("iune", "iuni")
    val cand2: Seq[(String, Int)] = // (pattern, kind 0=del 1=ist 2=iune)
      del2.map((_, 0)) ++ ist2.map((_, 1)) ++ iune2.map((_, 2))
    val best2 = cand2
      .filter { case (p, _) => w.endsWith(p) && inR2(w.length - p.length) }
      .filter { case (p, k) => k != 2 ||
        (w.length > p.length && w.charAt(w.length - p.length - 1) == 'ţ') }
      .sortBy { case (p, _) => -p.length }
      .headOption
    best2.foreach { case (p, k) =>
      k match {
        case 0 => w = w.dropRight(p.length)
        case 1 => w = w.dropRight(p.length) + "ist"
        case 2 => w = w.dropRight(p.length + 1) + "t" // ţiune -> t
      }
      removed12 = true
    }

    // step 3: verb suffixes in RV, only when steps 1-2 removed nothing
    if (!removed12) {
      val uncond = Seq("seserăm", "seserăţi", "seseră", "seseşi", "sesem",
        "serăm", "serăţi", "seşi", "seră", "sese", "sei", "se")
      val condCU = Seq("ârăm", "ârăţi", "ească", "arăm", "arăţi", "irăm",
        "irăţi", "indu", "ându", "ează", "eşti", "eşte", "ăşti", "ăşte",
        "aşi", "âşi", "işi", "ară", "âră", "iră", "are", "ere", "ire",
        "âre", "ind", "ând", "eze", "eam", "eai", "eau", "iam", "iai",
        "iau", "esc", "ăsc", "ez", "ezi", "am", "ai", "au", "ui", "âi",
        "em", "eţi", "ăm", "aţi")
      val hitU = uncond.sortBy(-_.length)
        .find(p => w.endsWith(p) && inRV(w.length - p.length))
      val hitC = condCU.sortBy(-_.length)
        .find { p =>
          val pos = w.length - p.length
          w.endsWith(p) && inRV(pos) && pos > 0 && {
            val prev = w.charAt(pos - 1)
            !isVowel(prev, RoVowels) || prev == 'u'
          }
        }
      (hitU, hitC) match {
        case (Some(u), Some(c)) =>
          if (u.length >= c.length) w = w.dropRight(u.length)
          else w = w.dropRight(c.length)
        case (Some(u), None) => w = w.dropRight(u.length)
        case (None, Some(c)) => w = w.dropRight(c.length)
        case _ =>
      }
    }

    // step 4: final vowel (longest of a/e/i/ie/ă in RV, deleted)
    if (w.endsWith("ie") && inRV(w.length - 2)) w = w.dropRight(2)
    else {
      val last = if (w.nonEmpty) w.charAt(w.length - 1) else ' '
      if ((last == 'a' || last == 'e' || last == 'i' || last == 'ă') &&
        inRV(w.length - 1)) w = w.dropRight(1)
    }
    w.replace('I', 'i').replace('U', 'u')
  }

  // --------------------------------------------------------------- Swedish

  private val SvVowels = "aeiouyäåö"

  // step-1 endings sorted longest-first (Snowball among = longest match
  // that lies entirely within R1)
  private val SvStep1 = Seq(
    "heterna",
    "hetens",
    "anden", "heten", "heter", "arnas", "ernas", "ornas", "ades", "andes",
    "arens", "andet",
    "arna", "erna", "orna", "ande", "arne", "aste", "aren", "erns",
    "ade", "are", "ern", "ens", "het", "ast",
    "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e")

  /** Snowball Swedish (snowballstem.org/algorithms/swedish/stemmer.html). */
  def swedish(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
    var r1 = regionAfterVC(w, 0, SvVowels)
    if (r1 < 3) r1 = 3
    @inline def inR1(pos: Int) = pos >= r1

    // step 1: longest list ending in R1 -> delete; else bare s after a
    // valid s-ending (preceding char may lie before R1)
    var matched: String = null
    val it1 = SvStep1.iterator
    while (matched == null && it1.hasNext) {
      val suf = it1.next()
      if (w.endsWith(suf) && inR1(w.length - suf.length)) matched = suf
    }
    if (matched != null) w = w.dropRight(matched.length)
    else if (w.endsWith("s") && inR1(w.length - 1) && w.length >= 2 &&
      "bcdfghjklmnoprtvy".indexOf(w.charAt(w.length - 2)) >= 0)
      w = w.dropRight(1)

    // step 2: consonant-pair endings in R1 lose their last letter
    val it2 = Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").iterator
    var did2 = false
    while (!did2 && it2.hasNext) {
      val suf = it2.next()
      if (w.endsWith(suf) && inR1(w.length - 2)) { w = w.dropRight(1); did2 = true }
    }

    // step 3 (longest in R1): fullt->full, löst->lös; lig/els/ig delete
    if (w.endsWith("fullt") && inR1(w.length - 5)) w = w.dropRight(1)
    else if (w.endsWith("löst") && inR1(w.length - 4)) w = w.dropRight(1)
    else {
      val it3 = Seq("lig", "els", "ig").iterator
      var did3 = false
      while (!did3 && it3.hasNext) {
        val suf = it3.next()
        if (w.endsWith(suf) && inR1(w.length - suf.length)) {
          w = w.dropRight(suf.length); did3 = true
        }
      }
    }
    w
  }

  // ---------------------------------------------------------------- Danish

  private val DaVowels = "aeiouyæåø"

  private val DaStep1 = Seq(
    "erendes",
    "erende", "hedens",
    "ethed", "erede", "heden", "heder", "endes", "ernes", "erens", "erets",
    "ered", "ende", "erne", "eren", "erer", "heds", "enes", "eres", "eret",
    "hed", "ene", "ere", "ens", "ers", "ets",
    "en", "er", "es", "et",
    "e")

  /** Snowball Danish (snowballstem.org/algorithms/danish/stemmer.html). */
  def danish(word0: String): String = {
    if (word0 == null || word0.length < 2) return if (word0 == null) "" else word0
    var w = word0.toLowerCase
    var r1 = regionAfterVC(w, 0, DaVowels)
    if (r1 < 3) r1 = 3
    @inline def inR1(pos: Int) = pos >= r1

    // step 2 is re-entered from step 3, so it is a local function here
    def step2(): Unit = {
      val it = Seq("gd", "dt", "gt", "kt").iterator
      var did = false
      while (!did && it.hasNext) {
        val suf = it.next()
        if (w.endsWith(suf) && inR1(w.length - 2)) { w = w.dropRight(1); did = true }
      }
    }

    // step 1: longest list ending in R1 -> delete; else bare s after a
    // valid s-ending
    var matched: String = null
    val it1 = DaStep1.iterator
    while (matched == null && it1.hasNext) {
      val suf = it1.next()
      if (w.endsWith(suf) && inR1(w.length - suf.length)) matched = suf
    }
    if (matched != null) w = w.dropRight(matched.length)
    else if (w.endsWith("s") && inR1(w.length - 1) && w.length >= 2 &&
      "abcdfghjklmnoprtvyzå".indexOf(w.charAt(w.length - 2)) >= 0)
      w = w.dropRight(1)

    step2()

    // step 3: first igst -> drop st (whole-word test); then longest of
    // løst->løs / elig,lig,els,ig delete (delete re-runs step 2)
    if (w.endsWith("igst")) w = w.dropRight(2)
    if (w.endsWith("løst") && inR1(w.length - 4)) w = w.dropRight(1)
    else {
      val it3 = Seq("elig", "lig", "els", "ig").iterator
      var did3 = false
      while (!did3 && it3.hasNext) {
        val suf = it3.next()
        if (w.endsWith(suf) && inR1(w.length - suf.length)) {
          w = w.dropRight(suf.length); did3 = true
        }
      }
      if (did3) step2()
    }

    // step 4 (undouble): final double consonant with the last letter in
    // R1 loses the last letter
    if (w.length >= 2 && inR1(w.length - 1)) {
      val last = w.charAt(w.length - 1)
      if (last == w.charAt(w.length - 2) && !isVowel(last, DaVowels))
        w = w.dropRight(1)
    }
    w
  }
}
