package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's optics DSL re-expressed Spark-first (reference:
  * `crates/optics/src/lib.rs` — Optic/Rule/Matching/Action/HostRankings
  * — and the ranking-side boost fold, `crates/core/src/ranking/
  * computer/mod.rs:471-496`).
  *
  * Scope (honest subset): the METADATA match locations — Site, Domain,
  * Url, Title — which map to the code corpus as repo, repo's org,
  * repo/path and file name. Content/MicroformatTag/Schema locations
  * need the token-level PatternQuery over the inverted index
  * (`query/optic.rs:171-230`) and stay scoped out per SURVEY §7.3 —
  * `parse` rejects them loudly rather than silently never matching.
  * Liked/disliked hosts fold to Boost(4)/Downrank(4) site rules (the
  * reference additionally feeds them into a personalized inbound-
  * similarity signal, which needs the webgraph — scoped).
  *
  * Patterns: `*` matches any run of characters, `|` anchors a pattern
  * end to the field boundary (the reference matches token streams;
  * over these short metadata fields the string form is equivalent for
  * anchors and separators — a documented simplification). Blocked
  * sites (`Rule {{ Matches {{ Site("|host|") }}, Action(Discard) }}`)
  * behave identically in both forms.
  *
  * Application is two-sided like everything else in this engine: a
  * pure-Column form (`columns`) for distributed DataFrame use — plain
  * `regexp_like`, fully codegen'd, oracle-replicable in SQL — and a
  * driver-side closure (`scorer`) the serving pipeline applies to its
  * k·slack candidate page. Both compile each pattern ONCE to the same
  * regex string (RE2-safe escaping, no \Q\E, so DuckDB's regexp
  * engine accepts the identical pattern). */
object Optics {

  sealed trait Part
  final case class Raw(s: String) extends Part
  case object Wildcard extends Part
  case object Anchor extends Part

  /** Match location: four metadata fields + the token-level Content
    * location (evaluated against the inverted index's positions — the
    * reference's PatternQuery, query/pattern_query/). */
  sealed trait Location
  case object Site extends Location
  case object Domain extends Location
  case object Url extends Location
  case object Title extends Location
  case object Content extends Location

  final case class Matching(location: Location, pattern: List[Part]) {
    /** One regex string shared by the Column and driver forms. */
    val regex: String = Optics.regexOf(pattern)
  }

  sealed trait Action
  final case class Boost(b: Long) extends Action
  final case class Downrank(b: Long) extends Action
  case object Discard extends Action

  /** `matches` is an OR of ANDs: the rule fires if every matching in
    * at least one group matches (reference Rule doc, lib.rs:400-404). */
  final case class Rule(matches: List[List[Matching]], action: Action)

  final case class Optic(rules: List[Rule], discardNonMatching: Boolean) {
    def isEmpty: Boolean = rules.isEmpty && !discardNonMatching
  }

  /** Default weight the host-preference shorthand folds to. */
  final val HostPrefWeight = 4L

  // ------------------------------------------------------------- parsing

  final case class ParseError(msg: String, at: Int)
      extends Exception(s"optic parse error at $at: $msg")

  /** Hand-rolled recursive-descent parser for the optic grammar
    * (reference grammar: crates/optics/src/parser.lalrpop; this is an
    * original implementation of the same surface syntax):
    *
    *   optic  := (stmt ';'?)*
    *   stmt   := "DiscardNonMatching"
    *           | "Like" '(' "Site" '(' string ')' ')'
    *           | "Dislike" '(' "Site" '(' string ')' ')'
    *           | "Rule" '{' matches+ action? '}'
    *   matches:= "Matches" '{' (loc '(' string ')' ','?)+ '}' ','?
    *   action := "Action" '(' ("Boost"|"Downrank") '(' int ')' |
    *             "Discard" ')' ','?
    */
  def parse(text: String): Optic = {
    var i = 0
    def err(msg: String): Nothing = throw ParseError(msg, i)
    def ws(): Unit = {
      while (i < text.length &&
             (text.charAt(i).isWhitespace || text.startsWith("//", i))) {
        if (text.startsWith("//", i)) {
          while (i < text.length && text.charAt(i) != '\n') i += 1
        } else i += 1
      }
    }
    def peekIdent(): String = {
      ws()
      var j = i
      while (j < text.length && (text.charAt(j).isLetterOrDigit)) j += 1
      text.substring(i, j)
    }
    def ident(): String = {
      val s = peekIdent(); if (s.isEmpty) err("identifier expected")
      i += s.length; s
    }
    def expect(c: Char): Unit = {
      ws()
      if (i >= text.length || text.charAt(i) != c) err(s"'$c' expected")
      i += 1
    }
    def maybe(c: Char): Boolean = {
      ws()
      if (i < text.length && text.charAt(i) == c) { i += 1; true } else false
    }
    def quoted(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < text.length && text.charAt(i) != '"') {
        sb.append(text.charAt(i)); i += 1
      }
      expect('"')
      sb.toString
    }
    def number(): Long = {
      ws()
      var j = i
      while (j < text.length && text.charAt(j).isDigit) j += 1
      if (j == i) err("number expected")
      val n = text.substring(i, j).toLong; i = j; n
    }
    def location(name: String): Location = name match {
      case "Site"    => Site
      case "Domain"  => Domain
      case "Url"     => Url
      case "Title"   => Title
      case "Content" => Content
      case "Description" | "MicroformatTag" | "Schema" =>
        err(s"$name has no analog in the code-corpus doc model " +
          "(scoped, SURVEY §7.3) — supported: Site/Domain/Url/Title/Content")
      case other => err(s"unknown match location $other")
    }
    def matching(): Matching = {
      val loc = location(ident())
      expect('('); val pat = quoted(); expect(')')
      val parts = lexPattern(pat)
      if (loc == Content && parts.forall(p => p == Anchor || p == Wildcard))
        err("Content pattern needs at least one literal token run")
      Matching(loc, parts)
    }
    def matchGroup(): List[Matching] = {
      expect('{')
      val ms = scala.collection.mutable.ListBuffer[Matching]()
      while (!maybe('}')) {
        ms += matching()
        maybe(',')
      }
      ms.toList
    }
    def rule(): Rule = {
      expect('{')
      val groups = scala.collection.mutable.ListBuffer[List[Matching]]()
      var action: Action = Boost(0) // reference default, lib.rs:130
      while (!maybe('}')) {
        ident() match {
          case "Matches" => groups += matchGroup()
          case "Action" =>
            expect('(')
            action = ident() match {
              case "Boost"    => expect('('); val b = number(); expect(')'); Boost(b)
              case "Downrank" => expect('('); val b = number(); expect(')'); Downrank(b)
              case "Discard"  => Discard
              case other      => err(s"unknown action $other")
            }
            expect(')')
          case other => err(s"Matches or Action expected, got $other")
        }
        maybe(',')
      }
      // an empty Matches group (or a rule with none) would make the
      // Column form's reduce crash while the driver scorer vacuously
      // fires on EVERY doc — reject the ambiguity at parse instead
      if (groups.isEmpty) err("Rule needs at least one Matches group")
      if (groups.exists(_.isEmpty)) err("Matches group cannot be empty")
      Rule(groups.toList, action)
    }
    val rules = scala.collection.mutable.ListBuffer[Rule]()
    var discardNonMatching = false
    ws()
    while (i < text.length) {
      ident() match {
        case "DiscardNonMatching" => discardNonMatching = true
        case "Rule"               => rules += rule()
        case "Like" =>
          expect('('); val l = ident()
          if (l != "Site") err("Like takes Site(...)")
          expect('('); val host = quoted(); expect(')'); expect(')')
          rules += Rule(List(List(Matching(Site, hostPattern(host)))),
            Boost(HostPrefWeight))
        case "Dislike" =>
          expect('('); val l = ident()
          if (l != "Site") err("Dislike takes Site(...)")
          expect('('); val host = quoted(); expect(')'); expect(')')
          rules += Rule(List(List(Matching(Site, hostPattern(host)))),
            Downrank(HostPrefWeight))
        case other => err(s"statement expected, got $other")
      }
      maybe(';')
      ws()
    }
    Optic(rules.toList, discardNonMatching)
  }

  /** Host preferences rank the HOST ITSELF (reference HostRankings —
    * exact hosts, not substrings), so a bare Like/Dislike host gets
    * both anchors; already-anchored spellings are normalized first so
    * "|host|" doesn't double up into an invalid interior anchor. */
  private def hostPattern(host: String): List[Part] =
    Anchor :: (lexPattern(host).dropWhile(_ == Anchor).reverse
      .dropWhile(_ == Anchor).reverse :+ Anchor)

  /** Pattern lexer (reference PatternToken::lex, lib.rs:231-273):
    * '*' -> Wildcard, '|' -> Anchor, runs of anything else -> Raw
    * (trimmed, like the reference). */
  def lexPattern(s: String): List[Part] = {
    val out = scala.collection.mutable.ListBuffer[Part]()
    val raw = new StringBuilder
    def flush(): Unit = if (raw.nonEmpty) {
      out += Raw(raw.toString.trim); raw.clear()
    }
    s.foreach {
      case '*' => flush(); out += Wildcard
      case '|' => flush(); out += Anchor
      case c   => raw.append(c)
    }
    flush()
    out.toList.filter { case Raw("") => false; case _ => true }
  }

  /** Compile to ONE regex string both engines accept (manual
    * metacharacter escaping — \Q\E is Java-only and DuckDB's RE2-style
    * engine rejects it). Unanchored ends are open (substring match);
    * interior anchors are unsupported like the reference's
    * Error::Pattern. */
  def regexOf(parts: List[Part]): String = {
    def esc(s: String): String =
      s.flatMap(c => if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) "\\" + c else c.toString)
    val startAnchor = parts.headOption.contains(Anchor)
    val endAnchor = parts.length >= 2 && parts.last == Anchor
    val mid = parts
      .drop(if (startAnchor) 1 else 0)
      .dropRight(if (endAnchor) 1 else 0)
    val sb = new StringBuilder
    sb.append(if (startAnchor) "^" else "^.*")
    mid.foreach {
      case Raw(s)   => sb.append(esc(s))
      case Wildcard => sb.append(".*")
      case Anchor =>
        throw ParseError("interior '|' anchors are unsupported", 0)
    }
    sb.append(if (endAnchor) "$" else ".*$")
    sb.toString
  }

  // ---------------------------------------------------------- application

  /** The reference's boost fold (computer/mod.rs:471-496): boosts and
    * downranks of the MATCHING rules sum separately; the multiplier is
    * boost-down+1 when boosts win, 1/(1+(down-boost)) otherwise.
    * Returns None for a discarded doc. */
  def multiplier(actions: Seq[Action]): Option[Double] = {
    var boost = 0.0
    var down = 0.0
    actions.foreach {
      case Boost(b)    => boost += b.toDouble
      case Downrank(b) => down += b.toDouble
      case Discard     => return None
    }
    Some(if (down > boost) 1.0 / (1.0 + (down - boost)) else boost - down + 1.0)
  }

  /** Field string of a location for the code corpus (web mapping:
    * site=repo, domain=org, url=repo/path, title=file name). */
  private def fieldOf(loc: Location, repo: String, path: String): String =
    loc match {
      case Site   => repo
      case Domain => val s = repo.indexOf('/'); if (s < 0) repo else repo.substring(0, s)
      case Url    => repo + "/" + path
      case Title  => path.substring(path.lastIndexOf('/') + 1)
      case Content =>
        throw new IllegalStateException("Content matchings need contentOk")
    }

  /** The token-level matchings of an optic (need index evaluation). */
  def contentMatchings(optic: Optic): List[Matching] =
    optic.rules.flatMap(_.matches.flatten).filter(_.location == Content).distinct

  /** Exact-anchored Site Discard rules — the reference's
    * `as_blocked_sites` special case (lib.rs:406-470): a rule of the
    * exact shape `Rule {{ Matches {{ Site("|host|") }},
    * Action(Discard) }}` is a blocklist entry the recall stage can
    * lower to a must-not metadata term instead of spending candidate
    * slots on docs the collector will drop anyway. */
  def blockedSites(optic: Optic): Seq[String] =
    optic.rules.collect {
      case Rule(List(List(Matching(Site, Anchor :: Raw(host) :: Anchor :: Nil))),
                Discard) => host
    }

  /** WILDCARD Site/Domain Discard matchings — blocklists by pattern
    * rather than exact host (e.g. `Site("*.mirror.*")`). Only
    * single-matching single-group rules qualify: their discard fires
    * iff the site/domain pattern matches, so the recall stage may
    * resolve the pattern against the index's distinct repo metadata
    * once (InvertedIndex.reposMatching) and lower every matched repo
    * to a must-not term — blocked docs then never consume candidate
    * slots, the same recall-stage compilation the reference applies to
    * its blocked-sites special case (query/optic.rs:164-168). Rules
    * that AND the site with other matchings stay post-recall. */
  def blockedSitePatterns(optic: Optic): Seq[Matching] =
    optic.rules.collect {
      case Rule(List(List(m @ Matching(loc, parts))), Discard)
          if (loc == Site || loc == Domain) &&
            !(loc == Site && (parts match {
              case Anchor :: Raw(_) :: Anchor :: Nil => true
              case _ => false
            })) => m
    }

  /** Driver-side scorer for the serving pipeline's candidate page:
    * (multiplier, matchedAnyRule); None = discarded (a Discard rule
    * fired, or DiscardNonMatching and nothing matched). Metadata
    * patterns are pre-compiled once per optic; Content matchings
    * delegate to `contentOk` — the pipeline pre-resolves them against
    * the index for exactly the candidate page (one distributed pattern
    * pass per distinct Content matching, InvertedIndex.patternMatch). */
  def scorer(optic: Optic,
             contentOk: (Matching, Hit) => Boolean = (m, _) =>
               throw new IllegalArgumentException(
                 s"optic has token-level matching $m but no content evaluator"))
      : Hit => Option[(Double, Boolean)] = {
    val compiled: List[(Rule, List[List[(Matching, java.util.regex.Pattern)]])] =
      optic.rules.map { r =>
        r -> r.matches.map(_.map(m =>
          (m, if (m.location == Content) null
              else java.util.regex.Pattern.compile(m.regex))))
      }
    h => {
      val fired = compiled.collect {
        case (rule, groups) if groups.exists(_.forall { case (m, p) =>
          if (m.location == Content) contentOk(m, h)
          else p.matcher(fieldOf(m.location, h.repo, h.path)).matches()
        }) => rule.action
      }
      multiplier(fired) match {
        case None => None
        case Some(mult) =>
          if (optic.discardNonMatching && fired.isEmpty) None
          else Some((mult, fired.nonEmpty))
      }
    }
  }

  /** Distributed Column form: (multiplier, discard) over metadata
    * columns — plain regexp_like trees, codegen'd, no UDF, and the
    * regex strings are the exact ones a SQL oracle can reuse. Rejects
    * Content matchings (those need the index; use the pipeline path). */
  def columns(optic: Optic, site: Column, domain: Column, url: Column,
              title: Column): (Column, Column) = {
    require(contentMatchings(optic).isEmpty,
      "Content matchings need index evaluation — use SearchPipeline's optic")
    def colOf(loc: Location): Column = loc match {
      case Site => site
      case Domain => domain
      case Url => url
      case Title => title
      case Content => throw new IllegalStateException("unreachable")
    }
    def ruleMatch(r: Rule): Column =
      r.matches.map(_.map(m => regexp_like(colOf(m.location), lit(m.regex)))
        .reduce(_ && _)).reduce(_ || _)
    val fired = optic.rules.map(r => (ruleMatch(r), r.action))
    val boost = fired.collect { case (m, Boost(b)) =>
      when(m, lit(b.toDouble)).otherwise(lit(0.0)) }
      .reduceOption(_ + _).getOrElse(lit(0.0))
    val down = fired.collect { case (m, Downrank(b)) =>
      when(m, lit(b.toDouble)).otherwise(lit(0.0)) }
      .reduceOption(_ + _).getOrElse(lit(0.0))
    val discarded = fired.collect { case (m, Discard) => m }
      .reduceOption(_ || _).getOrElse(lit(false))
    val anyMatch = fired.map(_._1).reduceOption(_ || _).getOrElse(lit(false))
    val mult = when(down > boost, lit(1.0) / (lit(1.0) + (down - boost)))
      .otherwise(boost - down + lit(1.0))
    val discard =
      if (optic.discardNonMatching) discarded || !anyMatch else discarded
    (mult, discard)
  }
}
