package graft.core

/** !bang query redirects (reference: crates/core/src/bangs.rs). A bang
  * table maps a tag to a redirect-URL template; the FIRST query term
  * carrying a bang prefix ('!' or '！', BANG_PREFIXES bangs.rs:31)
  * whose tag is in the table wins. Every occurrence of the winning
  * bang term is removed, the remaining terms — including other,
  * unmatched bang terms — are space-joined, percent-encoded, and
  * substituted for the "{{{s}}}" placeholder (bangs.rs:146-171); a
  * template without a scheme gets "https://" prepended (the
  * reference's Url::parse fallback, bangs.rs:173-175).
  *
  * This is a serving-tier pre-search hook: callers check
  * `bangs.hit(query)` BEFORE running the pipeline and redirect on
  * Some (the reference does the same in its api entrypoint). Tags
  * match case-sensitively on the raw whitespace terms of the query —
  * bang prefixes never survive the index tokenizers, so the check
  * must run on the raw string. */
object Bangs {

  final case class Bang(tag: String, url: String,
                        site: Option[String] = None,
                        domain: Option[String] = None,
                        category: Option[String] = None,
                        subCategory: Option[String] = None,
                        ranking: Option[Long] = None)

  final case class BangHit(bang: Bang, redirectTo: String)

  val BangPrefixes: Set[Char] = Set('!', '！')

  def apply(bangs: Seq[Bang]): Bangs =
    new Bangs(bangs.map(b => b.tag -> b).toMap)

  /** The public JSON table shape the reference loads (short field
    * names c/sc/d/r/s/t/u, bangs.rs:44-64). Later duplicates of a tag
    * win, like the reference's HashMap collect. */
  def fromJson(json: String): Bangs = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root != null && root.isArray, "bangs: expected a JSON array")
    val out = scala.collection.mutable.ArrayBuffer[Bang]()
    val it = root.elements()
    while (it.hasNext) {
      val n = it.next()
      def str(k: String): Option[String] =
        Option(n.get(k)).filterNot(_.isNull).map(_.asText())
      val tag = str("t").getOrElse(
        throw new IllegalArgumentException("bangs: entry without 't'"))
      val url = str("u").getOrElse(
        throw new IllegalArgumentException("bangs: entry without 'u'"))
      out += Bang(tag, url, site = str("s"), domain = str("d"),
        category = str("c"), subCategory = str("sc"),
        ranking = Option(n.get("r")).filterNot(_.isNull).map(_.asLong()))
    }
    apply(out.toSeq)
  }

  /** RFC 3986 percent-encoding of every byte outside the unreserved
    * set (the urlencoding crate's behavior: space => %20, never '+'). */
  def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
}

final class Bangs(table: Map[String, Bangs.Bang]) {
  import Bangs._

  def size: Int = table.size

  private def tagOf(term: String): Option[String] =
    if (term.length > 1 && BangPrefixes.contains(term.charAt(0)))
      Some(term.substring(1))
    else None

  /** bangs.rs Bangs::get over the raw query string. */
  def hit(query: String): Option[BangHit] = {
    val terms = query.split("\\s+").filter(_.nonEmpty).toSeq
    terms.iterator
      .flatMap(t => tagOf(t).flatMap(tag => table.get(tag).map(tag -> _)))
      .nextOption()
      .map { case (tag, bang) =>
        val rest = terms.filter(t => !tagOf(t).contains(tag)).mkString(" ")
        val url0 = bang.url.replace("{{{s}}}", percentEncode(rest))
        val url = if (url0.contains("://")) url0 else s"https://$url0"
        BangHit(bang, url)
      }
  }
}
