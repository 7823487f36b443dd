package graft.html

/** Outlink extraction from fetched page content — the frontier-growth
  * feed (SURVEY.md §2.7 "discovered URLs"; the reference crawls a fixed
  * seed list, `spider.py:518-545`, so the extraction RULE here is this
  * engine's own, kept deliberately simple and portable):
  *
  *   every `<a href="...">` whose href is an ABSOLUTE http/https URL,
  *   in document order, de-duplicated within the page.
  *
  * Relative links, fragments and `javascript:` hrefs are frontier-less
  * by design (the reference's canonicalizers never resolve relative
  * URLs either — `spider.py:45-60` operates on absolute URLs only).
  * Non-anchor tags (`link`/`img`/`script`/`iframe`) are assets, not
  * crawl targets. Runs on the DECODED fetched body — any successfully
  * fetched response feeds discovery, dead-page liveness screening
  * (parked/404 heuristics) gates SAMPLING, not link discovery.
  */
object LinkExtract {

  /** Minimal character-reference decode for href values: the five XML
    * named refs plus decimal/hex numeric refs — the forms that occur
    * inside URLs in practice (`&amp;` dominates; HTML serializers must
    * escape `&` in attribute values, so raw markup carries it encoded).
    * A full HTML5 named-entity table is deliberately out of scope;
    * unknown or malformed refs pass through verbatim. */
  def decodeRefs(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var emitted = false
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i + 1 && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val rep: String = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if body.length > 2 && (body.charAt(0) == '#') &&
                (body.charAt(1) == 'x' || body.charAt(1) == 'X') =>
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: RuntimeException => null }
            case _ if body.length > 1 && body.charAt(0) == '#' =>
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: RuntimeException => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1; emitted = true }
        }
      }
      if (!emitted) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** True when the href is absolute http(s), ASCII-case-insensitively
    * (URI schemes are case-insensitive, RFC 3986 §3.1). */
  private def isHttpAbs(h: String): Boolean =
    h.regionMatches(true, 0, "http://", 0, 7) ||
      h.regionMatches(true, 0, "https://", 0, 8)

  /** Lowercase the scheme so downstream dispatch (`startsWith("http")`)
    * and dedup treat `HTTP://h/x` and `http://h/x` as the same URL. */
  private def normScheme(u: String): String =
    if (u.startsWith("http://") || u.startsWith("https://")) u
    else {
      val ci = u.indexOf("://")
      graft.py.Py.lowerAscii(u.substring(0, ci)) + u.substring(ci)
    }

  def links(content: String): Vector[String] = {
    val tags = TagScanner.scan(content)
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      if (t.name == "a") t.getOpt("href") match {
        case Some(h0) =>
          // HTML attribute processing before the scheme test: strip
          // surrounding ASCII whitespace (the spec strips it from URL
          // attributes) and decode character references (the markup
          // form of '&' inside query strings is '&amp;')
          val h = decodeRefs(h0.trim)
          if (isHttpAbs(h)) {
            val u = normScheme(h)
            if (seen.add(u)) out += u
          }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }
}
