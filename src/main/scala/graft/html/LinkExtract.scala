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

  def links(content: String): Vector[String] = {
    val tags = TagScanner.scan(content)
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < tags.length) {
      val t = tags(i)
      if (t.name == "a") t.getOpt("href") match {
        case Some(h) if h.startsWith("http://") || h.startsWith("https://") =>
          if (seen.add(h)) out += h
        case _ => ()
      }
      i += 1
    }
    out.result()
  }
}
