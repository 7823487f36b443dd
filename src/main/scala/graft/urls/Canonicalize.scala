package graft.urls

import graft.py.Py

/** The reference's two distinct URL → domain-name canonicalizers.
  *
  * Both are load-bearing for byte-identical behavior and must NOT be
  * merged: the crawler version keeps `www.` and handles `@` before the
  * port cut; the extractor version returns "." for relative hrefs,
  * strips `www.`, and cuts the port BEFORE the userinfo. See SURVEY.md
  * §1.3.
  */
object Canonicalize {

  /** Crawler-side canonicalizer — `/root/reference/spider.py:45-60`.
    *
    * Order of operations: substring after `//` (Python `find` -1 quirk:
    * no `//` → drop first char), cut at first `/` else at `?`, drop
    * userinfo before `@` (find > -1), drop `:port` via rfind > -1.
    * Keeps a leading `www.`.
    */
  def crawlerDomain(url: String): String = {
    var d = Py.sliceFrom(url, url.indexOf("//") + 2)
    val escape = d.indexOf('/')
    if (escape > -1) d = Py.sliceTo(d, escape)
    else {
      val q = d.indexOf('?')
      if (q > -1) d = Py.sliceTo(d, q)
    }
    val at = d.indexOf('@')
    if (at > -1) d = Py.sliceFrom(d, at + 1)
    val colon = d.lastIndexOf(':')
    if (colon > -1) d = Py.sliceTo(d, colon)
    d
  }

  /** Extractor-side canonicalizer — `/root/reference/extractor/__init__.py:83-105`.
    *
    * Differences vs [[crawlerDomain]] (each deliberate, mirrored):
    *  - no `//` at all → returns "." (relative hrefs canonicalize to ".",
    *    excluded from external-domain counts at
    *    `extractors5/http_feature.py:323,376,406,447`);
    *  - path / query cut only when the separator index is `> 0`
    *    (a `/` at position 0 does NOT cut);
    *  - `:port` cut happens BEFORE the `@` userinfo strip, and both use
    *    `> 0` (position 0 does not trigger);
    *  - strips one leading `www.`.
    */
  def extractorDomain(url: String): String = {
    if (url.indexOf("//") < 0) return "."
    var d = Py.sliceFrom(url, url.indexOf("//") + 2)
    val escape = d.indexOf('/')
    val quest = d.indexOf('?')
    if (escape > 0) d = Py.sliceTo(d, escape)
    else if (quest > 0) d = Py.sliceTo(d, quest)
    val colon = d.lastIndexOf(':')
    if (colon > 0) d = Py.sliceTo(d, colon)
    val at = d.indexOf('@')
    if (at > 0) d = Py.sliceFrom(d, at + 1)
    if (d.startsWith("www.")) d.substring(4) else d
  }
}
