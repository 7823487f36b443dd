package graft.crawl

import graft.html.TagScanner
import graft.py.Py

/** Page-liveness checks mirroring `DownloadHTTPFile.is_alive`
  * (`/root/reference/spider.py:292-377`): content-type screen (P1),
  * title heuristics (P2), status-code screen (P3). Pure row-local
  * functions — the engine runs them as a filter-before-extract, so dead
  * pages become error rows, never sample rows (ordering quirk preserved,
  * SURVEY.md §4.1).
  */
object Liveness {

  val dontDownloadErrCodes: Seq[Int] = Seq(403, 404, 500, 503) // spider.py:292

  /** spider.py:293 — lower-cased at the call site (:359). */
  val pageNotFoundStr: Seq[String] = Seq(
    "pila flag poles", "error | cort.as", "seite zur zeit nicht erreichbar",
    "temporarily unavailable", "ShrinkThisLink.com - Free link shrinker",
    "monequipemobfree.com",
    "Nom de domaine Gratuit avec Azote.org et SANS PUBLICITE", "ooops",
    "Warning! | There might be a problem with the requested link",
    "(This |)website (is|) (temporarily|currently) (unavailable|Not Available|suspended)",
    "(Website|site) Unavailable",
    "We're sorry! This account is currently unavailable | ROMARG",
    "this page is not available", "Suspend", "Short.URL", "Unauthorized Access")

  /** spider.py:294 — matched by substring containment on the raw title. */
  val pageNotFoundStrUtf8: Seq[String] = Seq(
    "这个网站可出售", "该网站正在出售",
    "가비아 호스팅 서비스:웹호스팅,웹메일 호스팅,쇼핑몰호스팅,단독서버,동영상호스팅",
    "무료호스팅", "Хостинг-Центр")

  /** Result: alive, or dead with the reference's `self.err` string. */
  final case class Verdict(alive: Boolean, err: String)
  val Alive: Verdict = Verdict(alive = true, "")

  /** P1 — content-type screen (spider.py:296-302). */
  def contentTypeCheck(contentType: Option[String]): Verdict = contentType match {
    case Some(ct) if ct.startsWith("image") || ct.startsWith("audio") =>
      Verdict(alive = false, s"not web page($ct)")
    case Some(ct) if ct.startsWith("application") && !ct.contains("xhtml+xml") =>
      Verdict(alive = false, s"not web page($ct)")
    case _ => Alive
  }

  // precompiled screens (pattern TEXT identical to the reference's
  // inline re.search calls): building the pattern string per call —
  // concat + a constant toLowerCase per pageNotFoundStr entry — cost
  // ~8 µs/row on the fetch hot path; each Guarded carries its
  // required-literal fast-reject (graft.py.Py.Guarded)
  private val errCodeScreens: Array[(Py.Guarded, String)] =
    dontDownloadErrCodes.map(code =>
      new Py.Guarded("^(.*\\d\\D+|\\D*)" + code + "(\\D+\\d.*|\\D*)$") -> code.toString).toArray
  private val suspendedScreen = new Py.Guarded("^.*suspended.*$")
  // reference pattern text VERBATIM (spider.py:345) — the '.' is an
  // unescaped metachar there, so it must stay one here
  private val linkbucksScreen = new Py.Guarded("^.*linkbucks.com - get your share!.*$")
  private val contactScreen = new Py.Guarded("^contact support$")
  private val notFoundScreen = new Py.Guarded("^(.* |.* can|.* could|)not(hing| be|) found.*$")
  private val phishingScreen = new Py.Guarded("^(.* |.*suspected |)phishing.*$")
  private val notFoundStrScreens: Array[(Py.Guarded, String)] =
    pageNotFoundStr.map(s =>
      new Py.Guarded("^.*" + Py.lowerAscii(s) + ".*$") -> s).toArray

  /** P2 — title heuristics over every extracted title text
    * (spider.py:336-369). `titles` = all `//title/text()` values.
    * Hot path (runs per fetched page): every screen is a precompiled
    * [[Py.Guarded]] whose required-literal guard rejects non-matching
    * titles with one `contains` instead of a regex. */
  def titleCheck(titles: Seq[String]): Verdict = {
    for (origin <- titles) {
      val title = origin
      val lower = Py.lowerAscii(title)
      for ((g, code) <- errCodeScreens)
        if (g.hit(title))
          return Verdict(alive = false, code)
      if (suspendedScreen.hit(lower))
        return Verdict(alive = false, "suspended")
      if (linkbucksScreen.hit(lower))
        return Verdict(alive = false, "suspended(linkbucks)")
      if (contactScreen.hit(lower))
        return Verdict(alive = false, "suspended")
      if (notFoundScreen.hit(lower))
        return Verdict(alive = false, "page not found")
      if (phishingScreen.hit(lower))
        return Verdict(alive = false, "suspend(suspected phishing)")
      for ((g, s) <- notFoundStrScreens)
        if (g.hit(lower))
          return Verdict(alive = false, s"page not found($s)")
      for (s <- pageNotFoundStrUtf8)
        if (origin.contains(s))
          return Verdict(alive = false, s"page not found($s)")
    }
    Alive
  }

  /** P3 — status-code screen (spider.py:371-375). */
  def statusCheck(status: Int): Verdict =
    if (dontDownloadErrCodes.contains(status)) Verdict(alive = false, status.toString)
    else Alive

  /** Full `is_alive` over decoded content: P1 → title extract → P2 → P3.
    * Title extraction = all `<title>` texts via [[TagScanner]] (the
    * lxml `//title/text()` analogue; empty titles yield no text node). */
  def isAlive(contentType: Option[String], content: String, status: Int): Verdict = {
    val p1 = contentTypeCheck(contentType)
    if (!p1.alive) return p1
    val titles = TagScanner.scan(content).filter(_.name == "title")
      .map(_.text).filter(_.nonEmpty)
    val p2 = titleCheck(titles)
    if (!p2.alive) return p2
    statusCheck(status)
  }
}
