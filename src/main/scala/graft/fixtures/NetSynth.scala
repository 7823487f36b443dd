package graft.fixtures

import graft.model.{HeaderHop, NetInfo}
import graft.urls.Canonicalize

/** Deterministic synthesis of everything the reference crawler obtains
  * from the network/subprocesses, as a pure function of the URL — the
  * sandbox stand-in for `spider.py:62-93` (nslookup/host/whois) and the
  * HTTP response chain (SURVEY.md §2.1 S4/S5: "deterministic synthesized
  * block text derived from the input row"). Both the fixture generator
  * (which writes the `text` golden into the pages table) and the engine
  * (which re-renders and must match byte-for-byte) call this one
  * function; the byte-identity test then covers the whole
  * render/split/extract pipeline.
  *
  * Output formats mirror the real tool output shapes the extractor
  * parsers consume (`extractors5/nslookup_feature.py:11-59`,
  * `host_feature.py:10-24`, `whois_feature.py:5-44`,
  * `header_feature.py:9-49`).
  */
object NetSynth {

  final case class Synth(net: NetInfo, content: String, contentType: String,
      status: Int, lang: String)

  private def mix64(z0: Long): Long = graft.ops.PortableHash.mix64(z0)

  /** Stable 64-bit hash of a URL (independent of JVM String.hashCode
    * width concerns — explicit fold + finalizer). */
  def urlSeed(url: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < url.length) { h = 31 * h + url.charAt(i); i += 1 }
    mix64(h)
  }

  private def pos(h: Long, mod: Int): Int = java.lang.Math.floorMod(h, mod.toLong).toInt

  /** Deterministic fetch outcome class of a URL: true = page absent
    * from the pages table (fetch miss → error row). md5-derived so the
    * pages-table row count is SQL-derivable in BOTH engines (the
    * `byte_identity` oracle): miss ⇔ first md5 hex digit is '0' and the
    * second is < '7' (P = 7/256 ≈ 1/37). */
  def isFetchMiss(url: String): Boolean = {
    val hx = graft.ops.PortableHash.md5Hex(url)
    hx.charAt(0) == '0' && hx.charAt(1) < '7'
  }

  /** The [[isFetchMiss]] rule as shared-dialect SQL over `urlCol`. */
  def fetchMissSql(urlCol: String): String =
    s"(substr(md5($urlCol), 1, 1) = '0' AND substr(md5($urlCol), 2, 1) < '7')"

  // ---- body outlinks (md5-derived so the DISCOVERED-URL set is
  // SQL-derivable in both engines — same portability trick as
  // isFetchMiss; the `crawl_discovery` oracle recomputes these rules in
  // DuckDB). Hex digit p (1-based) of md5(s), as an int in 0..15.
  private def md5Digit(s: String, p: Int): Int = {
    val c = graft.ops.PortableHash.md5Hex(s).charAt(p - 1)
    if (c <= '9') c - '0' else c - 'a' + 10
  }

  /** Extra `<a href>` count beyond the 2 baseline links (0..3). */
  def linkCount(url: String): Int = md5Digit(url, 1) % 4

  /** Link-kind selector for link i: 0 same-domain page, 1 external
    * host, 2 relative, 3 fragment, 4 javascript. */
  def linkKind(url: String, i: Int): Int = md5Digit(s"$url#a$i", 1) % 5

  /** External-host index for kind-1 links (0..6). */
  def linkExt(url: String, i: Int): Int = md5Digit(s"$url#a$i", 2) % 7

  // ---- asset-tag mixes (round-5: the A3/A4/A5 rate features must be
  // exercised at MULTIPLE operating points per URL population, not the
  // single constant the first body shape produced — round-4 verdict
  // "What's missing" #2). Each selector is an md5 digit of the URL
  // (digits 3-7; digits 1-2 are taken by linkCount/isFetchMiss), so the
  // html_features oracle can re-derive every branch in SQL exactly like
  // the <a>-kind histogram.

  /** Stylesheet `<link>` href kind: 0 external cdn host, 1 same-domain
    * absolute, 2 relative ('.'-domain). */
  def cssKind(url: String): Int = md5Digit(url, 3) % 3

  /** Icon `<link>` href kind: 0 external cdn host (SAME host as the
    * stylesheet's external branch — the rate feature is a max-per-
    * domain count, so two externals on one host read 2/2), 1 relative. */
  def iconKind(url: String): Int = md5Digit(url, 4) % 2

  /** First `<img>` src kind: 0 external img host, 1 relative. */
  def img1Kind(url: String): Int = md5Digit(url, 5) % 2

  /** Second `<img>` src kind: 0 relative, 1 external img host (same
    * host as img1's external branch). */
  def img2Kind(url: String): Int = md5Digit(url, 6) % 2

  /** `<script src>` kind: 0 external js host, 1 relative, 2 same-domain
    * absolute. */
  def scriptKind(url: String): Int = md5Digit(url, 7) % 3

  /** Hex digit `p` (1-based) of md5(urlCol) as an int 0..15, shared-
    * dialect SQL (DuckDB `instr` is 1-based, matching Spark). */
  def md5DigitSql(urlCol: String, p: Int): String =
    s"(instr('0123456789abcdef', substr(md5($urlCol), $p, 1)) - 1)"

  /** [[linkCount]]/[[linkKind]]/[[linkExt]] as shared-dialect SQL. */
  def linkCountSql(urlCol: String): String =
    s"((instr('0123456789abcdef', substr(md5($urlCol), 1, 1)) - 1) % 4)"
  def linkKindSql(urlCol: String, iCol: String): String =
    s"((instr('0123456789abcdef', substr(md5($urlCol || '#a' || cast($iCol as string)), 1, 1)) - 1) % 5)"
  def linkExtSql(urlCol: String, iCol: String): String =
    s"((instr('0123456789abcdef', substr(md5($urlCol || '#a' || cast($iCol as string)), 2, 1)) - 1) % 7)"

  // ---- DuckDB replica of [[urlSeed]] (oracle portability). The net
  // blocks' branch rules are pos(urlSeed(url), k) selections, so an
  // oracle over them must recompute the 64-bit seed in SQL: HUGEINT
  // mod-2^64 arithmetic for the multiplies (a 64×64 product splits into
  // 32-bit halves to stay inside HUGEINT), UBIGINT for the xor/logical-
  // shift steps (Java >>> ≡ UBIGINT >>). Validated char-exact against
  // the Scala fold for the full sf0.01 URL population (net_features).
  private val TwoPow64 = "18446744073709551616"

  /** `(a * b) % 2^64` for a HUGEINT expr `a` in [0, 2^64) and a 64-bit
    * unsigned constant `b`. */
  private def mulMod64Sql(a: String, b: BigInt): String = {
    val bHi = b >> 32
    val bLo = b & 0xffffffffL
    s"(($a * $bLo + (($a * $bHi) % 4294967296) * 4294967296) % $TwoPow64)"
  }

  /** CTE chain from a relation `u(url)` to `hseed(url, h)` where `h` is
    * the SIGNED [[urlSeed]] value as HUGEINT (range of a Java Long). */
  def urlSeedCtesSql: String = {
    val c1 = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    s"""hs0 AS (SELECT url, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |          list_transform(generate_series(1, length(url)), i -> CAST(unicode(substr(url, i, 1)) AS HUGEINT))),
       |          (a, c) -> (31*a + c) % $TwoPow64) AS f FROM u),
       |hs1 AS (SELECT url, CAST((f + $c1) % $TwoPow64 AS UBIGINT) AS z FROM hs0),
       |hs2 AS (SELECT url, CAST(xor(z, z >> 30) AS HUGEINT) AS z FROM hs1),
       |hs3 AS (SELECT url, CAST(${mulMod64Sql("z", c2)} AS UBIGINT) AS z FROM hs2),
       |hs4 AS (SELECT url, CAST(xor(z, z >> 27) AS HUGEINT) AS z FROM hs3),
       |hs5 AS (SELECT url, CAST(${mulMod64Sql("z", c3)} AS UBIGINT) AS z FROM hs4),
       |hs6 AS (SELECT url, xor(z, z >> 31) AS z FROM hs5),
       |hseed AS (SELECT url, CASE WHEN z >= 9223372036854775808
       |                           THEN CAST(z AS HUGEINT) - $TwoPow64
       |                           ELSE CAST(z AS HUGEINT) END AS h FROM hs6)""".stripMargin
  }

  /** `Math.floorMod(x, m)` over a (possibly negative) HUGEINT expr. */
  def floorModSql(x: String, m: Long): String = s"((($x) % $m + $m) % $m)"

  /** Java arithmetic `x >> k` over a signed HUGEINT expr: floor
    * division by 2^k (exact integer arithmetic, no doubles). */
  def asrSql(x: String, k: Int): String = {
    val p = 1L << k
    s"((($x) - ${floorModSql(x, p)}) // $p)"
  }

  /** Liveness of a synthesized page as SQL over the seed-hash bucket
    * `hm = floorMod(h, 100)`: every hm < 11 branch is dead (404/parked/
    * suspended titles 0-4, 404 status 5-7, pdf content-type 8, 503
    * status 9, image content-type 10) and every hm >= 11 page passes
    * all three liveness screens — the rule [[forUrlImpl]] encodes. */
  def liveSql(hmCol: String): String = s"($hmCol >= 11)"

  val langs: Vector[String] = Vector("en", "de", "fr", "es", "zh")

  /** The single hm → Content-Type rule (byte-identity-critical: the
    * engine's charset pick and the fixture's rendered header must agree). */
  private def contentTypeFor(hm: Int): String =
    if (hm == 8) "application/pdf"
    else if (hm == 10) "image/png"
    else "text/html; charset=utf-8"

  /** Content-type alone (cheap) — lets the engine pick the decode
    * charset before synthesizing the rest. */
  def contentTypeOf(url: String): String = contentTypeFor(pos(urlSeed(url), 100))

  def forUrl(url: String): Synth = forUrlImpl(url, None)

  /** Engine-path variant: skips building the synthetic page BODY
    * (the engine decodes the real `html` bytes instead — building the
    * body here was pure per-row allocation waste) but still needs the
    * decoded content's length for the Content-Length header the render
    * must reproduce byte-identically. `content` is null in the result. */
  def forUrlNoBody(url: String, contentLength: Int): Synth =
    forUrlImpl(url, Some(contentLength))

  private def forUrlImpl(url: String, lenOverride: Option[Int]): Synth = {
    val h = urlSeed(url)
    val domain = Canonicalize.crawlerDomain(url)
    val hm = pos(h, 100)

    // ---- status / content-type / title → liveness branch mix
    // (redirect hops live in `history` below; requests follows 3xx, so
    // the FINAL status is never a redirect)
    val finalStatus =
      if (hm >= 5 && hm < 8) 404
      else if (hm == 9) 503
      else 200
    val contentType = contentTypeFor(hm)
    val title =
      if (hm < 3) "404 Not Found"
      else if (hm == 3) "Account suspended"
      else if (hm == 4) "这个网站可出售"
      else s"Welcome to $domain page ${pos(h, 9)}"

    // ---- page body: exercises every extractor branch deterministically
    val content: String = if (lenOverride.isDefined) null else {
    val sb = new StringBuilder
    sb ++= "<html><head>\n"
    sb ++= s"<title>$title</title>\n"
    if (pos(h, 11) == 0)
      sb ++= "<meta http-equiv=\"refresh\" content=\"0; url=http://next.example.com/\">\n"
    if (pos(h, 31) == 0)
      sb ++= "<meta http-equiv=\"refresh\" content=\"0; url=data:text/html;base64,PGh0bWw+\">\n"
    val cssHref = cssKind(url) match {
      case 0 => s"http://cdn${pos(h, 5)}.example.net/s.css"
      case 1 => s"http://$domain/s.css"
      case _ => "/s.css"
    }
    sb ++= s"""<link rel="stylesheet" href="$cssHref">\n"""
    val iconHref =
      if (iconKind(url) == 0) s"http://cdn${pos(h, 5)}.example.net/f.ico"
      else "/favicon.ico"
    sb ++= s"""<link rel="icon" href="$iconHref">\n"""
    sb ++= "<style>\nbody { color: black; }\n.hidden { display: none; }\n</style>\n"
    sb ++= "</head><body>\n"
    if (pos(h, 7) == 0) sb ++= "<iframe src=\"http://frames.example.net/ad\"></iframe>\n"
    if (pos(h, 5) == 0) {
      sb ++= s"""<form id="login${pos(h, 4)}" action="http://$domain/login" method="post">\n"""
      sb ++= "<input type=\"text\" name=\"user\">\n<input type=\"submit\" value=\"Go\">\n"
      sb ++= "<button type=\"submit\">Send</button>\n</form>\n"
    }
    var i = 0
    val nLinks = 2 + linkCount(url)
    while (i < nLinks) {
      val href = linkKind(url, i) match {
        case 0 => s"http://$domain/page$i.html"
        case 1 => s"http://ext${linkExt(url, i)}.example.org/x$i"
        case 2 => s"/relative/$i"
        case 3 => "#"
        case _ => "javascript:void(0);"
      }
      sb ++= s"""<a href="$href">link $i</a>\n"""
      i += 1
    }
    val img1Src =
      if (img1Kind(url) == 0) s"http://img.example.net/i${pos(h, 6)}.gif"
      else s"pic${pos(h, 6)}.png"
    sb ++= s"""<img src="$img1Src">\n"""
    val img2Src =
      if (img2Kind(url) == 0) s"local${pos(h, 3)}.png"
      else s"http://img.example.net/j${pos(h, 3)}.gif"
    sb ++= s"""<img src="$img2Src">\n"""
    sb ++= "<!-- a comment-only line -->\n"
    val scriptSrc = scriptKind(url) match {
      case 0 => s"http://js.example.net/lib${pos(h, 4)}.js"
      case 1 => s"/js/lib${pos(h, 4)}.js"
      case _ => s"http://$domain/lib${pos(h, 4)}.js"
    }
    sb ++= s"""<script src="$scriptSrc"></script>\n"""
    sb ++= "<script>\n"
    if (pos(h, 5) == 0)
      sb ++= s"var f = document.getElementById(\"login${pos(h, 4)}\");\n"
    if (pos(h, 6) == 0) sb ++= "document.write('<form name=\"x\">');\n"
    sb ++= "var t = 1;\n</script>\n"
    sb ++= "</body></html>\n"
    sb.result()
    }
    val contentLen = lenOverride.getOrElse(content.length)

    // ---- DNS / host / whois stdout
    val serialKind = pos(h, 4)
    val serial = serialKind match {
      case 0 =>
        val y = 2010 + pos(h, 8); val mo = 1 + pos(h >> 8, 12); val d = 1 + pos(h >> 16, 28)
        f"$y%04d$mo%02d$d%02d${pos(h >> 24, 100)}%02d"
      case 1 => (1200000000L + java.lang.Math.floorMod(h, 200000000L)).toString
      case 2 => "" // no serial row
      case _ => "deadbeef"
    }
    val soaSb = new StringBuilder
    soaSb ++= "Server:\t\t8.8.8.8\nAddress:\t8.8.8.8#53\n\nNon-authoritative answer:\n"
    soaSb ++= s"$domain\n\torigin = ns1.$domain\n\tmail addr = hostmaster.$domain\n"
    if (serial.nonEmpty) soaSb ++= s"\tserial = $serial\n"
    soaSb ++= "\trefresh = 3600\n"
    val nsSb = new StringBuilder
    nsSb ++= "Server:\t\t8.8.8.8\nAddress:\t8.8.8.8#53\n\nNon-authoritative answer:\n"
    if (pos(h, 3) == 0) nsSb ++= s"www.$domain canonical name = $domain.\n"
    nsSb ++= s"Name:\t$domain\nAddress: 93.184.${pos(h, 250)}.${pos(h >> 12, 250)}\n"

    val hostOut = {
      val b = new StringBuilder
      b ++= s"$domain has address 93.184.${pos(h, 250)}.${pos(h >> 12, 250)}"
      if (pos(h, 2) == 0) b ++= s"\n$domain has address 93.184.${pos(h >> 4, 250)}.${pos(h >> 20, 250)}"
      if (pos(h, 6) < 2) b ++= s"\n$domain has IPv6 address 2606:2800:220:1:248:1893:25c8:${pos(h, 9999)}"
      b.result()
    }
    val whoisOut =
      if (pos(h, 5) == 0) s"No match for domain \"${domain.toUpperCase}\".\n>>> Last update of whois database <<<"
      else s"Domain Name: ${domain.toUpperCase}\nRegistrar: Example Registrar, Inc.\nCreation Date: 201${pos(h, 9)}-0${1 + pos(h >> 3, 8)}-15T00:00:00Z"

    // ---- response chain
    val baseHeaders = Vector(
      "Content-Type" -> contentType,
      "Server" -> s"nginx/1.${pos(h, 20)}",
      "Content-Length" -> contentLen.toString)
    val finalHop = HeaderHop(url, 11, finalStatus,
      if (finalStatus == 200) "OK" else if (finalStatus == 404) "Not Found" else "Service Unavailable",
      baseHeaders)
    val history: Seq[HeaderHop] =
      if (pos(h, 26) == 0)
        // redirect cycle: the final URL appears twice in history
        Seq(HeaderHop(url, 11, 301, "Moved Permanently", Vector("Location" -> url)),
            HeaderHop(url, 11, 301, "Moved Permanently", Vector("Location" -> url)))
      else if (pos(h, 13) == 0)
        Seq(HeaderHop(s"http://old.$domain/", 11, 301, "Moved Permanently",
          Vector("Location" -> url)))
      else Seq.empty

    val timer = java.lang.Math.floorMod(h, 100000L) / 1000.0
    val net = NetInfo(soaSb.result(), nsSb.result(), hostOut, whoisOut,
      finalHop, history, timer)
    Synth(net, content, contentType, finalStatus, langs(pos(h, langs.size)))
  }
}
