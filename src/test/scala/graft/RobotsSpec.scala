package graft

import graft.frontier.{Politeness, Robots}
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parser/matcher semantics (RFC 9309 conventions) + the
  * deterministic fixture synthesis used by the crawl engine. */
class RobotsSpec extends AnyFunSuite {

  test("group selection: exact agent group beats *, case-insensitive") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: GraftBot
        |Disallow: /private/
        |Crawl-delay: 2
        |""".stripMargin
    val r = Robots.parse(txt, "graftbot")
    assert(r.isAllowed("/index.html"))
    assert(!r.isAllowed("/private/x"))
    assert(r.crawlDelayMs.contains(2000L))
    val star = Robots.parse(txt, "otherbot")
    assert(!star.isAllowed("/index.html")) // * disallows everything
  }

  test("longest-prefix wins; Allow wins length ties; default allow") {
    val txt =
      """User-agent: *
        |Disallow: /a/
        |Allow: /a/public/
        |Allow: /b/
        |Disallow: /b/
        |""".stripMargin
    val r = Robots.parse(txt, "graftbot")
    assert(!r.isAllowed("/a/secret"))
    assert(r.isAllowed("/a/public/ok"))
    assert(r.isAllowed("/b/tie"))       // equal length → Allow wins
    assert(r.isAllowed("/c/anything"))  // no rule → allow
  }

  test("multiple agent lines share a group; empty Disallow is a no-op; comments stripped") {
    val txt =
      """User-agent: a
        |User-agent: graftbot
        |Disallow:    # empty value
        |Disallow: /x  # trailing comment
        |Sitemap: http://example.com/sitemap.xml
        |
        |User-agent: b
        |Disallow: /
        |""".stripMargin
    val r = Robots.parse(txt, "graftbot")
    assert(!r.isAllowed("/x/y"))
    assert(r.isAllowed("/z"))
  }

  test("a User-agent line after rules starts a NEW group") {
    val txt =
      """User-agent: graftbot
        |Disallow: /one
        |User-agent: other
        |Disallow: /two
        |""".stripMargin
    val r = Robots.parse(txt, "graftbot")
    assert(!r.isAllowed("/one/x"))
    assert(r.isAllowed("/two/x"))
  }

  test("pathOf: authority stripped, query kept, no-path → /") {
    assert(Robots.pathOf("http://user@h.com:8080/p/3?q=1") == "/p/3?q=1")
    assert(Robots.pathOf("https://h.com") == "/")
    assert(Robots.pathOf("relative/x") == "/")
    // query with NO path: RFC 9309 matches path-plus-query, so a rule
    // like `Disallow: /?q` must see "/?q=1", not a bare "/"
    assert(Robots.pathOf("http://h.com?q=1") == "/?q=1")
    assert(Robots.pathOf("http://h.com:8080?q=1") == "/?q=1")
  }

  test("fixture synth: crawl-delay equals the Politeness formula; deny rule = len%3") {
    for (host <- Seq("dup.example.com", "hot0.example.com", "www.h5.example.com", "93.184.216.4")) {
      val r = Robots.parse(Robots.synthTxt(host))
      assert(r.crawlDelayMs.contains(Politeness.delayMs(host)), host)
      val denies3 = !r.isAllowed("/p/31")
      assert(denies3 == (host.length % 3 == 0), host)
      assert(r.isAllowed("/p/41"), host) // only the /p/3 prefix is denied
    }
  }

  test("non-group records (Sitemap) do not break user-agent adjacency (RFC 9309)") {
    val txt =
      """User-agent: graftbot
        |Sitemap: http://h.com/sitemap.xml
        |User-agent: other
        |Disallow: /x
        |""".stripMargin
    // graftbot and other are ADJACENT agent lines (the sitemap record is
    // not a group rule), so the Disallow applies to both
    assert(!Robots.parse(txt, "graftbot").isAllowed("/x/1"))
    // …while a rule line DOES close the run: graftbot keeps only its own
    val txt2 =
      """User-agent: graftbot
        |Disallow: /a
        |User-agent: other
        |Disallow: /b
        |""".stripMargin
    val r2 = Robots.parse(txt2, "graftbot")
    assert(!r2.isAllowed("/a/1") && r2.isAllowed("/b/1"))
  }

  test("property sweep: a denied prefix denies every extension of it") {
    val rules = Robots.Rules(Vector(Robots.Rule(allow = false, "/p/3")), None)
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 200) {
      val suffix = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      assert(!rules.isAllowed("/p/3" + suffix))
    }
  }

  test("RFC 9309 §2.2.3 wildcards: * spans octets, trailing $ anchors the end") {
    def rules(v: String) = Robots.Rules(Vector(Robots.Rule(allow = false, v)), None)
    // '*' anywhere
    assert(!rules("/search*").isAllowed("/search?q=x"))
    assert(!rules("/*.pdf").isAllowed("/docs/a.pdf"))
    assert(!rules("/*.pdf").isAllowed("/docs/a.pdfx")) // unanchored: prefix-ish
    assert(rules("/*.pdf").isAllowed("/docs/a.txt"))
    assert(!rules("/a*b*c").isAllowed("/a-x-b-y-c-z"))
    assert(rules("/a*b*c").isAllowed("/a-x-c"))
    // trailing '$'
    assert(!rules("/*.pdf$").isAllowed("/docs/a.pdf"))
    assert(rules("/*.pdf$").isAllowed("/docs/a.pdfx"))
    assert(!rules("/exact$").isAllowed("/exact"))
    assert(rules("/exact$").isAllowed("/exact/sub"))
    // Allow with a longer wildcard pattern overrides a broad Disallow
    val mixed = Robots.Rules(Vector(
      Robots.Rule(allow = false, "/pub"),
      Robots.Rule(allow = true, "/public*")), None)
    assert(mixed.isAllowed("/public/x") && !mixed.isAllowed("/pub/x"))
  }

  test("RFC 9309 group selection: an EMPTY matching exact group wins over *") {
    // NB: agent lines separated only by blank lines MERGE into one group
    // (RFC 9309 ABNF / Google parser), so the truly-empty exact group is
    // the trailing header at EOF — the shape this test pins down
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |""".stripMargin
    // the graftbot group exists (and is empty) → everything allowed;
    // the star group's Disallow must NOT apply
    assert(Robots.parse(txt, "graftbot").isAllowed("/anything"))
    assert(!Robots.parse(txt, "otherbot").isAllowed("/anything"))
    // …and blank-line-separated agent headers DO merge into one group
    val merged =
      """User-agent: graftbot
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(!Robots.parse(merged, "graftbot").isAllowed("/x"))
  }

  test("pathOf strips the fragment (RFC 9309 matches path-plus-query only)") {
    assert(Robots.pathOf("http://h/p/3#top") == "/p/3")
    assert(Robots.pathOf("http://h/p?q=1#f") == "/p?q=1")
    assert(Robots.pathOf("http://h#frag") == "/")
    assert(Robots.pathOf("http://h?q=1#f") == "/?q=1")
    // a $-anchored rule must match a fragment-bearing URL
    val r = Robots.parse("User-agent: *\nDisallow: /p/3$\n")
    assert(!r.isAllowed(Robots.pathOf("http://h/p/3#top")))
    assert(r.isAllowed(Robots.pathOf("http://h/p/34")))
  }
}
