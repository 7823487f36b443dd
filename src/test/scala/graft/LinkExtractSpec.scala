package graft

import graft.html.LinkExtract
import org.scalatest.funsuite.AnyFunSuite

/** Href processing in outlink extraction: whitespace strip, character
  * references, scheme case (discovery feed — SURVEY.md §2.7). */
class LinkExtractSpec extends AnyFunSuite {

  test("absolute http(s) anchors in document order, page-deduped") {
    val html =
      """<a href="http://a.com/1">x</a><img src="http://a.com/i.png">
        |<a href="https://b.com/2">y</a><a href="/rel">r</a>
        |<a href="javascript:void(0)">j</a><a href="http://a.com/1">dup</a>""".stripMargin
    assert(LinkExtract.links(html) ==
      Vector("http://a.com/1", "https://b.com/2"))
  }

  test("hrefs are trimmed, charref-decoded, and scheme-case-normalized") {
    val html =
      """<a href=" http://h.com/x ">sp</a>
        |<a href="http://h.com/p?a=1&amp;b=2">amp</a>
        |<a href="HTTP://h.com/up">up</a>
        |<a href="http://h.com/n&#47;slash">num</a>
        |<a href="http://h.com/h&#x2F;hex">hex</a>
        |<a href="http://h.com/keep&nope;raw">unknown</a>""".stripMargin
    assert(LinkExtract.links(html) == Vector(
      "http://h.com/x",
      "http://h.com/p?a=1&b=2",
      "http://h.com/up",
      "http://h.com/n/slash",
      "http://h.com/h/hex",
      "http://h.com/keep&nope;raw"))
  }

  test("decodeRefs: malformed refs pass through; scheme variants dedup to one URL") {
    assert(LinkExtract.decodeRefs("a&b") == "a&b")
    assert(LinkExtract.decodeRefs("a&;b") == "a&;b")
    assert(LinkExtract.decodeRefs("x&#xZZ;y") == "x&#xZZ;y")
    assert(LinkExtract.decodeRefs("end&amp") == "end&amp") // no semicolon
    val html = """<a href="HTTP://h.com/x">1</a><a href="http://h.com/x">2</a>"""
    assert(LinkExtract.links(html) == Vector("http://h.com/x"))
  }
}
