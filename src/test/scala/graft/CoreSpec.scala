package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.py.Py
import graft.urls.Canonicalize
import graft.parse.{Blocks, SampleRender}
import graft.model.{HeaderHop, NetInfo}

/** Pure-core parity tests. Golden values were cross-generated with
  * Python 2.7.18 (stdlib only) from the documented reference semantics
  * (SURVEY.md §1.3, §2.2 P8, TIMER format) — see the per-case comments.
  */
class CanonicalizeSpec extends AnyFunSuite {

  val crawlerGolden = Seq(
    "http://example.com/path/x" -> "example.com",
    "https://www.example.com/" -> "www.example.com",
    "http://example.com" -> "example.com",
    "http://example.com?q=1" -> "example.com",
    "http://user@example.com:8080/x" -> "example.com",
    "http://user@example.com:8080" -> "example.com",
    "http://example.com:8080?q=1" -> "example.com",
    "ftp://host/file.txt" -> "host",
    "relative/path" -> "elative", // find('//')==-1 → url[1:] quirk
    "/rooted/path" -> "rooted",
    "?query" -> "query",
    "#frag" -> "frag",
    "" -> "",
    "http://1.2.3.4/x" -> "1.2.3.4",
    "http://1.2.3.4" -> "1.2.3.4",
    "http://@host/x" -> "host",
    "http:///pathatzero" -> "",
    "http://:8080/x" -> "",
    "http://h/@a:b" -> "h",
    "http://example.com/a?b@c" -> "example.com",
    "http://example.com\n" -> "example.com\n", // no path → newline kept
    "http://www.ex.com:443\n" -> "www.ex.com",
    "//proto-rel/x" -> "proto-rel",
    "javascript:void(0)" -> "avascript",
    "http://a.b.c.d.e/f" -> "a.b.c.d.e",
    "mailto:x@y.z" -> "y.z",
    "http://h?x@y" -> "h",
    "http://h/p:q" -> "h",
    "http://[::1]:8080/x" -> "[::1]")

  val extractorGolden = Seq(
    "http://example.com/path/x" -> "example.com",
    "https://www.example.com/" -> "example.com", // strips www.
    "http://example.com" -> "example.com",
    "http://example.com?q=1" -> "example.com",
    "http://user@example.com:8080/x" -> "example.com",
    "http://user@example.com:8080" -> "example.com",
    "http://example.com:8080?q=1" -> "example.com",
    "ftp://host/file.txt" -> "host",
    "relative/path" -> ".", // no '//' → '.'
    "/rooted/path" -> ".",
    "?query" -> ".",
    "#frag" -> ".",
    "" -> ".",
    "http://1.2.3.4/x" -> "1.2.3.4",
    "http://1.2.3.4" -> "1.2.3.4",
    "http://@host/x" -> "@host", // '@' at pos 0 not stripped (>0 quirk)
    "http:///pathatzero" -> "/pathatzero", // '/' at pos 0 doesn't cut
    "http://:8080/x" -> ":8080",
    "http://h/@a:b" -> "h",
    "http://example.com/a?b@c" -> "example.com",
    "http://example.com\n" -> "example.com\n",
    "http://www.ex.com:443\n" -> "ex.com",
    "//proto-rel/x" -> "proto-rel",
    "javascript:void(0)" -> ".",
    "http://a.b.c.d.e/f" -> "a.b.c.d.e",
    "mailto:x@y.z" -> ".",
    "http://h?x@y" -> "h",
    "http://h/p:q" -> "h",
    "http://[::1]:8080/x" -> "[::1]")

  test("crawler domain matches Python2 golden") {
    for ((u, want) <- crawlerGolden)
      assert(Canonicalize.crawlerDomain(u) == want, s"url=<$u>")
  }

  test("extractor domain matches Python2 golden") {
    for ((u, want) <- extractorGolden)
      assert(Canonicalize.extractorDomain(u) == want, s"url=<$u>")
  }
}

class PyHelperSpec extends AnyFunSuite {
  // [input repr, python2 str(float)] golden pairs
  val floatGolden = Seq(
    0.25 -> "0.25", 1.5 -> "1.5", 0.1 -> "0.1",
    1.0 / 3.0 -> "0.333333333333", 123456.789 -> "123456.789",
    1e-05 -> "1e-05", 1.23e-07 -> "1.23e-07", 0.0 -> "0.0",
    2.0 -> "2.0", 1234567890123.0 -> "1.23456789012e+12",
    0.123456789012345 -> "0.123456789012", 3.14159265358979 -> "3.14159265359",
    1e16 -> "1e+16", 1e15 -> "1e+15", 604800.0 -> "604800.0",
    7.62939453125e-06 -> "7.62939453125e-06")

  test("str12g matches Python2 str(float)") {
    for ((d, want) <- floatGolden) assert(Py.str12g(d) == want, s"d=$d")
  }

  test("readLines keeps terminators") {
    assert(Py.readLines("a\nb\nc") == Vector("a\n", "b\n", "c"))
    assert(Py.readLines("a\nb\n") == Vector("a\n", "b\n"))
    assert(Py.readLines("") == Vector())
  }

  test("pyMatch mirrors re.match: anchored start, $ before final newline") {
    assert(Py.pyMatch("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$", "1.2.3.4\n"))
    assert(!Py.pyMatch("^\\d+$", "x12"))
    assert(Py.pyMatch("^\\d+", "12x")) // prefix match suffices
    assert(!Py.pyMatch("^\\d+$", "12x"))
  }

  test("pySplit keeps trailing empties") {
    assert(Py.pySplit("a.b.", ".").toSeq == Seq("a", "b", ""))
    assert("a.b.".split("\\.", -1).toSeq == Seq("a", "b", ""))
  }

  test("strip/rstrip are Python2 byte-str: ASCII string.whitespace only") {
    assert(Py.strip(" \t\f\r\nx\n ") == "x")
    assert(Py.strip("\u000Bx") == "x") // VT is in string.whitespace
    // NOT stripped by byte-str strip: FS..US controls, NEL, NBSP, LS/PS,
    // unicode spaces (multi-byte in utf-8, no ASCII-whitespace byte)
    for (c <- "\u001C\u001F\u0085\u00A0\u2000\u2028\u2029\u3000") {
      assert(Py.strip(s"${c}x$c") == s"${c}x$c", f"U+${c.toInt}%04X")
      assert(Py.rstrip(s"x$c") == s"x$c", f"U+${c.toInt}%04X")
    }
    assert(Py.rstrip("x \t\n") == "x")
  }

  test("stripUni is CPython2 unicode.strip: Py_UNICODE_ISSPACE") {
    // every char of the documented set strips
    for (c <- Py.uniWhitespace) {
      assert(Py.stripUni(s"${c}x$c") == "x", f"U+${c.toInt}%04X")
      assert(Py.isUniWs(c), f"U+${c.toInt}%04X")
    }
    // the chars Java Character.isWhitespace misses: NEL, NBSP,
    // MONGOLIAN VOWEL SEP, FIGURE SPACE, NARROW NBSP
    for (c <- "\u0085\u00A0\u180E\u2007\u202F") {
      assert(!Character.isWhitespace(c), f"U+${c.toInt}%04X")
      assert(Py.stripUni(s"${c}title$c") == "title", f"U+${c.toInt}%04X")
    }
    // ZWSP / BOM are not whitespace in CPython 2.7 (Unicode 5.2)
    assert(Py.stripUni("\u200Bx\uFEFF") == "\u200Bx\uFEFF")
  }

  test("pyFloat/pyInt mirror Python2 numeric parsing") {
    assert(Py.pyFloatOption(" 0.25 \n").contains(0.25))
    assert(Py.pyFloatOption("1e3").contains(1000.0))
    assert(Py.pyFloatOption(".5").contains(0.5))
    assert(Py.pyFloatOption("5.").contains(5.0))
    assert(Py.pyFloatOption("-INF").contains(Double.NegativeInfinity))
    assert(Py.pyFloatOption("Infinity").contains(Double.PositiveInfinity))
    assert(Py.pyFloatOption("nan").exists(_.isNaN))
    for (bad <- Seq("5f", "1.5d", "0x1.8p1", "", " ", "1e", "e5", "--1", "1_000"))
      assert(Py.pyFloatOption(bad).isEmpty, bad)
    assert(Py.pyIntOption(" 301 ").contains(301))
    assert(Py.pyIntOption("+3").contains(3))
    assert(Py.pyIntOption("-3").contains(-3))
    for (bad <- Seq("3.0", "3015x", "", "0x10", "three"))
      assert(Py.pyIntOption(bad).isEmpty, bad)
  }

  test("lowerAscii folds A-Z only (Python2 byte-str lower)") {
    assert(Py.lowerAscii("Not FOUND 404!") == "not found 404!")
    // non-ASCII cased letters untouched (utf-8 bytes have no A-Z byte)
    assert(Py.lowerAscii("\u00C4BC \u0130 \u0141") == "\u00C4bc \u0130 \u0141")
    val same = "already lower 123"
    assert(Py.lowerAscii(same) eq same) // no-fold fast path returns s itself
  }

  test("lowerUni is the simple 1:1 mapping (CPython2 unicode.lower)") {
    assert(Py.lowerUni("PayPal \u00C4 \u0141") == "paypal \u00E4 \u0142")
    // U+0130: simple mapping -> 'i' (one char); Java String.toLowerCase
    // FULL mapping gives "i\u0307" (two chars) — the CPython2 divergence
    assert(Py.lowerUni("\u0130") == "i")
    assert("\u0130".toLowerCase(java.util.Locale.ROOT) == "i\u0307")
    val same = "no cased chars \u4E2D\u6587"
    assert(Py.lowerUni(same) eq same)
  }

  test("pySplitWs keeps leading non-ws control chars in the first token") {
    assert(Py.pySplitWs("  a  b ").toSeq == Seq("a", "b"))
    assert(Py.pySplitWs("a b").toSeq == Seq("a", "b"))
    assert(Py.pySplitWs("").toSeq == Seq())
    // '\x1ca b'.split() in python2 keeps the FS byte in the first
    // token — a trim() pre-pass would eat it (trim strips <= 0x20)
    assert(Py.pySplitWs("\u001Ca b").toSeq == Seq("\u001Ca", "b"))
  }
}

class BlocksSpec extends AnyFunSuite {
  private def lines(text: String) = Py.readLines(text)

  test("basic split") {
    val text = "http://u/\n\n<=NSLOOKUP BEGIN=>\nns line 1\nns line 2\n<=NSLOOKUP END=>\n\n<=HOST BEGIN=>\nh has address 1.2.3.4\n<=HOST END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.url == "http://u/\n")
    assert(b.blocks("nslookup") == Vector("ns line 1\nns line 2\n"))
    assert(b.blocks("host") == Vector("h has address 1.2.3.4\n"))
  }

  test("repeated blocks accumulate in order") {
    val text = "http://u/\n\n<=HTTP BEGIN=>\nA\nB\n<=HTTP END=>\n\n<=HTTP BEGIN=>\nC\n<=HTTP END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks("http") == Vector("A\nB\n", "C\n"))
  }

  test("sentinel strip is byte-str: U+2028-suffixed sentinel stays content") {
    // python2 strips the file's BYTES: '<=X END=>' + utf-8 LS bytes does
    // not rstrip to the sentinel, so the line is block content — a
    // Character.isWhitespace strip would wrongly close the block here
    val text = "http://u/\n\n<=HTTP BEGIN=>\nA\n<=HTTP END=>\u2028\n<=HTTP END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks("http") == Vector("A\n<=HTTP END=>\u2028\n"))
    assert(Blocks.splitText(text).blocks == b.blocks)
    // plain ASCII-whitespace padding still strips
    val t2 = "http://u/\n\n<=HTTP BEGIN=>\nA\n  <=HTTP END=>\t \n"
    assert(Blocks.split(lines(t2)).blocks("http") == Vector("A\n"))
  }

  test("nested sentinel swallows enclosing block and everything after (quirk)") {
    val text = "http://u/\n\n<=HTTP BEGIN=>\nA\n<=INNER BEGIN=>\nX\n<=INNER END=>\nB\n<=HTTP END=>\n\n<=TIMER BEGIN=>\n0.5\n\n<=TIMER END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks.isEmpty) // python2 golden: only 'url' key remains
  }

  test("FIRST-begin NSLOOKUPSUMMARY still closes its depth (substitute)") {
    // class_type is still the initial value at the first END — the
    // reference crashes on class_type.lower(); the documented
    // substitute skips the block AND closes the depth, so later
    // blocks survive regardless of the summary block's position
    val text = "http://u/\n\n<=NSLOOKUPSUMMARY BEGIN=>\nsum\n<=NSLOOKUPSUMMARY END=>\n\n<=HTTP BEGIN=>\nhh\n<=HTTP END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks("http") == Vector("hh\n"))
    assert(Blocks.splitText(text).blocks == b.blocks)
  }

  test("nested NSLOOKUPSUMMARY poisons enclosing block (quirk)") {
    val text = "http://u/\n\n<=NSLOOKUP BEGIN=>\nns1\n<=NSLOOKUPSUMMARY BEGIN=>\nsum\n<=NSLOOKUPSUMMARY END=>\nns2\n<=NSLOOKUP END=>\n\n<=HTTP BEGIN=>\nhh\n<=HTTP END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks.isEmpty)
  }

  test("cycling warning keys as 'cycling'") {
    val text = "http://u/\n\n<=CYCLING REDIRECT WARNING BEGIN=>\nCycle Redirect times:\nhttp://a:2\n\n<=CYCLING REDIRECT WARNING END=>\n\n<=HTTP BEGIN=>\nZ\n<=HTTP END=>\n"
    val b = Blocks.split(lines(text))
    assert(b.blocks("cycling") == Vector("Cycle Redirect times:\nhttp://a:2\n\n"))
    assert(b.blocks("http") == Vector("Z\n"))
  }
}

class SampleRenderSpec extends AnyFunSuite {
  private val hop = HeaderHop("http://e.com/", 11, 200, "OK",
    Seq("Content-Type" -> "text/html; charset=utf-8", "Server" -> "nginx"))
  private val net = NetInfo(
    nslookupSoaOut = "Server:\t\t8.8.8.8\nAddress:\t8.8.8.8#53\n\ne.com\n\torigin = ns1.e.com\n\tserial = 2024010101",
    nslookupOut = "Server:\t\t8.8.8.8\nAddress:\t8.8.8.8#53\n\nName:\te.com\nAddress: 1.2.3.4",
    hostOut = "e.com has address 1.2.3.4",
    whoisOut = "Domain Name: E.COM\nRegistrar: Example",
    finalHop = hop, history = Nil, timerSeconds = 0.25)

  test("render block order and sentinels, byte-exact") {
    val text = SampleRender.render("http://e.com/", "<html><title>T</title></html>", net)
    val expected =
      "http://e.com/\n" +
      "\n<=NSLOOKUP BEGIN=>\n" + net.nslookupSoaOut + "\n" + net.nslookupOut + "\n<=NSLOOKUP END=>\n" +
      "\n<=HOST BEGIN=>\n" + net.hostOut + "\n<=HOST END=>\n" +
      "\n<=WHOIS BEGIN=>\n" + net.whoisOut + "\n<=WHOIS END=>\n" +
      "\n<=HEADER BEGIN=>\nHTTP/1.1 200 OK\nContent-Type: text/html; charset=utf-8\nServer: nginx\n\n<=HEADER END=>\n" +
      "\n<=HTTP BEGIN=>\n<html><title>T</title></html>\n<=HTTP END=>\n" +
      "\n<=TIMER BEGIN=>\n0.25\n\n<=TIMER END=>\n"
    assert(text == expected)
  }

  test("render → split round-trips block contents") {
    val content = "<html>\n<title>Hello</title>\n</html>"
    val text = SampleRender.render("http://e.com/", content, net)
    val b = Blocks.splitText(text)
    assert(b.url == "http://e.com/\n")
    assert(b.blocks("http") == Vector(content + "\n"))
    assert(b.blocks("timer") == Vector("0.25\n\n"))
    assert(b.blocks("header").head.startsWith("HTTP/1.1 200 OK\n"))
    assert(b.blocks("nslookup") == Vector(net.nslookupSoaOut + "\n" + net.nslookupOut + "\n"))
  }

  test("redirect history re-walk writes one HEADER+HTTP per hop") {
    val h1 = HeaderHop("http://r1/", 11, 301, "Moved Permanently", Seq("Location" -> "http://r2/"))
    val h2 = HeaderHop("http://r2/", 11, 302, "Found", Seq("Location" -> "http://e.com/"))
    val n2 = net.copy(history = Seq(h1, h2))
    val text = SampleRender.render("http://r1/", "C", n2)
    val b = Blocks.splitText(text)
    assert(b.blocks("http") == Vector("C\n", "C\n", "C\n")) // main content re-written per hop (quirk)
    assert(b.blocks("header").size == 3)
    assert(!text.contains("CYCLING")) // 3 distinct urls: no cycle
  }

  test("redirect cycle detected and budget truncates the re-walk") {
    // final url http://a/ with history [a, a] → a visited 3× → cycle
    val ha = HeaderHop("http://a/", 11, 302, "Found", Seq("Location" -> "http://a/"))
    val n3 = net.copy(finalHop = ha, history = Seq(ha, ha))
    val text = SampleRender.render("http://a/", "C", n3)
    assert(text.contains("<=CYCLING REDIRECT WARNING BEGIN=>\nCycle Redirect times:\nhttp://a/:2\n"))
    val b = Blocks.splitText(text)
    // budget for http://a/ = 2 → both history hops written, then final
    assert(b.blocks("header").size == 3)
  }
}
