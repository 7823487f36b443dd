package graft

import graft.crawl.Liveness
import graft.parse.CharsetDecode
import org.scalatest.funsuite.AnyFunSuite

class LivenessSpec extends AnyFunSuite {

  test("content-type screen (P1, spider.py:296-302)") {
    assert(!Liveness.contentTypeCheck(Some("image/png")).alive)
    assert(!Liveness.contentTypeCheck(Some("audio/mpeg")).alive)
    assert(!Liveness.contentTypeCheck(Some("application/pdf")).alive)
    assert(Liveness.contentTypeCheck(Some("application/xhtml+xml; charset=utf-8")).alive)
    assert(Liveness.contentTypeCheck(Some("text/html")).alive)
    assert(Liveness.contentTypeCheck(None).alive)
  }

  test("title heuristics (P2, spider.py:336-369)") {
    assert(Liveness.titleCheck(Seq("404 Not Found")).err == "404")
    assert(Liveness.titleCheck(Seq("Error 503 Service Unavailable")).err == "503")
    assert(Liveness.titleCheck(Seq("Account Suspended")).err == "suspended")
    assert(Liveness.titleCheck(Seq("Contact Support")).err == "suspended")
    assert(Liveness.titleCheck(Seq("page could not be found")).err == "page not found")
    assert(Liveness.titleCheck(Seq("Suspected Phishing Site")).err == "suspend(suspected phishing)")
    assert(Liveness.titleCheck(Seq("这个网站可出售啦")).err.startsWith("page not found("))
    assert(Liveness.titleCheck(Seq("Welcome to example dot com")).alive)
    // error-code regex needs non-digit separation: 40404 is NOT a 404 title
    assert(Liveness.titleCheck(Seq("item 40404 overview")).alive)
  }

  test("status screen (P3) and full is_alive composition") {
    assert(Liveness.statusCheck(404).err == "404")
    assert(Liveness.statusCheck(200).alive)
    val html = "<html><head><title>Fine Page</title></head><body>x</body></html>"
    assert(Liveness.isAlive(Some("text/html"), html, 200).alive)
    assert(!Liveness.isAlive(Some("text/html"), html, 500).alive)
    assert(!Liveness.isAlive(Some("text/html"),
      "<html><title>Account suspended</title></html>", 200).alive)
  }

  test("charset ladder: meta wins over header; broken bytes degrade, not throw") {
    val metaLatin = "<html><meta charset=\"iso-8859-1\"><body>café</body></html>"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(CharsetDecode.decode(metaLatin, Some("utf-8")).contains("café"))
    assert(CharsetDecode.metaCharset(metaLatin).contains("iso-8859-1"))
    val broken = Array[Byte]('a', 'b', 0xC3.toByte) // truncated utf-8 seq
    val out = CharsetDecode.decode(broken, Some("utf-8"))
    assert(out.startsWith("ab"))
    assert(CharsetDecode.headerCharset("text/html; charset=utf-8").contains("utf-8"))
    assert(CharsetDecode.headerCharset("text/html").isEmpty)
  }
}
