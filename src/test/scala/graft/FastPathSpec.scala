package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.py.Py
import graft.parse.Blocks
import graft.crawl.Liveness
import graft.features.HttpFeatures
import scala.util.Random

/** Equivalence properties for the hot-path fast rewrites: each
  * optimized routine must agree byte-for-byte with the slow, literal
  * mirror of the reference semantics it replaced. Seeded generators —
  * deterministic across runs. */
class FastPathSpec extends AnyFunSuite {

  private val rnd = new Random(20260818L)

  /** The pre-optimization reference implementation of the split. */
  private def splitViaReadLines(text: String): Blocks.BlockData =
    Blocks.split(Py.readLines(text))

  private def randomLine(): String = {
    val pool = Vector(
      "<=HTTP BEGIN=>", "<=HTTP END=>", "<=NSLOOKUP BEGIN=>",
      "<=NSLOOKUPSUMMARY BEGIN=>", "<=NSLOOKUPSUMMARY END=>",
      "  <=HOST BEGIN=>  ", "\t<=HOST END=>\t", "<= BEGIN=>", "<= END=>",
      "<=X END=>", "<=BEGIN=>", "<=END=>", "<= X BEGIN=> trailing",
      "plain content", "<html><body>x</body></html>", "", "   ",
      "<=almost BEGIN=", "=almost END=>", "<=>", "<==>",
      "not < = a sentinel", "<=LOWER begin=>", "<=TIMER BEGIN=>", "<=TIMER END=>")
    pool(rnd.nextInt(pool.size))
  }

  test("splitText ≡ split(readLines) on adversarial sentinel mixes") {
    for (_ <- 1 to 300) {
      val nLines = rnd.nextInt(20)
      val body = (1 to nLines).map(_ => randomLine()).mkString("\n")
      val text = if (rnd.nextBoolean()) body + "\n" else body
      val a = Blocks.splitText(text)
      val b = splitViaReadLines(text)
      assert(a.url == b.url, s"url mismatch for:\n$text")
      assert(a.blocks == b.blocks, s"blocks mismatch for:\n$text")
    }
  }

  test("splitText handles empty and newline-only inputs like readlines") {
    for (text <- Seq("", "\n", "\n\n", "x", "x\n")) {
      val a = Blocks.splitText(text)
      val b = splitViaReadLines(text)
      assert(a.url == b.url && a.blocks == b.blocks, s"input: ${text.replace("\n", "\\n")}")
    }
  }

  test("requiredLiteral guards are sound: guarded search ≡ plain search") {
    // every pattern the liveness screens construct, against titles
    // engineered to hit guards, misses, and near-misses
    val patterns =
      Liveness.dontDownloadErrCodes.map(c => "^(.*\\d\\D+|\\D*)" + c + "(\\D+\\d.*|\\D*)$") ++
        Seq("^.*suspended.*$", "^.*linkbucks\\.com - get your share!.*$",
          "^contact support$", "^(.* |.* can|.* could|)not(hing| be|) found.*$",
          "^(.* |.*suspected |)phishing.*$") ++
        Liveness.pageNotFoundStr.map(s => "^.*" + s.toLowerCase + ".*$")
    val titles = Seq(
      "error 404 not found", "404", "x404y", "1404", "404 2", "page not found",
      "nothing found here", "it could not be found", "account suspended",
      "this website is temporarily unavailable", "website unavailable",
      "we're sorry! this account is currently unavailable | romarg",
      "warning! | there might be a problem with the requested link",
      "error | cort.as", "error | cortxas", "shrinkthislink.com - free link shrinker",
      "suspected phishing site", "contact support", "contact support ",
      "ooops", "all good here", "short.url", "shortxurl", "fine title 200 ok",
      "pila flag poles", "seite zur zeit nicht erreichbar", "suspend")
    for (p <- patterns; t <- titles) {
      assert(Py.pySearchHit(p, t) == Py.pySearch(p, t).isDefined,
        s"guard divergence: pattern=$p title=$t")
    }
  }

  test("requiredLiteral never extracts from groups, alternations, classes, quantifiers") {
    assert(Py.requiredLiteral("^.*suspended.*$") == "suspended")
    assert(Py.requiredLiteral("a|b") == "") // top-level alternation
    assert(Py.requiredLiteral("(abc)def") == "def") // group content excluded
    assert(Py.requiredLiteral("abc?d") == "d") // optional last char drops run
    assert(Py.requiredLiteral("ab{2,3}cd") == "cd") // quantifier digits not literal
    assert(Py.requiredLiteral("[abc]xy") == "xy") // class content excluded
    assert(Py.requiredLiteral("^(.* |)website (is|) here.*$") == "website ")
  }

  test("titleCheck verdicts unchanged by guards (golden sample)") {
    assert(!Liveness.titleCheck(Seq("Account Suspended")).alive)
    assert(!Liveness.titleCheck(Seq("404 Not Found")).alive)
    assert(!Liveness.titleCheck(Seq("this page is not available")).alive)
    assert(!Liveness.titleCheck(Seq("ShrinkThisLink.com - Free link shrinker!")).alive)
    assert(Liveness.titleCheck(Seq("Welcome to Example")).alive)
    assert(Liveness.titleCheck(Seq("Found objects gallery")).alive) // ' found' guard must not over-reject
    assert(!Liveness.titleCheck(Seq("nothing found")).alive)
  }

  test("byteLen ≡ getBytes(UTF_8).length incl. surrogates") {
    val samples = Seq("", "ascii", "naïve café", "日本語テキスト", "🙂 emoji 🙂",
      "mixed 中文 and ascii", "\ud800 lone high", "\udc00 lone low", "a😀b")
    for (s <- samples)
      assert(Py.byteLen(s) == s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length, s"for: $s")
    for (_ <- 1 to 200) {
      val s = (1 to rnd.nextInt(50)).map(_ => rnd.nextInt(0x3000).toChar).mkString
      assert(Py.byteLen(s) == s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    }
  }

  test("countLiteral ≡ pyFindAllCount for literal patterns") {
    val rows = Seq("<script>x</script>", "<script><script></script>",
      "no tags", "<style>a<style>b</style>", "", "<script")
    for (r <- rows; t <- Seq("script", "style")) {
      assert(Py.countLiteral(r, "<" + t) == Py.pyFindAllCount("<" + t, r))
      assert(Py.countLiteral(r, "</" + t + ">") == Py.pyFindAllCount("</" + t + ">", r))
    }
  }

  test("renderWithBlocks direct blocks ≡ splitText(render) incl. fallback cases") {
    import graft.model.{HeaderHop, NetInfo}
    import graft.parse.SampleRender
    val contents = Seq(
      "<html><body>plain</body></html>",
      "", "line1\nline2\n", "js if (a <= b) { x() }", // "<=" → fallback
      "evil\n<=HTTP END=>\nafter", // sentinel payload → fallback
      "evil\n<=FAKE BEGIN=>\nafter", "trailing no newline",
      "многоязычный 内容 🙂", "  <=HTTP BEGIN=>  \nnested")
    val hop = HeaderHop("http://t.example/a", 11, 200, "OK",
      Seq("Content-Type" -> "text/html", "X-Pad" -> "v"))
    val redirHop = HeaderHop("http://t.example/r", 11, 302, "Found",
      Seq("Location" -> "http://t.example/a"))
    val nets = Seq(
      NetInfo("soa out\nline2", "ns out", "host out", "whois out", hop, Nil, 0.25),
      // history re-walk (multiple header+http blocks)
      NetInfo("soa", "ns", "host", "whois", hop, Seq(redirHop, redirHop), 1.5),
      // cycling warning block (history revisits the same URL > times)
      NetInfo("soa", "ns", "host", "whois", hop,
        Seq(redirHop, redirHop, redirHop, redirHop), 2.0),
      // net text containing "<=" → fallback
      NetInfo("soa with js a <= b", "ns", "host", "whois", hop, Nil, 0.1))
    // the pre-optimization render: block-helper concatenation (the
    // helpers are byte-pinned by SampleRenderSpec goldens)
    def referenceRender(url: String, content: String, net: NetInfo): String = {
      val sb = new StringBuilder
      sb ++= url + "\n"
      val walk = SampleRender.cycleWalk(net.finalHop.url, net.history.map(_.url), 2)
      if (walk.isCycle) sb ++= SampleRender.redirectWarning(walk.counts)
      sb ++= SampleRender.nslookupBlock(net.nslookupSoaOut, net.nslookupOut)
      sb ++= SampleRender.hostBlock(net.hostOut)
      sb ++= SampleRender.whoisBlock(net.whoisOut)
      if (net.history.nonEmpty) {
        val budget = walk.counts
        var break = false
        for (hop <- net.history if !break) {
          budget.get(hop.url) match {
            case Some(c) if c > 0 =>
              budget(hop.url) = c - 1
              sb ++= SampleRender.headerBlock(hop)
              sb ++= SampleRender.contentBlock(content)
            case _ => break = true
          }
        }
      }
      sb ++= SampleRender.headerBlock(net.finalHop)
      sb ++= SampleRender.contentBlock(content)
      sb ++= SampleRender.timerBlock(net.timerSeconds)
      sb.result()
    }
    for (net <- nets; content <- contents) {
      val (text, direct) = SampleRender.renderWithBlocks("http://t.example/page", content, net)
      assert(text == referenceRender("http://t.example/page", content, net),
        s"rendered text diverges from block-helper concatenation for content=$content")
      val expected = Blocks.splitText(text)
      direct match {
        case Some(d) =>
          assert(d.url == expected.url, s"url mismatch for content=$content")
          assert(d.blocks == expected.blocks,
            s"direct blocks diverge from splitText for content=$content net=$net")
        case None =>
          // fallback must only fire when some payload really contains "<="
          assert(text.indexOf("<=", 0) >= 0)
      }
    }
    // sentinel-bearing content MUST take the fallback (direct would be wrong)
    val (_, d) = SampleRender.renderWithBlocks("http://t.example/page",
      "evil\n<=HTTP END=>\nafter", nets.head)
    assert(d.isEmpty)
  }

  test("hashText streams UTF-8 identically to hashing getBytes") {
    def viaBytes(s: String): Long = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    import graft.jobs.CrawlWave.hashText
    val samples = Seq("", "ascii only", "naïve café", "日本語テキスト", "🙂🙂",
      "a😀b", "\ud800 lone high", "\udc00 lone low", "mixed 中文 π ©",
      "߿ࠀ￿")
    for (s <- samples) assert(hashText(s) == viaBytes(s), s"for: $s")
    for (_ <- 1 to 300) {
      val s = (1 to rnd.nextInt(80)).map(_ => rnd.nextInt(0xd000).toChar).mkString
      assert(hashText(s) == viaBytes(s))
    }
  }

  test("stripedFromRows ≡ literal rstrip+split reference on trailing-whitespace blocks") {
    def reference(htmlStr: String): String = { // the pre-optimization code
      val temp = Py.rstrip(htmlStr)
      val kept = Vector.newBuilder[String]
      for (row <- temp.split("\n", -1)) {
        val r = Py.rstrip(row)
        if (r.length >= 7 && r.startsWith("<!--") && r.endsWith("-->")) {
          if (Py.pyMatch("^<!--.*(-->.*<!--)+.*-->$", r)) kept += r
          else if (Py.pyMatch("^<!--.*-->$", r)) ()
          else kept += r
        } else kept += r
      }
      kept.result().mkString("\n")
    }
    val rows = Seq("<html>", "<!-- c -->", "text  ", "", "   ", "\t",
      "<!-- a --><!-- b -->", "last")
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(8)
      val block = (1 to n).map(_ => rows(rnd.nextInt(rows.size))).mkString("\n") +
        ("\n" * rnd.nextInt(3)) + (" " * rnd.nextInt(3))
      assert(HttpFeatures.stripedHtmlStr(block) == reference(block),
        s"for: ${block.replace("\n", "\\n")}")
    }
    assert(HttpFeatures.stripedHtmlStr("") == reference(""))
    assert(HttpFeatures.stripedHtmlStr("   \n  \n") == reference("   \n  \n"))
  }

  test("stripedHtmlStr comment guard preserves drop/keep decisions") {
    val block = Seq(
      "<html>", "<!-- dropped comment -->", "<!-- kept --><!-- multi -->",
      "  <!-- not at col 0 is still dropped? -->", "<!--->", "<!---->",
      "text <!-- inline --> more", "<!-- unterminated", "normal row").mkString("\n")
    // golden: single whole-line comments drop; multi-comment lines keep;
    // leading-space comment rows do NOT match ^<!-- (kept)
    val out = HttpFeatures.stripedHtmlStr(block)
    assert(!out.contains("<!-- dropped comment -->"))
    assert(out.contains("<!-- kept --><!-- multi -->"))
    assert(out.contains("  <!-- not at col 0 is still dropped? -->"))
    assert(out.contains("<!--->")) // 7 chars but "<!--" + "-->" overlap → regex can't match
    assert(!out.contains("<!---->\n") && !out.split("\n", -1).contains("<!---->")) // exact 7-char comment drops
    assert(out.contains("text <!-- inline --> more"))
    assert(out.contains("<!-- unterminated"))
  }
}
