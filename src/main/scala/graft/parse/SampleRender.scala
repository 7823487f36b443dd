package graft.parse

import graft.model.{HeaderHop, NetInfo}
import graft.py.Py
import scala.collection.mutable

/** Byte-identical rendering of one sample document, mirroring the write
  * path of `/root/reference/spider.py` `DownloadHTTPFile.run`
  * (:268-290) and its helpers. Block order: url line, optional CYCLING
  * warning (:274-275), NSLOOKUP (:276,62-71), HOST (:277,73-78), WHOIS
  * (:278,80-93), then `download_file` (:279,379-399) which re-walks the
  * redirect history writing one HEADER + HTTP block per budgeted hop and
  * finally the main HEADER + HTTP, then TIMER (:280,39-43).
  */
object SampleRender {

  /** Result of `is_redirect_cycle` (`spider.py:401-416`): whether a cycle
    * was detected plus the per-URL visit counts, in insertion order (the
    * reference iterates a CPython2 dict whose order is hash-defined; we
    * fix insertion order as the engine's canonical order — documented
    * divergence with no reference-side test to contradict it). */
  final case class CycleWalk(isCycle: Boolean, counts: mutable.LinkedHashMap[String, Int])

  /** Mirror of `redirect_cycle_test` (`spider.py:405-416`) with
    * `redirect_cycle_times` default 2, stored minus one (:171).
    * Note the short-circuit: once any hop tests true, the remaining
    * history URLs are never visited/counted (`test = test or ...`). */
  def cycleWalk(finalUrl: String, historyUrls: Seq[String], redirectCycleTimes: Int = 2): CycleWalk = {
    val times = redirectCycleTimes - 1
    val counts = mutable.LinkedHashMap.empty[String, Int]
    def visit(u: String): Boolean = {
      counts.get(u) match {
        case Some(c) =>
          if (c > times) return true
          counts(u) = c + 1
        case None => counts(u) = 1
      }
      false
    }
    // reference walks: final response first, then each history entry
    // (history entries have empty history themselves)
    var test = visit(finalUrl)
    if (!test) {
      val it = historyUrls.iterator
      while (it.hasNext && !test) test = visit(it.next())
    } else {
      // visit(final) true means counts pre-existed — cannot happen on a
      // fresh walk; kept for structural parity
    }
    CycleWalk(test, counts)
  }

  /** `get_redirect_warning` (`spider.py:418-424`). */
  def redirectWarning(counts: mutable.LinkedHashMap[String, Int]): String = {
    val sb = new StringBuilder("\n<=CYCLING REDIRECT WARNING BEGIN=>\n")
    sb ++= "Cycle Redirect times:\n"
    for ((k, v) <- counts) sb ++= s"$k:$v\n"
    sb ++= "\n<=CYCLING REDIRECT WARNING END=>\n"
    sb.result()
  }

  /** `get_headers` (`spider.py:505-511`): status line rendered as
    * `HTTP/%0.1f %d %s` with version/10.0. */
  def headerBlock(hop: HeaderHop): String = {
    val sb = new StringBuilder("\n<=HEADER BEGIN=>\n")
    sb ++= "HTTP/%.1f %d %s\n".formatLocal(java.util.Locale.ROOT, hop.version / 10.0, hop.status, hop.reason)
    for ((k, v) <- hop.headers) sb ++= s"$k: $v\n"
    sb ++= "\n<=HEADER END=>\n"
    sb.result()
  }

  /** `get_content` (`spider.py:499-503`) — always the MAIN decoded
    * content, even on history-hop re-walks (quirk, see render). */
  def contentBlock(content: String): String =
    "\n<=HTTP BEGIN=>\n" + content + "\n<=HTTP END=>\n"

  def nslookupBlock(soaOut: String, nsOut: String): String =
    "\n<=NSLOOKUP BEGIN=>\n" + soaOut + "\n" + nsOut + "\n<=NSLOOKUP END=>\n"

  def hostBlock(hostOut: String): String =
    "\n<=HOST BEGIN=>\n" + hostOut + "\n<=HOST END=>\n"

  def whoisBlock(whoisOut: String): String =
    "\n<=WHOIS BEGIN=>\n" + whoisOut + "\n<=WHOIS END=>\n"

  def timerBlock(seconds: Double): String =
    "\n<=TIMER BEGIN=>\n" + Py.str12g(seconds) + "\n" + "\n<=TIMER END=>\n"

  /** Full sample-document render for one live URL.
    *
    * `content` is the decoded page body (the reference's
    * `self.content`, `spider.py:304,440-497`); `net` carries the
    * subprocess outputs + response chain. Mirrored quirk
    * (`spider.py:379-397`): the history re-walk writes each budgeted
    * hop's HEADER block followed by the MAIN content (not the hop's),
    * decrementing the cycle-walk count per write and breaking at the
    * first hop whose count is exhausted or absent.
    */
  def render(url: String, content: String, net: NetInfo, redirectCycleTimes: Int = 2): String =
    renderWithBlocks(url, content, net, redirectCycleTimes)._1

  /** True iff no line of `s` can parse as a block sentinel: a sentinel
    * line starts (after leading whitespace) with `<=`, so a string
    * without the two-char substring is provably sentinel-free. One
    * intrinsified indexOf — the fast-path guard for
    * [[renderWithBlocks]]. */
  private def sentinelFree(s: String): Boolean = s.indexOf("<=") < 0

  /** [[render]] that ALSO returns the block split of the rendered text —
    * `Some(data)` exactly when every payload is provably sentinel-free,
    * in which case `data == Blocks.splitText(text)` (property-tested in
    * FastPathSpec; the byte-identity of `text` itself is independently
    * pinned by the golden `text` fixtures in CrawlSpec). The extract hot
    * path then skips re-scanning the text it just assembled; a payload
    * containing `<=` (e.g. a JS `<=` operator in the body) returns None
    * and the caller falls back to [[graft.parse.Blocks.splitText]] — the
    * reference's re-split quirks (nesting, NSLOOKUPSUMMARY) only fire on
    * sentinel-shaped payload lines, which the guard excludes.
    *
    * Blocks are emitted as (sentinel, payloadCore) pieces appended
    * straight into one builder — the wrapped block string
    * `"\n<=KEY BEGIN=>\n" + payloadCore + "\n<=KEY END=>\n"` is never
    * materialized, so the page body is copied once (into the final
    * text), not three times. The block-split payload for the map is
    * `payloadCore + "\n"` (the END sentinel's leading newline belongs to
    * the payload's last line). */
  def renderWithBlocks(url: String, content: String, net: NetInfo,
      redirectCycleTimes: Int = 2): (String, Option[Blocks.BlockData]) = {
    val sb = new java.lang.StringBuilder
    sb.append(url).append('\n')
    var clean = url.indexOf('\n') < 0 && sentinelFree(url)
    val blocks = mutable.LinkedHashMap.empty[String, Vector[String]]
    // http payload shared across history-hop re-writes (same object)
    lazy val httpPayload = content + "\n"
    def add(key: String, sentinel: String, payloadCore: String, payload: => String): Unit = {
      sb.append("\n<=").append(sentinel).append(" BEGIN=>\n")
      sb.append(payloadCore)
      sb.append("\n<=").append(sentinel).append(" END=>\n")
      if (clean) {
        if (sentinelFree(payloadCore))
          blocks(key) = blocks.getOrElse(key, Vector.empty) :+ payload
        else clean = false
      }
    }
    def addSmall(key: String, sentinel: String, payloadCore: String): Unit =
      add(key, sentinel, payloadCore, payloadCore + "\n")
    val walk = cycleWalk(net.finalHop.url, net.history.map(_.url), redirectCycleTimes)
    if (walk.isCycle) {
      // redirectWarning minus its sentinel wrapper (keeps the helper's
      // exact line layout: "Cycle Redirect times:" then k:v lines, each
      // newline-terminated — the END sentinel's own leading \n is added
      // by the wrapper, reproducing the empty line before <=... END=>)
      val w = new java.lang.StringBuilder("Cycle Redirect times:\n")
      for ((k, v) <- walk.counts) w.append(k).append(':').append(v).append('\n')
      addSmall("cycling", "CYCLING REDIRECT WARNING", w.toString)
    }
    addSmall("nslookup", "NSLOOKUP", net.nslookupSoaOut + "\n" + net.nslookupOut)
    addSmall("host", "HOST", net.hostOut)
    addSmall("whois", "WHOIS", net.whoisOut)
    def headerCore(hop: HeaderHop): String = {
      // status line + header lines, EACH newline-terminated (the empty
      // line before <=HEADER END=> comes from the wrapper's own \n)
      val h = new java.lang.StringBuilder
      h.append("HTTP/%.1f %d %s\n".formatLocal(java.util.Locale.ROOT,
        hop.version / 10.0, hop.status, hop.reason))
      for ((k, v) <- hop.headers) h.append(k).append(": ").append(v).append('\n')
      h.toString
    }
    // download_file: history re-walk under the cycle-walk budget
    if (net.history.nonEmpty) {
      val budget = walk.counts
      var break = false
      for (hop <- net.history if !break) {
        budget.get(hop.url) match {
          case Some(c) if c > 0 =>
            budget(hop.url) = c - 1
            addSmall("header", "HEADER", headerCore(hop))
            add("http", "HTTP", content, httpPayload)
          case _ => break = true
        }
      }
    }
    addSmall("header", "HEADER", headerCore(net.finalHop))
    add("http", "HTTP", content, httpPayload)
    addSmall("timer", "TIMER", Py.str12g(net.timerSeconds) + "\n")
    val text = sb.toString
    (text, if (clean) Some(Blocks.BlockData(url + "\n", blocks.toMap)) else None)
  }

  /** Sample-document render for one `ftp:` URL, mirroring
    * `DownloadFTPFile.run` + `write_content_to_file`
    * (`spider.py:113-161`): url line, NSLOOKUP/HOST/WHOIS, then the
    * raw file content between the HTTP sentinels and the TIMER block —
    * no CYCLING warning, no HEADER blocks, no liveness screen (the
    * reference writes FTP content unconditionally; there is no
    * response object to test). */
  def renderFtp(url: String, content: String, net: NetInfo): String = {
    val sb = new StringBuilder
    sb ++= url + "\n"
    sb ++= nslookupBlock(net.nslookupSoaOut, net.nslookupOut)
    sb ++= hostBlock(net.hostOut)
    sb ++= whoisBlock(net.whoisOut)
    sb ++= contentBlock(content)
    sb ++= timerBlock(net.timerSeconds)
    sb.result()
  }
}
