package graft.parse

import graft.py.Py
import scala.collection.mutable

/** Sentinel-block split of a sample document, mirroring
  * `/root/reference/feature_extractor.py:103-122` (`__split_data`).
  *
  * Mirrored quirks (property-tested):
  *  - a `<=X BEGIN=>` inside an open block increments the depth counter,
  *    and the matching `END` at depth > 1 does NOT decrement — so a
  *    nested sentinel swallows the enclosing block and everything after
  *    it (`feature_extractor.py:113-119`);
  *  - the END handler uses the LAST seen BEGIN's class key, not a stack;
  *  - `<=CYCLING REDIRECT WARNING BEGIN=>` keys as `cycling` (first
  *    whitespace token, `[2:]`, lower-cased);
  *  - `NSLOOKUPSUMMARY` BEGIN leaves the previous key untouched
  *    (`class_type` stays a list in the reference). A top-level
  *    NSLOOKUPSUMMARY block makes the reference crash
  *    (`list.lower()` AttributeError) — our defined substitute skips the
  *    block and closes the depth, documented divergence;
  *  - block content lines keep their `\n` (readlines semantics) —
  *    callers must split with [[Py.readLines]].
  */
object Blocks {

  final case class BlockData(url: String, blocks: Map[String, Vector[String]])

  /** Sentinel classification of one line: 0 = content, 1 = BEGIN,
    * 2 = END. Exactly `pyMatch("^<=.* BEGIN=>$" / "^<=.* END=>$",
    * Py.strip(l))` (feature_extractor.py:108,115) — the hot
    * path (two regex matches + a strip allocation per line of every
    * rendered sample) reduced to bounded char scans: the regexes are
    * `^<=` + `.*` (no newline) + a literal suffix + `$`, over a
    * whitespace-stripped single line. */
  private def sentinelKind(l: String): Int = {
    var b = 0
    var e = l.length
    while (b < e && graft.py.Py.isByteWs(l.charAt(b))) b += 1
    while (e > b && graft.py.Py.isByteWs(l.charAt(e - 1))) e -= 1
    if (e - b < 8) return 0 // shortest sentinel is "<= END=>"
    if (l.charAt(b) != '<' || l.charAt(b + 1) != '=') return 0
    if (l.charAt(e - 1) != '>' || l.charAt(e - 2) != '=') return 0
    val kind =
      if (e - b >= 10 && l.regionMatches(e - 8, " BEGIN=>", 0, 8)) 1
      else if (l.regionMatches(e - 6, " END=>", 0, 6)) 2
      else 0
    if (kind == 0) return 0
    var i = b + 2 // `.*` excludes \n: an interior newline breaks the match
    while (i < e) { if (l.charAt(i) == '\n') return 0; i += 1 }
    kind
  }

  def split(dataList: Seq[String]): BlockData = {
    val blocks = mutable.LinkedHashMap.empty[String, Vector[String]]
    var entries = 0
    val temp = new StringBuilder
    var classType: String = null // null until first BEGIN
    var classTypeIsSummary = false // mirrors class_type staying a list
    val url = if (dataList.nonEmpty) dataList.head else ""
    for (l <- dataList) {
      val kind = sentinelKind(l)
      if (kind == 1) {
        entries += 1
        val first = Py.pySplitWs(l).headOption.getOrElse("")
        val tag = Py.sliceFrom(first, 2)
        if (tag != "NSLOOKUPSUMMARY") {
          classType = tag
          classTypeIsSummary = false
        } else {
          classTypeIsSummary = true
        }
      } else if (kind == 2) {
        if (entries == 1) {
          if (classType != null && !classTypeIsSummary) {
            val key = Py.lowerAscii(classType)
            blocks(key) = blocks.getOrElse(key, Vector.empty) :+ temp.result()
          }
          // reference: append + `entries -= 1`; the summary case (and a
          // FIRST-begin summary, where class_type is still the initial
          // list) crashes there on `class_type.lower()` — substitute:
          // drop content, still close the depth, so later blocks
          // survive either position of the summary block.
          temp.clear()
          entries -= 1
        }
        // entries != 1 → no-op and NO decrement (the nesting quirk)
      } else if (entries > 0) {
        temp ++= l
      }
    }
    BlockData(url, blocks.toMap)
  }

  /** [[sentinelKind]] over a [start, end) line range of `text` —
    * avoids the per-line substring on the direct-scan path. */
  private def sentinelKindRange(text: String, start: Int, end: Int): Int = {
    var b = start
    var e = end
    while (b < e && graft.py.Py.isByteWs(text.charAt(b))) b += 1
    while (e > b && graft.py.Py.isByteWs(text.charAt(e - 1))) e -= 1
    if (e - b < 8) return 0
    if (text.charAt(b) != '<' || text.charAt(b + 1) != '=') return 0
    if (text.charAt(e - 1) != '>' || text.charAt(e - 2) != '=') return 0
    val kind =
      if (e - b >= 10 && text.regionMatches(e - 8, " BEGIN=>", 0, 8)) 1
      else if (text.regionMatches(e - 6, " END=>", 0, 6)) 2
      else 0
    if (kind == 0) return 0
    var i = b + 2
    while (i < e) { if (text.charAt(i) == '\n') return 0; i += 1 }
    kind
  }

  /** Split rendered sample text — the extract hot path. Identical
    * result to `split(Py.readLines(text))` (property: the line walk
    * below IS readlines — one line per '\n', trailing remainder kept),
    * but scans the string directly: content lines append as ranges
    * into the block builder instead of materializing a line Vector. */
  def splitText(text: String): BlockData = {
    val blocks = mutable.LinkedHashMap.empty[String, Vector[String]]
    var entries = 0
    val temp = new java.lang.StringBuilder
    var classType: String = null
    var classTypeIsSummary = false
    var url = ""
    var sawFirst = false
    val n = text.length
    var start = 0
    while (start < n) {
      val nl = text.indexOf('\n', start)
      val end = if (nl < 0) n else nl + 1 // line span incl its '\n'
      if (!sawFirst) { url = text.substring(start, end); sawFirst = true }
      val kind = sentinelKindRange(text, start, end)
      if (kind == 1) {
        entries += 1
        // rare path: materialize the line for the exact pySplitWs quirk
        val first = Py.pySplitWs(text.substring(start, end)).headOption.getOrElse("")
        val tag = Py.sliceFrom(first, 2)
        if (tag != "NSLOOKUPSUMMARY") {
          classType = tag
          classTypeIsSummary = false
        } else {
          classTypeIsSummary = true
        }
      } else if (kind == 2) {
        if (entries == 1) {
          if (classType != null && !classTypeIsSummary) {
            val key = Py.lowerAscii(classType)
            blocks(key) = blocks.getOrElse(key, Vector.empty) :+ temp.toString
          }
          temp.setLength(0)
          entries -= 1
        }
      } else if (entries > 0) {
        temp.append(text, start, end)
      }
      start = end
    }
    BlockData(url, blocks.toMap)
  }
}
