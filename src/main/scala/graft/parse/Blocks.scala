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

  private val beginRe = "^<=.* BEGIN=>$"
  private val endRe = "^<=.* END=>$"

  def split(dataList: Seq[String]): BlockData = {
    val blocks = mutable.LinkedHashMap.empty[String, Vector[String]]
    var entries = 0
    val temp = new StringBuilder
    var classType: String = null // null until first BEGIN
    var classTypeIsSummary = false // mirrors class_type staying a list
    val url = if (dataList.nonEmpty) dataList.head else ""
    for (l <- dataList) {
      val stripped = Py.strip(l)
      if (Py.pyMatch(beginRe, stripped)) {
        entries += 1
        val first = Py.pySplitWs(l).headOption.getOrElse("")
        val tag = Py.sliceFrom(first, 2)
        if (tag != "NSLOOKUPSUMMARY") {
          classType = tag
          classTypeIsSummary = false
        } else {
          classTypeIsSummary = true
        }
      } else if (Py.pyMatch(endRe, stripped)) {
        if (entries == 1 && classType != null) {
          if (!classTypeIsSummary) {
            val key = classType.toLowerCase
            blocks(key) = blocks.getOrElse(key, Vector.empty) :+ temp.result()
          }
          // reference: append + `entries -= 1`; summary case crashes there —
          // substitute: drop content, still close the depth.
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

  /** Convenience: split rendered sample text. */
  def splitText(text: String): BlockData = split(Py.readLines(text))
}
