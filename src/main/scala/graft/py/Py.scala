package graft.py

import java.util.regex.{Matcher, Pattern}

/** Python-2 string/regex semantics helpers.
  *
  * The reference (`/root/reference/spider.py`, `feature_extractor.py`,
  * the `extractors5` modules) is Python 2; several behaviors differ from
  * the JVM defaults in ways that are load-bearing for byte-identical
  * output and feature parity:
  *
  *  - `s[i:]` never throws when `i > len(s)` (returns "");
  *  - `re.match` anchors at the start only (Java `Matcher.lookingAt`),
  *    and `$` matches before a final `\n` (Java default, too);
  *  - `str.split(sep)` keeps trailing empty fields (Java needs limit -1);
  *  - `file.readlines()` keeps the trailing `\n` on each line;
  *  - `str(float)` formats with `%.12g` and strips trailing zeros.
  */
object Py {

  /** Python `s[i:]` — clamped, never throws. */
  def sliceFrom(s: String, i: Int): String =
    if (i >= s.length) "" else s.substring(math.max(i, 0))

  /** Python `s[:i]` — clamped, never throws (i >= 0 only). */
  def sliceTo(s: String, i: Int): String =
    if (i >= s.length) s else s.substring(0, math.max(i, 0))

  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Pattern]()

  private def compiled(p: String, flags: Int): Pattern = {
    val key = (p, flags)
    var pat = patternCache.get(key)
    if (pat == null) { pat = Pattern.compile(p, flags); patternCache.put(key, pat) }
    pat
  }

  /** Python 2 `re.match(p, s) is not None` (no flags). */
  def pyMatch(p: String, s: String): Boolean =
    compiled(p, 0).matcher(s).lookingAt()

  /** `re.match(p, s, re.IGNORECASE)`. */
  def pyMatchI(p: String, s: String): Boolean =
    compiled(p, Pattern.CASE_INSENSITIVE).matcher(s).lookingAt()

  /** `re.match(p, s, re.MULTILINE)`. */
  def pyMatchM(p: String, s: String): Boolean =
    compiled(p, Pattern.MULTILINE).matcher(s).lookingAt()

  /** `re.search(p, s)` returning the first-match Matcher, if any. */
  def pySearch(p: String, s: String): Option[Matcher] = {
    val m = compiled(p, 0).matcher(s)
    if (m.find()) Some(m) else None
  }

  /** `re.search(p, s, re.MULTILINE)`. */
  def pySearchM(p: String, s: String): Option[Matcher] = {
    val m = compiled(p, Pattern.MULTILINE).matcher(s)
    if (m.find()) Some(m) else None
  }

  /** `re.findall(p, s)` count (full-match groups not needed by callers). */
  def pyFindAllCount(p: String, s: String): Int = {
    val m = compiled(p, 0).matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Python `str.split(sep)` — keeps trailing empties. */
  def pySplit(s: String, sep: String): Array[String] =
    s.split(Pattern.quote(sep), -1)

  /** Python `str.split()` (no arg) — split on whitespace runs, drop empties. */
  def pySplitWs(s: String): Array[String] =
    s.trim.split("\\s+").filter(_.nonEmpty)

  /** Python `file.readlines()` over in-memory text: each element keeps its
    * terminating `\n` (the reference's sample files are `\n`-terminated,
    * `spider.py:126,270` write with codecs + explicit `\n`). */
  def readLines(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == '\n') { out += text.substring(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < n) out += text.substring(start)
    out.result()
  }

  /** Python `str.rstrip()` — strips trailing whitespace incl. `\n\r\t `. */
  def rstrip(s: String): String = {
    var e = s.length
    while (e > 0 && Character.isWhitespace(s.charAt(e - 1))) e -= 1
    s.substring(0, e)
  }

  /** Python `str.strip()`. */
  def strip(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && Character.isWhitespace(s.charAt(b))) b += 1
    while (e > b && Character.isWhitespace(s.charAt(e - 1))) e -= 1
    s.substring(b, e)
  }

  /** Python 2 `str(float)`: `%.12g` with trailing zeros stripped and a
    * bare exponent form (`1e-05`). Used for the TIMER block render
    * (`spider.py:28,41` write `str(total_time)`). */
  def str12g(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    var s = "%.12g".formatLocal(java.util.Locale.ROOT, d)
    // Java %g gives e.g. "1.00000000000e-05" or "0.123456789012"
    if (s.contains('e') || s.contains('E')) {
      val Array(mant0, exp0) = s.split("[eE]")
      var mant = mant0
      if (mant.contains('.')) mant = mant.reverse.dropWhile(_ == '0').reverse
      if (mant.endsWith(".")) mant = mant.dropRight(1)
      val expSign = if (exp0.startsWith("-")) "-" else "+"
      val expDigits = exp0.dropWhile(c => c == '+' || c == '-').dropWhile(_ == '0') match {
        case "" => "0"
        case x  => x
      }
      // python pads exponent to at least 2 digits
      val expPad = if (expDigits.length < 2) "0" * (2 - expDigits.length) + expDigits else expDigits
      s = mant + "e" + expSign + expPad
    } else if (s.contains('.')) {
      s = s.reverse.dropWhile(_ == '0').reverse
      if (s.endsWith(".")) s += "0"
    }
    s
  }

  /** UTF-8 byte length — Python 2 `len()` of a byte-`str` read from a
    * utf-8 file (`extractors5/http_feature.py:151-152`). */
  def byteLen(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
}
