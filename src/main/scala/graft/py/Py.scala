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

  /** [[pyMatchM]] returning the Matcher on success (cached compile —
    * group-extracting hot paths must not rebuild Patterns per row). */
  def pyMatchMG(p: String, s: String): Option[Matcher] = {
    val m = compiled(p, Pattern.MULTILINE).matcher(s)
    if (m.lookingAt()) Some(m) else None
  }

  /** `re.search(p, s)` returning the first-match Matcher, if any. */
  def pySearch(p: String, s: String): Option[Matcher] = {
    val m = compiled(p, 0).matcher(s)
    if (m.find()) Some(m) else None
  }

  // ---- guarded search: a conservative required-literal pre-filter ----
  //
  // For a hot path that runs MANY rarely-matching regexes per string
  // (liveness title screens), extract from the pattern a literal that
  // every possible match must contain; String.contains (intrinsified)
  // then rejects the common case without entering the regex engine.
  // The guard is sound-by-construction: when the analysis cannot prove
  // a literal is required (top-level alternation, escapes, classes,
  // optional quantifiers), it emits NO guard and the regex always runs.

  private val guardCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Longest literal every match of `p` must contain, or "" if none is
    * provable. Only depth-0 runs count (group contents may be optional
    * via alternation); a run followed by `?`/`*`/`{` is discarded; any
    * depth-0 `|` splits the whole pattern, so no literal is required. */
  private[graft] def requiredLiteral(p: String): String = {
    var best = ""
    val run = new java.lang.StringBuilder
    var depth = 0
    var i = 0
    val n = p.length
    def flush(nextCh: Char): Unit = {
      if (run.length > 0) {
        if (nextCh != '?' && nextCh != '*' && nextCh != '{' &&
            run.length > best.length) best = run.toString
        run.setLength(0)
      }
    }
    while (i < n) {
      val c = p.charAt(i)
      c match {
        case '|' if depth == 0 => return "" // top-level alternation: nothing required
        case '(' => flush(c); depth += 1
        case ')' =>
          flush(c)
          depth -= 1
          // a group followed by ?/* is optional; the group content was
          // already excluded (depth > 0), nothing to do
        case '\\' => flush(c); i += 1 // escaped char: end run, skip it
        case '[' => // char class: end run, skip to its ]
          flush(c)
          i += 1
          if (i < n && p.charAt(i) == '^') i += 1
          if (i < n && p.charAt(i) == ']') i += 1 // literal ] first
          while (i < n && p.charAt(i) != ']') { if (p.charAt(i) == '\\') i += 1; i += 1 }
        case '{' => // {m,n} quantifier: its digits are not literal text
          flush(c)
          while (i < n && p.charAt(i) != '}') i += 1
        case _ =>
          if (depth == 0 &&
              (Character.isLetterOrDigit(c) || " !,'&:;_-".indexOf(c) >= 0)) {
            // next char a quantifier makes the LAST char optional —
            // flush() handles it by discarding the whole run (conservative)
            run.append(c)
          } else flush(c)
      }
      i += 1
    }
    flush(' ')
    best
  }

  private def guardOf(p: String): String = {
    var g = guardCache.get(p)
    if (g == null) {
      g = requiredLiteral(p)
      if (g.length < 3) g = "" // too short to pay for the contains scan
      guardCache.put(p, g)
    }
    g
  }

  /** `re.search(p, s) is not None`, with the required-literal fast
    * reject. Exactly equivalent to `pySearch(p, s).isDefined`. */
  def pySearchHit(p: String, s: String): Boolean = {
    val g = guardOf(p)
    if (g.nonEmpty && !s.contains(g)) false
    else compiled(p, 0).matcher(s).find()
  }

  /** A pattern precompiled WITH its required-literal guard — for hot
    * paths that test a fixed pattern set per row, where even the
    * per-call cache lookups of [[pySearchHit]] (pattern-string hash +
    * two ConcurrentHashMap gets) are measurable. `hit(s)` is exactly
    * `pySearchHit(pattern, s)`. */
  final class Guarded(p: String) extends Serializable {
    private val guard: String = { val g = requiredLiteral(p); if (g.length < 3) "" else g }
    @transient private lazy val pat: Pattern = Pattern.compile(p)
    def hit(s: String): Boolean =
      (guard.isEmpty || s.contains(guard)) && pat.matcher(s).find()
  }

  /** Non-overlapping literal occurrence count — `re.findall` for a
    * metacharacter-free pattern (callers must pass literals only). */
  def countLiteral(s: String, sub: String): Int = {
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  /** `re.search(p, s, re.MULTILINE)`. */
  def pySearchM(p: String, s: String): Option[Matcher] = {
    val m = compiled(p, Pattern.MULTILINE).matcher(s)
    if (m.find()) Some(m) else None
  }

  /** [[pySearchM]] with the required-literal fast reject (guards are
    * case-sensitive literals, so they hold under MULTILINE too). */
  def pySearchMGuarded(p: String, s: String): Option[Matcher] = {
    val g = guardOf(p)
    if (g.nonEmpty && !s.contains(g)) None else pySearchM(p, s)
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

  /** Python 2 byte-`str.split()` (no arg) — split on ASCII-whitespace
    * runs, drop empties. Java `\s` is exactly Python 2's
    * `string.whitespace` set; no pre-trim (Java `trim` would also eat
    * leading control chars < 0x20 that Python keeps in the first
    * token). */
  def pySplitWs(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

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

  // ---- the two Python-2 whitespace regimes -------------------------
  //
  // byte `str.strip()` strips exactly `string.whitespace` =
  // " \t\n\v\f\r" (the reference's row/url strips all run over sample
  // files and urls read WITHOUT codecs, i.e. utf-8 bytes, where no
  // multi-byte character has an ASCII-whitespace byte);
  // `unicode.strip()` strips per Py_UNICODE_ISSPACE (CPython 2.7 /
  // Unicode 5.2): the Java `Character.isWhitespace` set PLUS NEL,
  // NBSP, MONGOLIAN VOWEL SEPARATOR, FIGURE SPACE and NARROW NO-BREAK
  // SPACE — the reference's title pipeline is unicode (codecs.open in
  // tfidf-elm.py:32, BeautifulSoup `.text` in extractors5
  // get_title/__split_title). Character.isWhitespace matches NEITHER
  // set exactly (it includes U+2028 etc. but excludes NBSP), so both
  // regimes are spelled out.

  /** Python 2 byte-`str` whitespace (`string.whitespace`). */
  @inline def isByteWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** CPython 2.7 `Py_UNICODE_ISSPACE` (BMP; no astral char is space). */
  @inline def isUniWs(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u0085' || c == '\u00A0' ||
      c == '\u180E' || c == '\u2007' || c == '\u202F'

  /** The full Py_UNICODE_ISSPACE set as a string — for building oracle
    * SQL `trim(x, <set>)` calls that must replicate [[stripUni]]. */
  val uniWhitespace: String =
    "\t\n\u000B\f\r\u001C\u001D\u001E\u001F \u0085\u00A0\u1680\u180E" +
      "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200A" +
      "\u2028\u2029\u202F\u205F\u3000"

  /** [[uniWhitespace]] as a DUCKDB `chr(..) || ..` expression (chr()
    * keeps the oracle text free of raw control characters). DuckDB-only:
    * Spark's chr(n) wraps n % 256, which would turn the supra-Latin-1
    * entries into printable ASCII and make trim() eat real data. */
  val uniWhitespaceSql: String =
    uniWhitespace.map(c => s"chr(${c.toInt})").mkString(" || ")

  /** Python 2 byte-`str.rstrip()` — ASCII whitespace only. */
  def rstrip(s: String): String = {
    var e = s.length
    while (e > 0 && isByteWs(s.charAt(e - 1))) e -= 1
    if (e == s.length) s else s.substring(0, e)
  }

  /** Python 2 byte-`str.strip()` — ASCII whitespace only. */
  def strip(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && isByteWs(s.charAt(b))) b += 1
    while (e > b && isByteWs(s.charAt(e - 1))) e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Python 2 `unicode.strip()` — Py_UNICODE_ISSPACE set. */
  def stripUni(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && isUniWs(s.charAt(b))) b += 1
    while (e > b && isUniWs(s.charAt(e - 1))) e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  // ---- the two Python-2 lower() regimes -----------------------------
  //
  // byte `str.lower()` folds A-Z ONLY (utf-8 bytes of non-ASCII chars
  // are untouched); `unicode.lower()` applies the SIMPLE per-code-point
  // UnicodeData mapping. Java String.toLowerCase matches neither: it is
  // the FULL, locale-sensitive mapping (U+0130 İ → "i̇" two chars, and
  // tr/az default locales would fold I → ı).

  /** Python 2 byte-`str.lower()` — ASCII A-Z only. Returns `s` itself
    * when nothing folds (hot paths lower per row). */
  def lowerAscii(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == n) return s
    val a = s.toCharArray
    while (i < n) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Python 2 `unicode.lower()` — the simple 1:1 code-point mapping
    * (`Character.toLowerCase(int)`), never length-changing and never
    * locale-sensitive. Honest caveat: the JDK's table is the running
    * Unicode version (17 → 13.0) while CPython 2.7 shipped 5.2, so
    * characters that GAINED case mappings after 5.2 (e.g. Cherokee
    * U+13A0.., U+037F) fold here but are identity in the reference —
    * pinning the 5.2 delta would mean embedding the full mapping
    * table; documented instead. */
  def lowerUni(s: String): String = {
    var i = 0
    val n = s.length
    // fast path: scan to the first char the simple mapping changes
    while (i < n && {
      val c = s.charAt(i)
      !Character.isSurrogate(c) && Character.toLowerCase(c.toInt) == c.toInt
    }) i += 1
    if (i == n) return s
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
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

  /** Python 2 `float(str)`: strips whitespace; accepts sign,
    * decimal/exponent forms, and case-insensitive inf/infinity/nan —
    * REJECTS Java-isms Double.parseDouble accepts ('5f', '1.5d',
    * hex-float '0x1.8p1'). None where Python raises ValueError. */
  def pyFloatOption(s: String): Option[Double] = {
    val t = strip(s)
    if (t.isEmpty) return None
    val (sign, body0) = t.charAt(0) match {
      case '+' => (1.0, t.substring(1))
      case '-' => (-1.0, t.substring(1))
      case _   => (1.0, t)
    }
    val body = lowerAscii(body0)
    if (body == "inf" || body == "infinity") Some(sign * Double.PositiveInfinity)
    else if (body == "nan") Some(Double.NaN)
    else if (body.nonEmpty &&
             body.forall(c => (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == '+' || c == '-') &&
             pyMatch("^(\\d+\\.?\\d*|\\.\\d+)(e[+-]?\\d+)?$", body))
      Some(sign * java.lang.Double.parseDouble(body))
    else None
  }

  /** Python 2 `int(str)` (base 10): strips whitespace, optional sign,
    * decimal digits only. None where Python raises ValueError (and on
    * Int overflow — Python promotes to long there; no caller feeds
    * >10-digit values meaningfully). */
  def pyIntOption(s: String): Option[Int] = {
    val t = strip(s)
    val ok = t.nonEmpty && {
      val d = if (t.charAt(0) == '+' || t.charAt(0) == '-') t.substring(1) else t
      d.nonEmpty && d.forall(c => c >= '0' && c <= '9')
    }
    if (ok) t.toIntOption else None
  }

  /** UTF-8 byte length — Python 2 `len()` of a byte-`str` read from a
    * utf-8 file (`extractors5/http_feature.py:151-152`). Counted
    * without materializing the byte array (this runs per http block on
    * the extract hot path); unpaired surrogates count 1, matching
    * Java's `getBytes` '?' replacement. */
  def byteLen(s: String): Int = {
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < len &&
               Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else if (Character.isSurrogate(c)) n += 1 // unpaired → '?'
      else n += 3
      i += 1
    }
    n
  }
}
