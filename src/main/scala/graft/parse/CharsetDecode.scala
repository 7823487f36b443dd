package graft.parse

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.ByteBuffer

/** Charset resolution + decode mirroring `_get_content`
  * (`/root/reference/spider.py:426-450`, P4):
  *
  *  1. look for a `<meta ... charset=X>` declaration in the (ASCII-
  *     decoded) head of the body; when present and different from the
  *     transport charset, the meta charset wins (spider.py:440-449:
  *     `response.encoding` is overridden before `.text` decodes);
  *  2. otherwise use the transport (header) charset; absent both, utf-8
  *     (the sandbox stand-in for requests' chardet guess — the per-line
  *     strict-utf-8 ladder further down `_get_content` sits AFTER the
  *     `return response.text` at :450 and is dead code);
  *  3. ONE decode with that charset, errors REPLACE — exactly requests'
  *     `response.text` (`unicode(content, encoding, errors='replace')`);
  *     an unknown charset name takes requests' LookupError fallback:
  *     ascii with REPLACE.
  *
  * Pure function of (bytes, headerCharset); runs inside the extract
  * `map` — a byte-identity hot spot, kept dependency-free.
  */
object CharsetDecode {

  private val metaCharsetRe =
    java.util.regex.Pattern.compile(
      """(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""")

  /** The declared meta charset of an HTML body head, if any. */
  def metaCharset(bytes: Array[Byte]): Option[String] = {
    val headLen = math.min(bytes.length, 4096)
    val head = new String(bytes, 0, headLen, java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = metaCharsetRe.matcher(head)
    if (m.find()) Option(m.group(1)) else None
  }

  private def tryDecode(bytes: Array[Byte], cs: Charset, onError: CodingErrorAction): Option[String] =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(onError)
        .onUnmappableCharacter(onError)
      Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  private def charsetOf(name: String): Option[Charset] =
    try Some(Charset.forName(name)) catch { case _: Exception => None }

  /** Resolve + decode. `headerCharset` = charset parameter of the
    * Content-Type header, when present. */
  def decode(bytes: Array[Byte], headerCharset: Option[String]): String = {
    val declared = metaCharset(bytes).orElse(headerCharset).getOrElse("utf-8")
    charsetOf(declared) match {
      case Some(cs) =>
        // REPLACE never throws for the standard charsets; the guard
        // covers exotic Charset implementations only
        tryDecode(bytes, cs, CodingErrorAction.REPLACE)
          .getOrElse(asciiReplace(bytes))
      case None => asciiReplace(bytes) // requests' LookupError fallback
    }
  }

  private def asciiReplace(bytes: Array[Byte]): String =
    tryDecode(bytes, java.nio.charset.StandardCharsets.US_ASCII, CodingErrorAction.REPLACE)
      .getOrElse(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))

  /** Plain `utf-8` decode with replacement — the FTP path's
    * `r.decode('utf-8', errors='replace')` (`spider.py:158`), with NO
    * meta-charset sniffing and NO fallback ladder (the reference FTP
    * code never consults headers or `<meta>` tags). */
  def decodeUtf8Replace(bytes: Array[Byte]): String =
    tryDecode(bytes, java.nio.charset.StandardCharsets.UTF_8, CodingErrorAction.REPLACE)
      .getOrElse(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))

  /** Charset parameter of a Content-Type header value, if any. */
  def headerCharset(contentType: String): Option[String] = {
    val i = graft.py.Py.lowerAscii(contentType).indexOf("charset=")
    if (i < 0) None
    else {
      val v = contentType.substring(i + 8).takeWhile(c => c != ';' && c != ' ')
      if (v.isEmpty) None else Some(v.stripPrefix("\"").stripSuffix("\""))
    }
  }
}
