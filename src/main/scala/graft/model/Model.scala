package graft.model

/** One hop of an HTTP response chain (requests `Response` essentials).
  * `headers` keeps insertion order — requests' CaseInsensitiveDict is
  * backed by an OrderedDict, and `spider.py:508-509` iterates it when
  * rendering the HEADER block. */
case class HeaderHop(
    url: String,
    version: Int, // raw.version, e.g. 11 → "HTTP/1.1" (spider.py:507)
    status: Int,
    reason: String,
    headers: Seq[(String, String)])

/** Network-derived inputs of one fetched URL — everything `spider.py`
  * obtains from subprocesses (`nslookup`/`host`/`whois`, :62-93) and the
  * HTTP response chain, which our engine "fetches" by joining the pages
  * table (SURVEY.md §2.1 S4/S5). These are fixture-synthesized in the
  * sandbox; the block FORMAT is the byte-identity target. */
case class NetInfo(
    nslookupSoaOut: String, // `nslookup -type=soa <domain>` stdout (spider.py:65)
    nslookupOut: String,    // `nslookup <domain>` stdout (spider.py:68)
    hostOut: String,        // `host <domain>` stdout (spider.py:75)
    whoisOut: String,       // `whois <domain>` stdout (spider.py:82)
    finalHop: HeaderHop,
    history: Seq[HeaderHop], // redirect history, oldest first (requests order)
    timerSeconds: Double)    // fetch wall seconds (spider.py:188,246)

/** Typed row of the primary input table (BASELINE.json input_hint). */
case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)
