package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fetch seam (SURVEY.md §2.1 S4): how a planned frontier slice
  * becomes fetched bytes.
  *
  * `fetch` receives the generation's ready rows as a DataFrame with
  * columns `(seq, url, host, wave, url_hash)` and must return those
  * SAME rows (no drops, no additions — the wave accounting downstream
  * assumes a bijection) extended with the fetch-result columns
  * `(warc_ts: timestamp?, html: binary?, text_hash: long?)`, i.e. the
  * [[CrawlWave.FetchRow]] schema. A miss/failed fetch is `html = null`
  * — [[CrawlWave.fetchOutcome]] turns it into the reference's
  * requests-exception error row (spider.py:208-244). `text_hash` is the
  * optional golden-render fingerprint; a live fetch has no golden and
  * leaves it null (render_match then reads false = "no golden", a
  * metric, never control flow).
  *
  * Implementations own their distribution shape; the engine only
  * requires that cost be O(slice), never O(page store). */
trait Fetcher extends Serializable {
  def fetch(slice: DataFrame): DataFrame
}

/** The sandbox/design-point fetcher: ONE co-partitioned shuffled-hash
  * LEFT join against a url-partitioned pages table (the stand-in for
  * HTTP GET over a Common-Crawl-style page store — at the 10^10 design
  * point, a bucketed join against the url-bucketed store). Only the
  * slice shuffles (hash by url — uniform keys, host skew cannot survive
  * the layout); `pagesByUrl` is pre-partitioned + cached by the caller
  * and scanned once per crawl generation, with the hash built on the
  * slice side (BuildLeft). */
final class PageJoinFetcher(pagesByUrl: DataFrame, partitions: Int) extends Fetcher {
  def fetch(slice: DataFrame): DataFrame =
    slice
      .repartition(partitions, col("url"))
      .hint("SHUFFLE_HASH")
      .alias("f")
      .join(pagesByUrl.alias("p"), col("f.url") === col("p.url"), "left")
      .select(col("f.seq").as("seq"), col("f.url").as("url"),
        col("f.host").as("host"), col("f.wave").as("wave"),
        col("f.url_hash").as("url_hash"),
        col("p.warc_ts").as("warc_ts"), col("p.html").as("html"),
        col("p.text_hash").as("text_hash"))
}

object TransportFetcher {
  /** One fetched page from a transport: raw bytes + capture time (epoch
    * seconds; surfaces as `warc_ts`) + optional golden fingerprint.
    * Plain primitives so the row builder needs no encoder gymnastics. */
  final case class Result(html: Array[Byte], epochSeconds: Long,
      textHash: Option[Long] = None)

  /** The live-HTTP slot, documented: a real deployment implements
    * `Transport` over an async HTTP client (e.g. java.net.http
    * HttpClient.sendAsync) — issue up to `maxInFlight` requests per
    * partition, await completions as an iterator, reuse connections
    * per host (the host-clustered partitioning below guarantees one
    * partition sees one host's URLs contiguously). This sandbox has no
    * network egress, so the skeleton throws; every OTHER moving part
    * (partitioning, row shape, null-on-miss, politeness co-location)
    * is the real one and is exercised by FetcherSpec through a
    * map-backed transport. */
  def httpSkeleton(userAgent: String): String => Option[Result] =
    url => throw new UnsupportedOperationException(
      s"live HTTP transport not available in this sandbox (UA=$userAgent, url=$url); " +
        "slot an async-HTTP client here — see TransportFetcher.httpSkeleton doc")
}

/** Transport-backed fetcher: the live-deployment shape. The slice is
  * hash-clustered by HOST (so a partition holds whole hosts — the
  * politeness delay budget and any keep-alive connection pool are
  * per-host local state, never split across tasks) and the transport
  * function runs inside `mapPartitions`, cost O(slice) with zero reads
  * of any page store. `transport` must be serializable (capture
  * broadcasts, not driver maps). */
final class TransportFetcher(transport: String => Option[TransportFetcher.Result],
    partitions: Int) extends Fetcher {
  def fetch(slice: DataFrame): DataFrame = {
    val spark = slice.sparkSession
    import spark.implicits._
    slice
      .select(col("seq"), col("url"), col("host"), col("wave"), col("url_hash"))
      .repartition(partitions, col("host"))
      .as[(Long, String, String, Int, Long)]
      .mapPartitions { rows =>
        rows.map { case (seq, url, host, wave, urlHash) =>
          transport(url) match {
            case Some(r) => CrawlWave.FetchRow(seq, url, host, wave, urlHash,
              Some(new java.sql.Timestamp(r.epochSeconds * 1000L)),
              Some(r.html), r.textHash)
            case None => CrawlWave.FetchRow(seq, url, host, wave, urlHash,
              None, None, None)
          }
        }
      }
      .toDF()
  }
}
