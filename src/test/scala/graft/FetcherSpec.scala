package graft

import graft.fixtures.Fixtures
import graft.jobs.{CrawlWave, TransportFetcher}
import graft.store.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The [[graft.jobs.Fetcher]] seam (SURVEY.md §2.1 S4): the engine must
  * produce IDENTICAL crawls through the default page-store join and
  * through the live-deployment [[TransportFetcher]] shape (host-
  * clustered mapPartitions over an injected transport function — here
  * map-backed: the sandbox has no network, so the HTTP client slot is
  * exercised with the same fixture pages served per-URL). */
class FetcherSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private def cfg = CrawlWave.Config(wavePeriodMs = 3000L, partitions = 4)

  private def crawl(fetcher: Option[graft.jobs.Fetcher]): SnapshotTable = {
    val root = Files.createTempDirectory("fetchseam-").toString
    val store = new SnapshotTable(spark, root)
    val pages = Fixtures.pages(spark, dir).toDF.cache()
    new CrawlWave(spark, pages, store, cfg, fetcher).runAll(Fixtures.seeds(spark, dir))
    pages.unpersist()
    store
  }

  /** Canonical comparable projection (features via json hash — the
    * column is Array[Double], case-class equality is reference-based). */
  private def canon(df: DataFrame, cols: Seq[String]): DataFrame = {
    val base = df.select(cols.map(col): _*)
    if (cols.contains("features"))
      base.withColumn("features", xxhash64(to_json(struct(col("features")))))
    else base
  }

  private def assertSame(a: DataFrame, b: DataFrame, cols: Seq[String]): Unit = {
    val (ca, cb) = (canon(a, cols), canon(b, cols))
    assert(ca.count() == cb.count())
    assert(ca.except(cb).isEmpty && cb.except(ca).isEmpty)
  }

  test("transport fetcher reproduces the page-join crawl exactly (frontier, samples, errors)") {
    val byJoin = crawl(None)

    // the transport: fixture pages served per URL from a broadcast map,
    // golden fingerprint included so render_match agrees with the join
    val served = Fixtures.pages(spark, dir).collect()
      .map(p => p.url -> TransportFetcher.Result(p.html,
        p.warc_ts.toInstant.getEpochSecond,
        Option(p.text).map(CrawlWave.hashText)))
      .toMap
    val bc = spark.sparkContext.broadcast(served)
    // capture the BROADCAST in the transport closure (the map ships once
    // per executor, not once per task) — the pattern a live impl follows
    // for its connection-pool config
    val byTransport = crawl(Some(new TransportFetcher(u => bc.value.get(u), partitions = 4)))

    val fCols = Seq("seq", "url", "host", "state", "wave")
    assertSame(byJoin.readLatest("frontier").get,
      byTransport.readLatest("frontier").get, fCols)
    val sCols = Seq("seq", "url", "host", "wave", "ok", "err", "text",
      "features", "render_match")
    assertSame(byJoin.readLatest("samples").get,
      byTransport.readLatest("samples").get, sCols)
    assertSame(byJoin.readLatest("errors").get,
      byTransport.readLatest("errors").get,
      Seq("seq", "url", "host", "wave", "ok", "err"))
  }

  test("httpSkeleton documents the live slot and refuses in-sandbox use") {
    val t = TransportFetcher.httpSkeleton("graftbot")
    val e = intercept[UnsupportedOperationException](t("http://example.com/"))
    assert(e.getMessage.contains("async-HTTP"))
  }
}
