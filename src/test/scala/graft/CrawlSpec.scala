package graft

import graft.fixtures.Fixtures
import graft.frontier.Politeness
import graft.jobs.CrawlWave
import graft.store.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end crawl-engine properties on the sf0.001 fixture space:
  * crawl order under politeness, URL-seen set, byte identity, resume
  * from snapshot, and partition-count invariance (SURVEY.md §5.2 #3/#4). */
class CrawlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  // short wave period → multi-wave schedules even at sf0.001
  private def cfg(parts: Int) = CrawlWave.Config(wavePeriodMs = 3000L, partitions = parts)

  private def runCrawl(parts: Int): SnapshotTable = {
    val root = Files.createTempDirectory("crawl-").toString
    val store = new SnapshotTable(spark, root)
    val pages = Fixtures.pages(spark, dir).toDF.cache()
    new CrawlWave(spark, pages, store, cfg(parts)).runAll(Fixtures.seeds(spark, dir))
    pages.unpersist()
    store
  }

  private lazy val store = runCrawl(4)
  private lazy val frontier = store.readLatest("frontier").get.cache()

  /** Robots-allowed predicate over (host, url) — the live parser on the
    * deterministic fixture robots.txt. */
  private val robotsAllowedUdf = udf { (host: String, url: String) =>
    graft.frontier.Robots.parse(graft.frontier.Robots.synthTxt(host))
      .isAllowed(graft.frontier.Robots.pathOf(url))
  }

  /** Distinct fetchable URLs that robots.txt also allows. */
  private def expectedCrawled: Long = Fixtures.seeds(spark, dir)
    .where(expr(graft.jobs.Synth.fetchableWhere))
    .select("url").distinct()
    .withColumn("host", CrawlWave.crawlerDomainUdf(col("url")))
    .where(robotsAllowedUdf(col("host"), col("url")))
    .count()

  test("frontier drains: no ready rows; every fetchable allowed URL done or error") {
    assert(frontier.where(col("state") === "ready").count() == 0)
    assert(frontier.where(col("state") === "denied_robots").count() > 0)
    assert(frontier.where(col("state").isin("done", "error")).count() == expectedCrawled)
  }

  test("multi-wave schedule used (not a trivial single wave)") {
    assert(frontier.agg(max("wave")).head.getInt(0) >= 2)
  }

  test("engine wave assignment equals the static politeness window schedule") {
    val done = frontier.where(col("state").isin("done", "error"))
      .select("seq", "url", "host", "priority", "wave")
    val static = Politeness.schedule(
      done.select("seq", "url", "host", "priority"), 3000L)
      .select(col("seq").as("s2"), col("rel_wave"))
    val joined = done.join(static, col("seq") === col("s2"))
    assert(joined.where(col("wave") =!= col("rel_wave")).count() == 0)
  }

  test("per-host crawl order preserves (priority, seq) order across waves (§2.5)") {
    import spark.implicits._
    val bad = frontier.where(col("state").isin("done", "error"))
      .groupBy("host")
      .agg(collect_list(struct(col("wave"), col("priority"), col("seq"))).as("l"))
      .as[(String, Seq[(Int, Int, Long)])]
      .filter { case (_, l) =>
        val sorted = l.sortBy(x => (x._2, x._3)) // by (priority, seq)
        sorted.zip(sorted.tail).exists { case (a, b) => a._1 > b._1 } // wave monotone
      }
    assert(bad.count() == 0)
  }

  test("priority queue: within a host, high-priority URLs never crawl after lower") {
    import spark.implicits._
    // for each host: max wave of priority-0 rows <= min wave of priority-2
    // rows beyond the first wave's token grant (weak form: wave of any
    // p=0 row <= wave of any p=2 row with smaller seq never violated by
    // more than the shared-wave case handled by the monotone test above)
    val rows = frontier.where(col("state").isin("done", "error"))
      .select("host", "priority", "wave", "seq")
      .as[(String, Int, Int, Long)].collect()
    val byHost = rows.groupBy(_._1)
    val violations = byHost.values.flatMap { hs =>
      val p0max = hs.filter(_._2 == 0).map(_._3).maxOption
      val p2min = hs.filter(_._2 == 2).map(_._3).minOption
      for (a <- p0max; b <- p2min; if a > b) yield (a, b)
    }
    assert(violations.isEmpty)
  }

  test("URL-seen set equals the distinct allowed URL set; idempotent re-offer") {
    val seen = store.readLatest("seen").get
    val expected = expectedCrawled
    assert(seen.count() == expected)
    assert(seen.select("url_hash").distinct().count() == expected)
    // re-offering the whole seed list schedules nothing new
    val pages = Fixtures.pages(spark, dir).toDF
    val cw = new CrawlWave(spark, pages, store, cfg(4))
    assert(cw.step().isEmpty)
  }

  test("all alive samples are byte-identical to the golden text column") {
    val samples = store.readLatest("samples").get
    assert(samples.count() > 0)
    assert(samples.where(!col("render_match")).count() == 0)
  }

  test("error channel carries drops, liveness kills and fetch misses") {
    import spark.implicits._
    val errs = store.readLatest("errors").get
      .select("err").as[String].collect().toSet
    assert(errs.exists(_.startsWith("skip this file")))  // S3 ext skip
    assert(errs.contains("skip this file(scheme)"))      // S2 ftp drop
    assert(errs.contains("duplicate url"))
    assert(errs.contains("fetch failed (no response)"))  // S4 miss
    assert(errs.exists(e => e == "404" || e == "503"))   // P3 status
    assert(errs.exists(_.startsWith("not web page")))    // P1 content-type
    assert(errs.exists(_.startsWith("page not found")))  // P2 title
    assert(errs.contains("robots.txt disallow"))         // robots deny
  }

  test("resume from an interrupted run converges to the identical final state") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-resume-").toString
    val st = new SnapshotTable(spark, root)
    val pages = Fixtures.pages(spark, dir).toDF.cache()
    // phase 1: init + 2 waves, then "crash"
    val cw1 = new CrawlWave(spark, pages, st, cfg(4))
    cw1.init(Fixtures.seeds(spark, dir))
    cw1.step(); cw1.step()
    // phase 2: a brand-new engine over the same store resumes
    val cw2 = new CrawlWave(spark, pages, st, cfg(4))
    cw2.runAll(Fixtures.seeds(spark, dir))
    pages.unpersist()
    def key(s: SnapshotTable) = s.readLatest("frontier").get
      .select("seq", "state", "wave").as[(Long, String, Int)].collect().toSet
    assert(key(st) == key(store))
    assert(st.readLatest("samples").get.count() ==
      store.readLatest("samples").get.count())
  }

  test("result is invariant under task parallelism (local partition count)") {
    import spark.implicits._
    val st2 = runCrawl(2)
    def waves(s: SnapshotTable) = s.readLatest("frontier").get
      .where(col("state").isin("done", "error"))
      .select("seq", "wave").as[(Long, Int)].collect().toSet
    assert(waves(st2) == waves(store))
  }

  test("pipelined commits produce the identical crawl (async flush, ordered publishes)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-pipe-").toString
    val st = new SnapshotTable(spark, root)
    val pages = Fixtures.pages(spark, dir).toDF.cache()
    new CrawlWave(spark, pages, st, cfg(4).copy(pipelineCommits = true))
      .runAll(Fixtures.seeds(spark, dir))
    pages.unpersist()
    def key(s: SnapshotTable) = s.readLatest("frontier").get
      .select("seq", "state", "wave").as[(Long, String, Int)].collect().toSet
    assert(key(st) == key(store))
    assert(st.readLatest("samples").get.count() ==
      store.readLatest("samples").get.count())
  }

  test("cuckoo seen-filter produces the identical crawl (bloom/cuckoo interchangeable)") {
    import spark.implicits._
    val root = Files.createTempDirectory("crawl-cuckoo-").toString
    val st = new SnapshotTable(spark, root)
    val pages = Fixtures.pages(spark, dir).toDF.cache()
    new CrawlWave(spark, pages, st,
      cfg(4).copy(seenFilter = "cuckoo", cuckooCapacityPerPartition = 1 << 16))
      .runAll(Fixtures.seeds(spark, dir))
    pages.unpersist()
    def key(s: SnapshotTable) = s.readLatest("frontier").get
      .select("seq", "state", "wave").as[(Long, String, Int)].collect().toSet
    assert(key(st) == key(store))
    assert(st.readLatest("seen").get.count() == store.readLatest("seen").get.count())
  }
}
