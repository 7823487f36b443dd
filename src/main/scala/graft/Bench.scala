package graft

import graft.fixtures.Fixtures
import graft.jobs.CrawlWave
import graft.store.SnapshotTable
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): headline queries + the full
  * crawl+extract pipeline on `SPARK_GRAFT_SF_DIR`, one JSON line on
  * stdout.
  *
  * The north metric is URLs fetched+extracted/sec
  * (`BASELINE.json:metric`), reported as `throughput_urls_per_sec`.
  *
  * Scaling protocol (BASELINE.md): `SPARK_GRAFT_SCALING=1` additionally
  * re-runs the crawl pipeline at local[8] and local[32] on the same
  * input (the sandbox stand-in for N vs 4N executors — no real cluster
  * exists here) and reports both throughputs plus
  * `efficiency = (T8 / T32) / 4`.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full crawl+extract run; returns (urls processed, seconds). */
  def crawlRun(spark: SparkSession, sfDir: String): (Long, Double) = {
    val root = java.nio.file.Files.createTempDirectory("graft-bench-").toString
    val pages = Fixtures.pages(spark, sfDir).toDF.cache()
    pages.count() // materialize the fixture outside the timed window
    val seeds = Fixtures.seeds(spark, sfDir).cache()
    seeds.count()
    val store = new SnapshotTable(spark, root)
    val cw = new CrawlWave(spark, pages, store, CrawlWave.Config(
      wavePeriodMs = 600000L, // few waves at bench scale; politeness still active
      partitions = spark.sparkContext.defaultParallelism))
    val t0 = System.nanoTime()
    cw.runAll(seeds)
    val sec = (System.nanoTime() - t0) / 1e9
    val urls = store.readLatest("frontier").get
      .where("state in ('done','error')").count()
    pages.unpersist(); seeds.unpersist()
    (urls, sec)
  }

  // headline query subset (heaviest, most representative operators)
  private val headline = Seq(
    "w_politeness_schedule", "w_crawl_order", "j_dedup_first_seen",
    "url_features", "extract_features_full", "byte_identity",
    "tok_terms", "tfidf_micro", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "ann_brute_topk", "ann_lsh_topk",
    "lang_id", "quality", "token_counts", "fingerprints",
    "multimodal_decode")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    val qTimes = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    val (urls, crawlSec) = crawlRun(spark, sfDir)
    val urlsPerSec = urls / crawlSec

    val scaling: String =
      if (sys.env.get("SPARK_GRAFT_SCALING").contains("1")) {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        val s8 = session(8)
        val (u8, t8) = crawlRun(s8, sfDir)
        s8.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        val s32 = session(32)
        val (u32, t32) = crawlRun(s32, sfDir)
        s32.stop()
        val eff = (t8 / t32) / 4.0
        s""","scaling":{"urls":$u8,"local8_sec":$t8,"local8_urls_per_sec":${u8 / t8},"local32_sec":$t32,"local32_urls_per_sec":${u32 / t32},"efficiency_8_to_32":$eff}"""
      } else ""

    val qs = qTimes.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = qTimes.map(_._2).sum + crawlSec
    println(s"""{"metric":"crawl+extract urls/sec + headline ops","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl_urls":$urls,"crawl_sec":$crawlSec,"throughput_urls_per_sec":$urlsPerSec$scaling}""")
    if (scaling.isEmpty) spark.stop()
  }
}
