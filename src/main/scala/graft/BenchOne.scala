package graft

import org.apache.spark.sql.SparkSession

/** One isolated crawl measurement (forked by [[Bench]] for the scaling
  * section so each parallelism level gets a fresh JVM — sequential
  * sessions in one JVM showed progressive degradation that contaminates
  * the comparison). An optional 4th arg points at a pre-materialized
  * fixture dir (`pages`/`seeds` parquet written once by the parent) so
  * forks skip fixture synthesis. Prints one line:
  * `RESULT <urls> <totalSec> <waveSec>` (waveSec = post-init steady
  * state, see Bench.crawlRunOn). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val rep = args(2).toInt
    val fixtureDir = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-one-$cpus")
      // SPARK_GRAFT_CRAWL_PARTS (set by Bench's scaling forks): both
      // levels of an N->4N window run the SAME layout, sized for the
      // larger level — a deployment does not re-partition its data when
      // the job lands on a smaller cluster
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_CRAWL_PARTS").map(_.toInt).getOrElse(
          cpus * sys.env.getOrElse("SPARK_GRAFT_PARTS_PER_CORE", "3").toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dev: SPARK_GRAFT_JOBLOG=1 prints a job timeline (start/end ms +
    // description) — the gaps between jobs are the driver-serial time
    // the scaling analysis hunts
    if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // properties itself may be null (job with no local properties)
          def p(k: String) =
            Option(js.properties).flatMap(ps => Option(ps.getProperty(k))).getOrElse("")
          println(s"JOBSTART ${js.jobId} ${js.time} ${p("spark.job.description")} ${p("callSite.short")}")
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          println(s"JOBEND ${je.jobId} ${je.time}")
      })
    // warm JIT on the smallest dir, then measure. sf0.001 exercises the
    // same code paths (all hot loops reach C2 during the first timed
    // wave anyway — the timed runs are 100+ s); sf0.01 warmup cost
    // ~30 s per 2-core fork, which starved the interleaved repeats out
    // of the driver's bench budget under host noise
    Bench.crawlRun(spark,
      sys.env.getOrElse("SPARK_GRAFT_WARM_SF", "/root/testdata/sf0.001"), rep = 1)
    // drive the per-URL extract pipeline to C2 before the timed run —
    // the tiny crawl above warms Spark's machinery but not the hot
    // loops' invocation counts (see Bench.warmExtract)
    Bench.warmExtract(threads = cpus)
    val (urls, sec, waveSec) = fixtureDir match {
      case Some(d) => Bench.crawlRunOn(spark,
        spark.read.parquet(s"$d/pages"), spark.read.parquet(s"$d/seeds"), rep)
      case None => Bench.crawlRun(spark, sfDir, rep)
    }
    println(s"RESULT $urls $sec $waveSec")
    spark.stop()
  }
}
