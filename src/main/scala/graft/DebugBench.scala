package graft

import graft.fixtures.Fixtures
import graft.jobs.CrawlWave
import graft.store.SnapshotTable
import org.apache.spark.sql.SparkSession

/** Dev-only: per-wave timing of the crawl engine at a given sf/cpus. */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 8
    val rep = if (args.length > 2) args(2).toInt else 1
    val warmup = args.length > 3 && args(3) == "warm"
    if (warmup) {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      Bench.crawlRun(s, "/root/testdata/sf0.01", rep = 1)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      println("warmup done")
    }
    // match the bench scaling forks' layout when set (see Bench.fixedParts)
    val parts = sys.env.get("SPARK_GRAFT_CRAWL_PARTS").map(_.toInt).getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.eventLog.enabled", sys.env.contains("SPARK_GRAFT_EVENTLOG"))
      .config("spark.eventLog.dir", sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall vs summed-task-time accounting + per-stage attribution
    val acct = new org.apache.spark.scheduler.SparkListener {
      import org.apache.spark.scheduler._
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val taskMs = new java.util.concurrent.atomic.AtomicLong()
      val gcMs = new java.util.concurrent.atomic.AtomicLong()
      val cpuMs = new java.util.concurrent.atomic.AtomicLong()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          cpuMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val ms = (System.nanoTime() - jobStart.getOrDefault(j.jobId, System.nanoTime())) / 1000000
        if (ms > 300) println(f"    job ${j.jobId}%3d: ${ms / 1000.0}%6.2f s")
      }
      val stageMs = sys.env.getOrElse("SPARK_GRAFT_STAGE_MS", "2000").toLong
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null && m.executorRunTime > stageMs) {
          val sw = m.shuffleWriteMetrics.writeTime / 1000000
          val sr = m.shuffleReadMetrics.fetchWaitTime
          println(f"    stage ${s.stageInfo.stageId}%3d [${s.stageInfo.name}] " +
            f"run=${m.executorRunTime / 1000.0}%.1f cpu=${m.executorCpuTime / 1e9}%.1f " +
            f"gc=${m.jvmGCTime / 1000.0}%.1f deser=${m.executorDeserializeTime / 1000.0}%.1f " +
            f"serRes=${m.resultSerializationTime / 1000.0}%.1f shW=${sw / 1000.0}%.1f shRwait=${sr / 1000.0}%.1f " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%.0fMB out=${m.outputMetrics.bytesWritten / 1e6}%.0fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB shWb=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
            f"tasks=${s.stageInfo.numTasks}")
        }
      }
      def snap(label: String): Unit = {
        println(f"  [$label] taskTime=${taskMs.get / 1000.0}%.1f s cpu=${cpuMs.get / 1000.0}%.1f s gc=${gcMs.get / 1000.0}%.1f s")
        taskMs.set(0); gcMs.set(0); cpuMs.set(0)
      }
    }
    spark.sparkContext.addSparkListener(acct)
    val root = java.nio.file.Files.createTempDirectory("graft-dbg-").toString
    val pages = Fixtures.pages(spark, dir, rep).toDF
      .repartition(parts, org.apache.spark.sql.functions.col("url")).cache()
    println(s"pages=${pages.count()}")
    val seeds = Fixtures.seeds(spark, dir, rep)
      .repartition(parts, org.apache.spark.sql.functions.col("url")).cache()
    println(s"seeds=${seeds.count()}")
    val store = new SnapshotTable(spark, root)
    val cw = new CrawlWave(spark, pages, store, CrawlWave.Config(
      wavePeriodMs = 600000L * rep, partitions = parts, repartitionPages = false,
      pipelineCommits = !sys.env.get("SPARK_GRAFT_PIPELINE").contains("0")))
    val t0 = System.nanoTime()
    var t = t0
    cw.init(seeds)
    println(f"init: ${(System.nanoTime() - t) / 1e9}%.2f s")
    acct.snap("init")
    var k = 0
    var continue = true
    while (continue) {
      t = System.nanoTime()
      continue = cw.step().isDefined
      if (continue) {
        println(f"wave $k: ${(System.nanoTime() - t) / 1e9}%.2f s")
        acct.snap(s"wave $k")
        k += 1
      }
    }
    val total = (System.nanoTime() - t0) / 1e9
    val urls = store.readLatest("frontier").get.where("state in ('done','error')").count()
    println(f"total: $total%.2f s, urls=$urls, urls/sec=${urls / total}%.0f")
    spark.stop()
    Bench.deleteRecursively(root)
  }
}
