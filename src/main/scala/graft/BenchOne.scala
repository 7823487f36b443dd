package graft

import org.apache.spark.sql.SparkSession

/** One isolated crawl measurement (forked by [[Bench]] for the scaling
  * section so each parallelism level gets a fresh JVM — sequential
  * sessions in one JVM showed progressive degradation that contaminates
  * the comparison). Prints exactly one line: `RESULT <urls> <sec>`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, cpusS, repS) = args
    val cpus = cpusS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-one-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm JIT on the small dir, then measure
    Bench.crawlRun(spark, "/root/testdata/sf0.01", rep = 1)
    val (urls, sec) = Bench.crawlRun(spark, sfDir, repS.toInt)
    println(s"RESULT $urls $sec")
    spark.stop()
  }
}
