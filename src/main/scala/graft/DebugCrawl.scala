package graft

import org.apache.spark.sql.SparkSession

/** Dev-only driver for exercising the crawl engine end-to-end. */
object DebugCrawl {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("crawl_engine_waves")(spark, dir)
    df.show(5, truncate = false)
    println("rows=" + df.count())
    val seen = SparkEntry.queries("crawl_engine_seen")(spark, dir)
    seen.show()
    spark.stop()
  }
}
