package graft

import graft.fixtures.Fixtures
import org.apache.spark.sql.SparkSession

/** Dev tool: materialize the bench fixtures (pages + replicated seeds)
  * once at full parallelism so scripted scaling legs (tools/, BenchOne
  * arg 4) skip per-fork synthesis. Usage: FixPrep <sfDir> <rep> <outDir>. */
object FixPrep {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, rep, out) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Fixtures.pages(spark, sfDir, rep.toInt).toDF.write.parquet(s"$out/pages")
    Fixtures.seeds(spark, sfDir, rep.toInt).write.parquet(s"$out/seeds")
    println(s"FIXTURES $out")
    spark.stop()
  }
}
