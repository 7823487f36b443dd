package graft

import graft.fixtures.{Fixtures, NetSynth}
import graft.parse.{CharsetDecode, SampleRender}
import graft.crawl.Liveness
import graft.features.{ExtractConfig, ExtractorSet5}
import org.apache.spark.sql.SparkSession

/** Dev-only: multithreaded microbenchmark of the pure per-row fetch
  * pipeline (decode → liveness → render → extract), Spark-free after
  * fixture synthesis. Measures per-thread throughput at 1..N threads to
  * separate JVM/memory-bandwidth scaling of the hot function from
  * Spark-layer effects. */
object HotBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val threadsList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(1, 2, 8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = Fixtures.pages(spark, dir, 1).collect()
    spark.stop()
    println(s"pages=${pages.length}")

    def work(slice: Array[graft.model.PageRow]): Long = {
      var acc = 0L
      slice.foreach { p =>
        val ct = NetSynth.contentTypeOf(p.url)
        val content = CharsetDecode.decode(p.html, CharsetDecode.headerCharset(ct))
        val synth = NetSynth.forUrlNoBody(p.url, content.length)
        val verdict = Liveness.isAlive(Some(synth.contentType), content, synth.status)
        if (verdict.alive) {
          val text = SampleRender.render(p.url, content, synth.net)
          val features = ExtractorSet5.extract(text, ExtractConfig(p.warc_ts.toInstant.getEpochSecond))
          acc += features.length + text.length
        }
      }
      acc
    }

    // JIT warmup
    (1 to 3).foreach(_ => work(pages))

    threadsList.foreach { n =>
      val reps = 4 // each thread processes the full page set `reps` times
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        val t = new Thread(() => { (1 to reps).foreach(_ => work(pages)) })
        t.start(); t
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = pages.length.toLong * reps * n
      println(f"threads=$n rows=$rows sec=$sec%.2f rows/sec=${rows / sec}%.0f per-thread=${rows / sec / n}%.0f")
    }
  }
}
