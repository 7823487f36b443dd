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
          // mirrors CrawlWave.fetchOutcome: direct-blocks fast path with
          // the splitText fallback
          val (text, blocksOpt) = SampleRender.renderWithBlocks(p.url, content, synth.net)
          val data = blocksOpt.getOrElse(graft.parse.Blocks.splitText(text))
          val features = ExtractorSet5.extractFromBlocks(data, ExtractConfig(p.warc_ts.toInstant.getEpochSecond))
          acc += features.length + text.length
        }
      }
      acc
    }

    // JIT warmup
    (1 to 3).foreach(_ => work(pages))

    // single-thread per-stage attribution: where does the per-URL CPU go?
    locally {
      val reps = 4
      var sink = 0L
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"  stage $label%-10s ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/pass (${(System.nanoTime() - t0) / 1e3 / (reps * pages.length)}%.1f us/row)")
      }
      val cts = pages.map(p => NetSynth.contentTypeOf(p.url))
      time("ctype") { (1 to reps).foreach(_ => pages.foreach(p => sink += NetSynth.contentTypeOf(p.url).length)) }
      val contents = pages.zip(cts).map { case (p, ct) => CharsetDecode.decode(p.html, CharsetDecode.headerCharset(ct)) }
      time("decode") { (1 to reps).foreach(_ => pages.zip(cts).foreach { case (p, ct) => sink += CharsetDecode.decode(p.html, CharsetDecode.headerCharset(ct)).length }) }
      val synths = pages.zip(contents).map { case (p, c) => NetSynth.forUrlNoBody(p.url, c.length) }
      time("synth") { (1 to reps).foreach(_ => pages.zip(contents).foreach { case (p, c) => sink += NetSynth.forUrlNoBody(p.url, c.length).status }) }
      time("liveness") { (1 to reps).foreach(_ => contents.zip(synths).foreach { case (c, s) => if (Liveness.isAlive(Some(s.contentType), c, s.status).alive) sink += 1 }) }
      val texts = pages.indices.map { i => SampleRender.render(pages(i).url, contents(i), synths(i).net) }.toArray
      time("render") { (1 to reps).foreach(_ => pages.indices.foreach { i => sink += SampleRender.render(pages(i).url, contents(i), synths(i).net).length }) }
      time("extract") { (1 to reps).foreach(_ => pages.indices.foreach { i => sink += ExtractorSet5.extract(texts(i), ExtractConfig(pages(i).warc_ts.toInstant.getEpochSecond)).length }) }
      // extract sub-stages
      time("ex:readLn") { (1 to reps).foreach(_ => texts.foreach(t => sink += graft.py.Py.readLines(t).length)) }
      val lineses = texts.map(t => graft.py.Py.readLines(t))
      time("ex:split") { (1 to reps).foreach(_ => lineses.foreach(ls => sink += graft.parse.Blocks.split(ls).blocks.size)) }
      val datas = lineses.map(ls => graft.parse.Blocks.split(ls))
      time("ex:feats") { (1 to reps).foreach(_ => pages.indices.foreach { i => sink += ExtractorSet5.extractFromBlocks(datas(i), ExtractConfig(pages(i).warc_ts.toInstant.getEpochSecond)).length }) }
      // per-extractor attribution inside extractFromBlocks
      locally {
        import graft.features._
        val urls = datas.map(_.url)
        val https = datas.map(_.blocks.getOrElse("http", Vector.empty))
        val hosts = datas.map(_.blocks.getOrElse("host", Vector.empty))
        val ns = datas.map(_.blocks.getOrElse("nslookup", Vector.empty))
        time("fx:url") { (1 to reps).foreach(_ => urls.foreach(u => sink += UrlFeatures.extract(u).length)) }
        time("fx:http") { (1 to reps).foreach(_ => pages.indices.foreach { i => sink += HttpFeatures.extract(https(i), urls(i), ExtractConfig(0L)).length }) }
        time("fx:host") { (1 to reps).foreach(_ => hosts.foreach(h => sink += HostFeatures.extract(h).length)) }
        time("fx:ns") { (1 to reps).foreach(_ => ns.foreach(h => sink += NslookupFeatures.extract(h, 0L).length)) }
        val st = https.map(bs => if (bs.isEmpty) null else bs.map(HttpFeatures.buildState).reduce((p, c) => c.absorb(p)))
        time("fx:build") { (1 to reps).foreach(_ => https.foreach(bs => if (bs.nonEmpty) sink += bs.map(HttpFeatures.buildState).reduce((p, c) => c.absorb(p)).totalRows)) }
        time("fx:strip") { (1 to reps).foreach(_ => https.foreach(bs => bs.foreach(b => sink += HttpFeatures.stripedHtmlStr(b).length))) }
        val strips = https.map(bs => bs.map(HttpFeatures.stripedHtmlStr))
        time("fx:rows") { (1 to reps).foreach(_ => strips.foreach(ss => ss.foreach(s => sink += HttpFeatures.calTagBlockRows(s, "style") + HttpFeatures.calTagBlockRows(s, "script")))) }
        time("fx:scan2") { (1 to reps).foreach(_ => https.foreach(bs => bs.foreach(b => sink += graft.html.TagScanner.scan(b).length))) }
      }
      // liveness sub-stages
      time("lv:scan") { (1 to reps).foreach(_ => contents.foreach(c => sink += graft.html.TagScanner.scan(c).length)) }
      val titleses = contents.map(c => graft.html.TagScanner.scan(c).filter(_.name == "title").map(_.text).filter(_.nonEmpty))
      time("lv:title") { (1 to reps).foreach(_ => titleses.foreach(ts => if (Liveness.titleCheck(ts).alive) sink += 1)) }
      time("hashText") { (1 to reps).foreach(_ => texts.foreach(t => sink += graft.jobs.CrawlWave.hashText(t))) }
      println(s"  (sink=$sink)")
    }

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
