package graft

/** Dev tool: thread-scaling probe of the PURE per-URL extract pipeline
  * (synth → decode → liveness → render → block split → extract →
  * fingerprint) with no Spark, no I/O, no shuffle — isolates the
  * memory-bandwidth component of the crawl's scaling ceiling from the
  * engine's own overheads. Pin it (`taskset -c 28-31`) like the bench
  * forks. Usage: ExtractProbe [iters] [threadList e.g. 1,4]. */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 60000
    val threadLists = (if (args.length > 1) args(1) else "1,4")
      .split(",").map(_.toInt).toSeq
    // C2 warmup
    Bench.warmExtract(15000, threads = threadLists.max)
    val times = threadLists.map { n =>
      val t0 = System.nanoTime()
      Bench.warmExtract(iters, threads = n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"PROBE threads=$n iters=$iters sec=$sec")
      n -> sec
    }
    for (Seq((n1, t1), (n2, t2)) <- times.sliding(2)) {
      val eff = (t1 / t2) / (n2.toDouble / n1)
      println(f"PROBE scaling $n1->$n2 efficiency $eff%.3f")
    }
  }
}
