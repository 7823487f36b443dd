package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness scheduling: a deterministic token bucket
  * expressed as pure window computations (SURVEY.md §2.5) — no UDF, no
  * state, reproducible under any parallelism.
  *
  * Each host h has a crawl delay `delayMs(h)` (a robots.txt
  * `Crawl-delay` stand-in, synthesized deterministically from the host
  * string — the same formula as `Synth.delayMsSql` so DuckDB oracles
  * agree). A wave of length `wavePeriodMs` grants
  * `tokens(h) = max(1, wavePeriodMs / delayMs(h))` fetches to h.
  * Rank URLs per host by (priority, seq); a URL with per-host rank r
  * runs in wave `floor((r-1) / tokens(h))` relative waves after it
  * first becomes eligible.
  *
  * The shuffle here is BY HOST — the skew-prone key. Hot hosts are rare
  * but huge in Common-Crawl frontiers; the window itself is safe (rank
  * per host is a sort within the host's partition — AQE skew handling
  * splits oversized partitions for the sort), and the downstream
  * fetch/extract work is re-spread by [[Skew.salt]].
  */
object Politeness {

  /** Deterministic robots stand-in: crawl delay per host in ms. */
  def delayMs(host: String): Long = (host.length % 4 + 1) * 100L

  val delayMsCol: org.apache.spark.sql.Column =
    (length(col("host")) % 4 + 1).cast("long") * 100L

  /** Annotate a frontier slice with per-host rank and the relative wave
    * each row may run in. Requires columns: host, priority, seq.
    *
    * Delay source, in priority order: a `crawl_delay_ms` column already
    * present on `ready` (the robots rules-table join, [[Robots.rulesTable]]
    * — null falls back to the formula), else an optional small
    * `(host, crawl_delay_ms)` table broadcast-joined here, else the
    * deterministic formula. */
  def schedule(ready: DataFrame, wavePeriodMs: Long,
      delays: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy("host").orderBy(col("priority").asc, col("seq").asc)
    val withDelay =
      if (ready.columns.contains("crawl_delay_ms"))
        ready.withColumn("delay_ms", coalesce(col("crawl_delay_ms"), delayMsCol))
      else delays match {
        case Some(d) =>
          ready.join(broadcast(d.select(col("host"), col("crawl_delay_ms"))), Seq("host"), "left")
            .withColumn("delay_ms", coalesce(col("crawl_delay_ms"), delayMsCol))
            .drop("crawl_delay_ms")
        case None => ready.withColumn("delay_ms", delayMsCol)
      }
    withDelay
      .withColumn("host_rank", row_number().over(w))
      .withColumn("tokens", greatest(lit(1L), floor(lit(wavePeriodMs) / col("delay_ms")).cast("long")))
      .withColumn("rel_wave", floor((col("host_rank") - 1) / col("tokens")).cast("int"))
      .drop("delay_ms")
  }

  /** The rows allowed to fetch this wave (relative wave 0). */
  def eligibleNow(scheduled: DataFrame): DataFrame =
    scheduled.where(col("rel_wave") === 0)
      .drop("host_rank", "tokens", "rel_wave")
}

/** Host-domain skew handling (SURVEY.md §4.3): two-level salting.
  * `saltsFor(host)` scales with the host's row count this wave, so one
  * hot host's fetch/extract work spreads over many tasks instead of one
  * straggler partition. */
object Skew {

  /** Add a `salt` column: pmod(xxhash64(url), salts(host)) where
    * salts(host) = ceil(cnt / rowsPerSalt), computed per wave from a
    * cheap groupBy(host).count (tiny aggregate, broadcast back). */
  def salt(rows: DataFrame, rowsPerSalt: Long = 10000L): DataFrame = {
    val counts = rows.groupBy("host").agg(count(lit(1)).as("host_cnt"))
    rows.join(broadcast(counts), "host")
      .withColumn("salts", greatest(lit(1L), ceil(col("host_cnt").cast("double") / rowsPerSalt).cast("long")))
      .withColumn("salt", pmod(xxhash64(col("url")), col("salts")).cast("int"))
      .drop("host_cnt", "salts")
  }

  /** Spread the wave's work by the salted key before the heavy map
    * stages. Range partitioning keeps same-host-same-salt rows together
    * (politeness accounting stays local) while splitting hot hosts. */
  def spread(salted: DataFrame, partitions: Int): DataFrame =
    salted.repartitionByRange(partitions, col("host"), col("salt"), col("seq"))
}
