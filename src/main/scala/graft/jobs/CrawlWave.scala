package graft.jobs

import graft.crawl.Liveness
import graft.features.{ExtractConfig, ExtractorSet5}
import graft.fixtures.NetSynth
import graft.frontier.{Politeness, Robots, SeenFilter, Skew}
import graft.parse.{CharsetDecode, SampleRender}
import graft.store.SnapshotTable
import graft.urls.Canonicalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl engine: an iterative-batch URL frontier + politeness
  * scheduler + fetch/extract pipeline over snapshot tables (SURVEY.md
  * §2.7/§4.4). Each wave:
  *
  *  1. select `ready` frontier rows whose politeness token-bucket grants
  *     a fetch this wave ([[Politeness]], window functions — 1 shuffle
  *     by host);
  *  2. guard with the partitioned Bloom seen-set (broadcast blobs,
  *     row-local `mightContain`) + exact anti-join for the Bloom's
  *     false positives (shuffle by url_hash only for suspects);
  *  3. salt and range-repartition by (host, salt) to defeat host skew
  *     ([[Skew]]);
  *  4. "fetch" = join against the `pages` table (the sandbox stand-in
  *     for the HTTP GET, SURVEY.md S4 — the join is keyed by `url`,
  *     broadcast or shuffled per AQE); a missing page row = fetch error;
  *  5. decode (charset ladder) → liveness screen → render sample text →
  *     byte-identity check vs the golden `text` column → feature
  *     extraction, all in ONE narrow typed map;
  *  6. update frontier states + seen set + Bloom blobs, append samples/
  *     errors, commit an atomic snapshot with per-wave lineage metrics.
  *
  * Crash/resume: every wave is one snapshot commit; a new `CrawlWave`
  * over the same store resumes from the latest published version and
  * produces identical results (tested in `CrawlSpec`).
  *
  * Scale notes (the 10^10-URL design point): the frontier, seen set and
  * results are hash/range-partitioned tables — nothing is collected to
  * the driver except the Bloom blobs (`seenPartitions` × fixed blob
  * size — partitions scale out, blob size stays broadcastable) and the
  * per-wave counters. Politeness windows shuffle by host (AQE splits
  * skewed sort partitions); the fetch join carries only the wave's
  * eligible slice, never the whole frontier.
  */
object CrawlWave {

  final case class Config(
      wavePeriodMs: Long = 1000L,
      seenPartitions: Int = 32,
      bloomBitsPerPartition: Int = 1 << 22,
      bloomHashes: Int = 5,
      rowsPerSalt: Long = 10000L,
      partitions: Int = 32,
      maxWaves: Int = 10000,
      robots: Boolean = true,
      agent: String = "graftbot",
      seenFilter: String = "bloom", // "bloom" | "cuckoo"
      cuckooCapacityPerPartition: Int = 1 << 20)

  /** One fetch outcome row (samples ∪ errors discriminated by `ok`). */
  final case class Outcome(seq: Long, url: String, host: String, wave: Int, ok: Boolean,
      err: String, text: String, features: Seq[Double], render_match: Boolean)

  final case class FetchRow(seq: Long, url: String, host: String,
      warc_ts: Option[java.sql.Timestamp], html: Option[Array[Byte]], text: Option[String])

  val crawlerDomainUdf = udf((u: String) => Canonicalize.crawlerDomain(u))

  /** Initial frontier from a seeds table (`seq`, `url`[, `priority`]):
    * scheme dispatch (S2) + image-extension skip (S3) as dropped states,
    * first-seen dedup (min seq wins, carrying that row's priority),
    * xxhash64 url identity. Priority 0 = most urgent; absent column →
    * all 0 (the reference's flat seed-order semantics). */
  def initFrontier(seeds: DataFrame): DataFrame = {
    val imageExts = Seq(".ico", ".jpg", ".png", ".pdf", ".bmp", ".tiff")
    val extCond = imageExts.map(e => lower(col("url")).endsWith(e)).reduce(_ || _)
    val firstSeen = org.apache.spark.sql.expressions.Window.partitionBy("url")
      .orderBy(col("seq").asc)
    val withPriority =
      if (seeds.columns.contains("priority")) seeds
      else seeds.withColumn("priority", lit(0))
    withPriority
      .withColumn("state",
        when(!col("url").startsWith("http"), lit("dropped_scheme"))
          .when(extCond, lit("dropped_ext"))
          .otherwise(lit("ready")))
      .withColumn("rk", row_number().over(firstSeen))
      .withColumn("state", when(col("state") === "ready" && col("rk") > 1, lit("dup")).otherwise(col("state")))
      .drop("rk")
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", crawlerDomainUdf(col("url")))
      .withColumn("wave", lit(-1))
  }

  def emptySeen(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(Int, Long)].toDF("part", "url_hash")
  }

  def emptyBlobs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(Int, Array[Byte])].toDF("part", "blob")
  }

  def emptyOutcomes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[Outcome].toDF()
  }

  def emptyMetrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(Int, Int, String, Long, Long, Long, Long)]
      .toDF("wave", "part_id", "host", "urls", "errors", "render_mismatches", "text_bytes")
  }

  /** Decode/liveness/render/extract for one fetched row — the whole
    * per-URL reference pipeline as a pure function (object-level so the
    * task closure serializes no driver state). */
  def fetchOutcome(r: FetchRow, wave: Int): Outcome = r.html match {
    case None =>
      // requests-exception analogue (spider.py:208-244, S7)
      Outcome(r.seq, r.url, r.host, wave, ok = false, "fetch failed (no response)",
        null, null, render_match = false)
    case Some(bytes) =>
      val synth = NetSynth.forUrl(r.url) // sandbox S5: per-row deterministic net info
      val content = CharsetDecode.decode(bytes,
        CharsetDecode.headerCharset(synth.contentType))
      val verdict = Liveness.isAlive(Some(synth.contentType), content, synth.status)
      if (!verdict.alive)
        Outcome(r.seq, r.url, r.host, wave, ok = false, verdict.err, null, null, render_match = false)
      else {
        val text = SampleRender.render(r.url, content, synth.net)
        val asOf = r.warc_ts.map(_.toInstant.getEpochSecond)
          .getOrElse(graft.fixtures.Fixtures.baseEpochSeconds)
        val features = ExtractorSet5.extract(text, ExtractConfig(asOf))
        Outcome(r.seq, r.url, r.host, wave, ok = true, "", text,
          features.toSeq, render_match = r.text.contains(text))
      }
  }
}

final class CrawlWave(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotTable,
    cfg: CrawlWave.Config = CrawlWave.Config()) {

  import CrawlWave._
  import spark.implicits._

  /** Compiled robots cache, built from the CURRENT frontier's ready
    * hosts (once per CrawlWave instance, not per wave; deterministic, so
    * a resumed instance rebuilds the identical cache). */
  private lazy val robotsCache: Option[org.apache.spark.broadcast.Broadcast[Map[String, Robots.Rules]]] =
    if (!cfg.robots) None
    else store.readLatest("frontier").map { f =>
      val hosts = f.where(col("state").isin("ready", "denied_robots"))
        .select("host").distinct().as[String].collect().toSeq
      Robots.broadcastCache(spark, hosts, agent = cfg.agent)
    }

  private def robotsDelays: Option[DataFrame] =
    robotsCache.map(bc => Robots.table(spark, bc.value))

  /** Commit snapshot v1 (frontier init + empty state) unless the store
    * already has a snapshot to resume from. Returns the start version.
    * Robots deny happens here: `ready` rows whose path the host's
    * robots.txt disallows become `denied_robots` + an error row — the
    * broadcast robots cache is consulted row-locally, no shuffle. */
  def init(seeds: DataFrame): Int = store.latestVersion.getOrElse {
    val frontier0 = initFrontier(seeds)
    val frontier =
      if (!cfg.robots) frontier0
      else {
        val hosts = frontier0.where(col("state") === "ready")
          .select("host").distinct().as[String].collect().toSeq
        val bc = Robots.broadcastCache(spark, hosts, agent = cfg.agent)
        val deniedUdf = udf { (host: String, url: String) =>
          !bc.value.getOrElse(host, Robots.allowAll).isAllowed(Robots.pathOf(url))
        }
        frontier0.withColumn("state",
          when(col("state") === "ready" && deniedUdf(col("host"), col("url")),
            lit("denied_robots")).otherwise(col("state")))
      }
    val initErrors = frontier
      .where(col("state").isin("dropped_scheme", "dropped_ext", "dup", "denied_robots"))
      .select(col("seq"), col("url"), col("host"), lit(-1).as("wave"), lit(false).as("ok"),
        when(col("state") === "dropped_scheme", "skip this file(scheme)")
          .when(col("state") === "dropped_ext", "skip this file")
          .when(col("state") === "denied_robots", "robots.txt disallow")
          .otherwise("duplicate url").as("err"),
        lit(null).cast("string").as("text"),
        lit(null).cast("array<double>").as("features"),
        lit(false).as("render_match"))
    store.commit(
      replace = Map("frontier" -> frontier, "seen_bloom" -> emptyBlobs(spark)),
      append = Map(
        "seen" -> emptySeen(spark),
        "samples" -> emptyOutcomes(spark).limit(0),
        "errors" -> initErrors,
        "metrics" -> emptyMetrics(spark)),
      metrics = Map("wave" -> -1L, "seeds" -> frontier.count()))
  }

  /** Run one wave; returns the committed version, or None when the
    * frontier is drained. */
  def step(): Option[Int] = {
    val v = store.latestVersion.getOrElse(
      throw new IllegalStateException("call init() first"))
    val frontier = store.read("frontier", v).cache()
    val ready = frontier.where(col("state") === "ready")
    if (ready.isEmpty) { frontier.unpersist(); return None }
    val wave = (v - 1) // wave k is committed as version k+1

    // 1. politeness gating (crawl delays from the robots cache)
    val selected = Politeness.eligibleNow(
      Politeness.schedule(ready, cfg.wavePeriodMs, robotsDelays))

    // 2. seen-set guard: Bloom/cuckoo pre-filter (broadcast blobs
    // maintained INCREMENTALLY in the snapshot — read is O(blobs), not
    // O(seen))
    val seen = store.read("seen", v)
    val blobs = store.read("seen_bloom", v)
      .as[(Int, Array[Byte])].collect()
    val filterKind = cfg.seenFilter
    val filterMap: Map[Int, SeenFilter] =
      blobs.map { case (p, b) => p -> SeenFilter.deserialize(filterKind, b) }.toMap
    val bloomBc = spark.sparkContext.broadcast(filterMap)
    val P = cfg.seenPartitions
    val mightContainUdf = udf { (h: Long) =>
      bloomBc.value.get(java.lang.Math.floorMod(h, P.toLong).toInt).exists(_.mightContain(h))
    }
    val flagged = selected.withColumn("maybe_seen", mightContainUdf(col("url_hash")))
    val clean = flagged.where(!col("maybe_seen")).drop("maybe_seen")
    val suspects = flagged.where(col("maybe_seen")).drop("maybe_seen")
      .join(seen.select("url_hash"), Seq("url_hash"), "left_anti")
    val toFetch = clean.unionByName(suspects).cache()

    // 3. skew: salt + spread the wave's work
    val spreadRows = Skew.spread(Skew.salt(toFetch, cfg.rowsPerSalt), cfg.partitions)

    // 4. fetch = left join pages on url (left → misses become error rows)
    val joined = spreadRows.alias("f")
      .join(pages.alias("p"), col("f.url") === col("p.url"), "left")
      .select(col("f.seq").as("seq"), col("f.url").as("url"),
        col("f.host").as("host"),
        col("p.warc_ts").as("warc_ts"), col("p.html").as("html"),
        col("p.text").as("text"))

    // 5. decode → liveness → render → byte-identity → features (one map)
    val outcomes = joined.as[FetchRow].map(CrawlWave.fetchOutcome(_, wave)).cache()

    val samplesNew = outcomes.where(col("ok")).toDF()
    val errorsNew = outcomes.where(!col("ok")).toDF()

    // 6. state updates + snapshot commit
    val selectedKeys = toFetch.select(col("seq").as("sel_seq"),
      col("url_hash").as("sel_hash"))
    val errSeqs = errorsNew.select(col("seq").as("sel_seq"), lit(true).as("was_err"))
    val frontier2 = frontier
      .join(selectedKeys, col("seq") === col("sel_seq"), "left")
      .join(errSeqs, Seq("sel_seq"), "left")
      .withColumn("state",
        when(col("sel_seq").isNotNull && col("was_err"), lit("error"))
          .when(col("sel_seq").isNotNull, lit("done"))
          .otherwise(col("state")))
      .withColumn("wave",
        when(col("sel_seq").isNotNull, lit(wave)).otherwise(col("wave")))
      .drop("sel_seq", "sel_hash", "was_err")

    // seen DELTA (append) + incremental filter blob update: each touched
    // partition's filter is rebuilt DISTRIBUTED (copy of the broadcast
    // old blob + this wave's delta keys inserted in the executor);
    // untouched partitions keep their blob verbatim. Blobs are small and
    // fixed-size; partitions scale with the frontier.
    val seenDelta = toFetch
      .select(pmod(col("url_hash"), lit(P.toLong)).cast("int").as("part"), col("url_hash"))
    val bloomBits = cfg.bloomBitsPerPartition; val bloomHashes = cfg.bloomHashes
    val cuckooCap = cfg.cuckooCapacityPerPartition
    val updatedBlobs = seenDelta.as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (p, it) =>
        val f = bloomBc.value.get(p).map(_.copyOf).getOrElse(
          SeenFilter.fresh(filterKind, bloomBits, bloomHashes, cuckooCap))
        it.foreach(t => f.put(t._2))
        (p, f.serialize)
      }
      .collect()
    val touched = updatedBlobs.map(_._1).toSet
    val mergedBlobs = updatedBlobs.toSeq ++
      blobs.filter { case (p, _) => !touched.contains(p) }
    val blobsDf = spark.createDataset(mergedBlobs).toDF("part", "blob")

    // per-partition × per-host lineage metrics (north_rule): one
    // aggregation over the cached outcomes feeds both the `metrics`
    // append table and the driver-side wave stats — a single action.
    val metricsNew = outcomes.toDF()
      .withColumn("part_id", spark_partition_id())
      .groupBy(col("wave"), col("part_id"), col("host"))
      .agg(
        count(lit(1)).as("urls"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("errors"),
        sum(when(col("ok") && !col("render_match"), 1L).otherwise(0L)).as("render_mismatches"),
        sum(when(col("ok"), length(col("text"))).otherwise(0L)).as("text_bytes"))
      .cache()
    val stats = metricsNew.agg(
      sum("urls"), sum("errors"), sum("render_mismatches")).head
    def longAt(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
    val nSel = longAt(0); val nErr = longAt(1); val nMismatch = longAt(2)
    val committed = store.commit(
      replace = Map("frontier" -> frontier2, "seen_bloom" -> blobsDf),
      append = Map("seen" -> seenDelta, "samples" -> samplesNew,
        "errors" -> errorsNew, "metrics" -> metricsNew),
      metrics = Map("wave" -> wave.toLong, "selected" -> nSel,
        "errors" -> nErr, "render_mismatches" -> nMismatch),
      rowCounts = Map("samples" -> (nSel - nErr), "errors" -> nErr),
      expectedParent = Some(v))
    outcomes.unpersist(); toFetch.unpersist(); frontier.unpersist()
    metricsNew.unpersist()
    Some(committed)
  }


  /** Drive waves to drain (or maxWaves); returns the final version. */
  def runAll(seeds: DataFrame): Int = {
    var v = init(seeds)
    var k = 0
    var continue = true
    while (continue && k < cfg.maxWaves) {
      step() match {
        case Some(nv) => v = nv; k += 1
        case None => continue = false
      }
    }
    v
  }
}
