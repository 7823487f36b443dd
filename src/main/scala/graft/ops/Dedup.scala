package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * The reference deduplicates implicitly (each seed URL fetched once,
  * `spider.py:515-524`); a training-data pipeline over Common-Crawl-style
  * pages additionally needs content-level dedup. All operators here are
  * shuffle-aware by construction:
  *
  *  - exact: one hash-partitioned groupBy on a 128-bit digest — the only
  *    shuffle, keyed uniformly (md5), so no skew;
  *  - MinHash+LSH: signature computation is row-local (narrow map);
  *    the only shuffles are the band-bucket groupBy (band keys are
  *    near-uniform) and the candidate-pair verification join on doc id;
  *  - SimHash: row-local 64-bit signature; near-dup candidates via
  *    4×16-bit band blocking (Hamming ≤ 3 ⇒ at least one of 4 bands is
  *    identical — pigeonhole), verified by popcount on the pair;
  *  - n-gram Jaccard: exact pairwise Jaccard restricted to LSH/band
  *    candidates (never the full cross product).
  *
  * At 100 TB the band-bucket `collect_list` is bounded by
  * `maxBucket`: oversized buckets are dropped SILENTLY BY POLICY — they
  * are degenerate near-identical clusters a production run routes to a
  * cluster-representative pass instead of pairwise expansion. The
  * consequence is a recall contract: the sketch operators' exactness
  * claims (simhash Hamming ≤ 3 pigeonhole; the portable minhash/SQL
  * equality) hold only while no band bucket exceeds `maxBucket` —
  * raise it (or pre-collapse exact duplicates) when a corpus can put
  * more than `maxBucket` near-identical documents in one bucket.
  *
  * Ids are numeric (cast to long) in every operator, so the
  * smallest-id keeper rule is numeric min everywhere.
  */
object Dedup {

  /** Exact dedup: groups by md5(text); representative = min(id).
    * Output: one row per distinct content with its duplicate count. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol).cast("long")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // ---------------------------------------------------------------- MinHash

  /** splitmix64 finalizer — deterministic per-index hash constants
    * (shared single copy: [[PortableHash.mix64]]). */
  private def mix64(z0: Long): Long = PortableHash.mix64(z0)

  /** Within-bucket ordered pair expansion over a `members` array of
    * `struct(id, …)`: members[i] × members[j > i] → one `p` =
    * struct(a_id, b_id, <payload>) row per pair, with least/greatest
    * ids and `payload` fields projected from the `x`/`y` sides. ONE
    * copy of the slice arithmetic every bucketed operator shares
    * (minhash ×2, simhash, embedding LSH).
    *
    * TWO chained generators, not one flattened array: a single
    * flatten(transform(...)) materializes all C(n,2) pair structs —
    * each carrying both payloads — inside ONE row value before the
    * explode can stream them (~4 GB at the documented maxBucket=2000
    * with 128-slot signatures). posexplode-then-slice keeps per-row
    * memory at O(n·payload). */
  private def pairExpand(buckets: DataFrame, payload: String): DataFrame =
    buckets
      .select(col("members"), posexplode(col("members")).as(Seq("i", "x")))
      .select(explode(expr(
        s"""transform(slice(members, i + 2, size(members)), y ->
           |  struct(least(x.id, y.id) as a_id, greatest(x.id, y.id) as b_id,
           |         $payload))""".stripMargin)).as("p"))

  /** Distinct char k-shingles of a text, each hashed to a Long. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array(mix64(text.hashCode.toLong))
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i <= text.length - k) {
      // polynomial rolling-style hash of the k chars, finalized
      var h = 1125899906842597L
      var j = i
      while (j < i + k) { h = 31 * h + text.charAt(j); j += 1 }
      seen.add(mix64(h))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** MinHash signature of a shingle-hash set: sig(i) = min over shingles
    * of mix64(shingle ^ seed_i). Row-local, no shuffle. */
  def minhashSignature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var i = 0
      while (i < numHashes) {
        val v = mix64(h ^ mix64(i.toLong))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Estimated Jaccard from two signatures = fraction of agreeing slots. */
  def sigJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** MinHash+LSH near-dup candidate pairs with signature-estimated
    * Jaccard ≥ `threshold`.
    *
    * Pipeline: shingle→minhash (narrow map) → explode `bands` band keys
    * → groupBy band bucket (shuffle 1, near-uniform keys) → pairwise
    * within bucket (bounded by `maxBucket`) → distinct pairs (shuffle 2)
    * → estimate Jaccard from the signatures carried with the pair.
    * Output: (a_id, b_id, est_jaccard) with a_id < b_id.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      numHashes: Int = 128,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) => (id, minhashSignature(shingleHashes(t, shingleK), numHashes)) }
      .toDF("id", "sig")

    val banded = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        xxhash64(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))

    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
      .where(size(col("members")).between(2, maxBucket))

    val pairs = pairExpand(buckets, "x.sig as sa, y.sig as sb")
      .select(col("p.a_id"), col("p.b_id"), col("p.sa"), col("p.sb"))
      .dropDuplicates("a_id", "b_id")

    pairs.as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) => (a, b, sigJaccard(sa, sb)) }
      .toDF("a_id", "b_id", "est_jaccard")
      .where(col("est_jaccard") >= threshold)
  }

  /** Distinct char k-shingles as STRINGS, mirroring the SQL replica
    * exactly: `substr(text, i, k)` for i in 1..max(len-k+1, 1) — a
    * text shorter than k yields its whole self (one short gram). */
  def portableShingles(text: String, k: Int): Array[String] = {
    val n = math.max(text.length - k + 1, 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      seen.add(text.substring(i, math.min(i + k, text.length)))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** PORTABLE MinHash signature: slot j = lexicographic min over grams
    * of md5Hex(s"$j:$gram") ([[PortableHash]]). Hex-string order equals
    * DuckDB varchar order (ASCII), so `min(md5(j || ':' || gram))` in
    * SQL reproduces every slot byte-for-byte. */
  def minhashSignatureMd5(grams: Array[String], numHashes: Int): Array[String] = {
    val sig = new Array[String](numHashes)
    var g = 0
    while (g < grams.length) {
      var j = 0
      while (j < numHashes) {
        val h = PortableHash.md5Hex(j + ":" + grams(g))
        if (sig(j) == null || h.compareTo(sig(j)) < 0) sig(j) = h
        j += 1
      }
      g += 1
    }
    sig
  }

  /** [[minhashLshPairs]] with the portable md5 signature — DETERMINISTIC
    * equality with its SQL replica, not just probabilistic recall: both
    * engines compute the same signatures, the same candidate rule (a
    * fully-equal band), and the same slot-agreement estimate, so the
    * driver oracle is an exact all-pairs formulation of this exact
    * operator. Fewer hashes (16 = 4 bands × 4 rows) keep the SQL side
    * tractable; the scale shape is identical to [[minhashLshPairs]]. */
  def minhashLshPairsPortable(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.3,
      maxBucket: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, minhashSignatureMd5(portableShingles(t, shingleK), numHashes))
      }
      .toDF("id", "sig")

    val banded = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        concat_ws("|", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))

    val pairs = pairExpand(
      banded.groupBy("band", "bucket")
        .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
        .where(size(col("members")).between(2, maxBucket)),
      "x.sig as sa, y.sig as sb")
      .select(col("p.a_id"), col("p.b_id"), col("p.sa"), col("p.sb"))
      .dropDuplicates("a_id", "b_id")

    pairs
      .withColumn("eq", expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), b -> b))"))
      .where(col("eq") >= lit(math.ceil(threshold * numHashes).toInt))
      .select(col("a_id"), col("b_id"),
        // integer division LAST: eq * (1000000 / numHashes) truncates
        // the per-slot weight whenever numHashes does not divide 1e6
        expr(s"eq * 1000000 div $numHashes").cast("long").as("est_jaccard_micro"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens (unit weights). Row-local. */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0; val n = text.length
    while (start < n) {
      while (start < n && text.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && text.charAt(end) != ' ') end += 1
      if (end > start) {
        var h = 1125899906842597L
        var j = start
        while (j < end) { h = 31 * h + text.charAt(j); j += 1 }
        h = mix64(h)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      start = end + 1
    }
    var sig = 0L; var bit = 0
    while (bit < 64) { if (counts(bit) > 0) sig |= (1L << bit); bit += 1 }
    sig
  }

  /** [[simhash64]] with the PORTABLE per-token hash ([[PortableHash]],
    * md5): bit i (0..63) of a token's contribution is bit (i mod 4) of
    * hex digit (i div 4) of md5(token) — exactly replicable in DuckDB
    * SQL (`strpos`/`substr` digit arithmetic + `>>`), which is what lets
    * the driver oracle the simhash operator end-to-end. ~5-10× slower
    * than [[simhash64]]; same tokenization (split on ' ', empties
    * skipped), same majority-bit rule (ties → 0). */
  def simhash64Md5(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0; val n = text.length
    while (start < n) {
      while (start < n && text.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && text.charAt(end) != ' ') end += 1
      if (end > start) {
        val hex = PortableHash.md5Hex(text.substring(start, end))
        var i = 0
        while (i < 64) {
          val bit = (Character.digit(hex.charAt(i >> 2), 16) >> (i & 3)) & 1
          if (bit == 1) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      start = end + 1
    }
    var sig = 0L; var bit = 0
    while (bit < 64) { if (counts(bit) > 0) sig |= (1L << bit); bit += 1 }
    sig
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`.
    * Blocking: 4×16-bit bands; Hamming ≤ 3 guarantees a shared band
    * (pigeonhole), so results are EXACT for `maxHamming` ≤ 3 — PROVIDED
    * no band bucket exceeds `maxBucket` (see the module doc's recall
    * contract; a corpus with more than `maxBucket` near-identical
    * documents needs a larger cap or an exact-dedup pre-pass). Beyond
    * Hamming 3 recall is partial (candidates must still collide on a
    * band). `portable = true` switches the fingerprint to
    * [[simhash64Md5]] so a SQL oracle can recompute it. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucket: Int = 2000,
      portable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) => (id, if (portable) simhash64Md5(t) else simhash64(t)) }
      .toDF("id", "sig")

    val banded = sigs.select(col("id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key", expr("(sig >> (band * 16)) & 65535"))

    pairExpand(
      banded.groupBy("band", "key")
        .agg(collect_list(struct(col("id"), col("sig"))).as("members"))
        .where(size(col("members")).between(2, maxBucket)),
      "bit_count(x.sig ^ y.sig) as hamming")
      .select(col("p.a_id"), col("p.b_id"), col("p.hamming"))
      .dropDuplicates("a_id", "b_id")
      .where(col("hamming") <= maxHamming)
  }

  /** Exact pairwise n-gram Jaccard over ALL pairs of the GIVEN frame:
    * distinct char k-gram sets intersected via an explode + self-join —
    * the exact verifier behind the sketch-based candidates above.
    * CALLERS bound the input (a sketch-candidate subset or a small
    * sample, e.g. the `dedup_ngram_jaccard` query's doc_id % 50 slice):
    * the gram self-join is quadratic in per-gram frequency, so feeding
    * a full corpus would blow up on common grams. */
  def ngramJaccardAllPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 5): DataFrame = {
    val grams = docs.select(col(idCol).cast("long").as("id"),
        explode(expr(s"transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)), i -> substr($textCol, i, $k))")).as("gram"))
      .distinct()
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("sz", "sa"), "a_id")
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("sz", "sb"), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jaccard"))
  }

  // -------------------------------------------- embedding-cosine near-dup

  /** Exact embedding-cosine near-duplicate pairs over a (small) slice:
    * every a<b pair with cosine ≥ `threshold`. O(n²) — the verification
    * baseline; the scale path is [[embeddingNearDupLsh]]. Cosine uses
    * the shared codegen'd HOF expression ([[Ann.cosineExpr]]). */
  def embeddingNearDupExact(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).cast("long").as("a_id"), col(vecCol).as("av"))
    val b = emb.select(col(idCol).cast("long").as("b_id"), col(vecCol).as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", expr(Ann.cosineExpr("av", "bv")))
      .where(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"),
        round(col("cosine") * 1e6, 0).cast("long").as("cosine_micro"))
  }

  /** Embedding-cosine near-dup at scale: sign-LSH bucketing (L tables ×
    * nBits hyperplane signs, [[Ann.hyperplanes]]) proposes candidate
    * pairs — only same-bucket vectors ever meet — then the EXACT cosine
    * filters at `threshold`, so precision is 1.0 and only recall depends
    * on the sketch (property-tested vs [[embeddingNearDupExact]] in
    * OpsSpec). Shuffles: one groupBy bucket with near-uniform keys, one
    * distinct on pairs; no cross product. */
  def embeddingNearDupLsh(
      emb: DataFrame,
      threshold: Double,
      nBits: Int = 8,
      tables: Int = 6,
      dim: Int = 64,
      maxBucket: Int = 2000,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portable: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      if (portable) null
      else Array.tabulate(tables)(t => Ann.hyperplanes(nBits, dim, seed = 77L + 1000L * t)))
    val pPlanes = spark.sparkContext.broadcast(
      if (portable) Array.tabulate(tables)(t => Ann.rademacherPlanes(nBits, dim, s"emb:$t"))
      else null)
    val sigs = emb.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .flatMap { case (i, v) =>
        (0 until tables).map { t =>
          val s = if (portable) Ann.signaturePortable(v, pPlanes.value(t))
                  else Ann.signature(v, planes.value(t))
          (i, v, t, s)
        }
      }.toDF("id", "v", "tbl", "sig")
    val buckets = sigs.groupBy("tbl", "sig")
      .agg(collect_list(struct(col("id"), col("v"))).as("members"))
      .where(size(col("members")).between(2, maxBucket))
    val cand = pairExpand(buckets, "x.v as av, y.v as bv")
      .select(col("p.a_id"), col("p.b_id"), col("p.av"), col("p.bv"))
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("cosine", expr(Ann.cosineExpr("av", "bv")))
      .where(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"),
        round(col("cosine") * 1e6, 0).cast("long").as("cosine_micro"))
  }

  // ------------------------------------------------- connected components

  /** Connected components over an undirected near-dup pair graph — the
    * clustering step that completes every dedup pipeline (LSH pairs →
    * components → one canonical doc per component). Output: one row per
    * node that appears in `pairs`, `(doc_id, cluster_id)` with
    * `cluster_id` = the smallest doc id reachable from it (so the
    * canonical keeper of each cluster is its own cluster_id, and the
    * keep/drop decision is `doc_id == cluster_id`). Deterministic under
    * any parallelism.
    *
    * Algorithm: min-label propagation with POINTER JUMPING to a fixed
    * point. Each round (a) takes the min over each node's neighbors'
    * labels (one shuffle keyed by node id, map-side partial agg) and
    * (b) shortcuts label(v) ← label(label(v)) (one self-join — labels
    * are min-monotone, so the jump only improves). Propagation alone
    * needs O(diameter) rounds; the jump compresses chains
    * exponentially, giving O(log n) rounds on any graph — near-dup
    * components are clique-ish and shallow, so 2–4 rounds in practice.
    * Nothing is collected to the driver except the per-round
    * convergence count.
    *
    * Each round ends in an eager `localCheckpoint`: an iterative
    * fixpoint otherwise grows the logical plan every round (persist
    * caches data, not the plan), and analysis cost compounds. The
    * checkpoint is also what keeps the pointer-jump self-join
    * unambiguous — both sides read a materialized RDD with fresh
    * attributes. On a cluster with flaky executors, swap for a
    * reliable `checkpoint()` against the job's checkpoint dir; the
    * algorithm is unchanged. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 25): DataFrame = {
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs
      .select(col(aCol).cast("long").as("id"), col(bCol).cast("long").as("nb"))
      .union(pairs.select(col(bCol).cast("long").as("id"), col(aCol).cast("long").as("nb")))
      .distinct()
      .persist(storage)
    var labels = edges.select(col("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint() // eager — materializes and truncates lineage
    // free a superseded eager localCheckpoint's materialized RDD — the
    // context cleaner would reclaim it only after a driver GC, pinning
    // up to 2×rounds dead copies of the label table until then
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prev = labels
      // (a) propagate: m(v) = min(label(v), min over neighbors' labels)
      val m = edges
        .join(labels.select(col("id").as("nb"), col("cluster_id").as("nb_label")), Seq("nb"))
        .groupBy("id").agg(min(col("nb_label")).as("nb_min"))
        .join(labels, Seq("id"), "right")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("m"))
        .localCheckpoint()
      // (b) pointer-jump: label'(v) = min(m(v), m(m(v))) — m(v) is
      // itself a node id (labels start as ids and move by min), and
      // m is min-monotone, so the jump can only lower the label
      val next = m
        .join(m.select(col("id").as("m0"), col("m").as("mm")), col("m") === col("m0"), "left")
        .select(col("id"), least(col("m"), coalesce(col("mm"), col("m"))).as("new_label"))
        .join(labels, Seq("id"))
        .select(col("id"), col("new_label").as("cluster_id"),
          (col("new_label") < col("cluster_id")).as("changed"))
        .localCheckpoint()
      val changed = next.where(col("changed")).count()
      labels = next.drop("changed")
      freeCheckpoint(m)    // dead once `next` is materialized
      freeCheckpoint(prev) // superseded label round
      converged = changed == 0
      it += 1
    }
    edges.unpersist(false)
    if (!converged) // wrong labels are worse than no labels
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id").as("doc_id"), col("cluster_id"))
  }
}
