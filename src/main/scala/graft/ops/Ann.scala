package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, the driver's `embeddings.parquet` shape).
  *
  * Two tiers, per the scale plan:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is small (a broadcast), so the "cross join" is a
  *    broadcast nested loop over one pass of the corpus: at 100 TB this
  *    is one full scan, no shuffle except the final per-query top-k
  *    (tiny after the per-partition pre-top-k that Spark's window +
  *    filter plan performs with AQE).
  *  - [[lshTopK]]: random-hyperplane (sign) LSH — corpus and queries are
  *    bucketed by an `nBits`-bit signature; only same-bucket candidates
  *    are scored. Hyperplanes are derived deterministically from
  *    splitmix64, so results are reproducible with no stored model.
  *    Multi-probe: queries are also matched at Hamming distance ≤ 1 to
  *    recover near-boundary neighbours (`probes` > 1).
  *
  * Dot products use SQL higher-order functions (`zip_with` +
  * `aggregate`) — codegen'd, no UDF, stays inside WholeStageCodegen.
  */
object Ann {

  /** Shared cosine expression over two double-array columns (left-to-right
    * fold, matching DuckDB's `list_cosine_similarity` evaluation order so
    * oracle comparisons are bit-stable). A zero-norm side yields NULL via
    * nullif (single evaluation, bit-identical for real vectors) — NULL
    * ranks LAST under `desc` and fails every `>= threshold` filter,
    * where the raw 0/0 NaN would rank FIRST in Spark's double ordering
    * and silently displace a real neighbour per query. (DuckDB's
    * list_cosine_similarity has no such guard; fixtures carry no
    * zero-norm embeddings, and deployments should pre-filter them.) */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)
       | / nullif(sqrt(aggregate($a, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))
       |    * sqrt(aggregate($b, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))), 0.0d)""".stripMargin

  /** Exact cosine top-k for each query vector. Queries are selected by
    * the caller (small set → broadcast). Tie-break: cosine desc, then
    * corpus id asc — fully deterministic. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cosine", expr(cosineExpr("qv", "cv")))
      // zero-norm side -> NULL cosine (see cosineExpr): undefined
      // similarity is not a neighbour; unfiltered, row_number would
      // still hand NULL-cosine rows ranks
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        (round(col("cosine") * 1e6, 0)).cast("long").as("cosine_micro"))
  }

  private def mix64(z0: Long): Long = PortableHash.mix64(z0)

  /** Deterministic pseudo-gaussian hyperplanes: `nBits` planes of
    * dimension `dim`, components in [-1, 1) from splitmix64. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        (mix64(seed ^ mix64(b.toLong << 32 | d.toLong)).toDouble / Long.MaxValue)
      }
    }

  /** PORTABLE Rademacher hyperplanes ([[PortableHash]], md5): component
    * (b, d) is +1 when the first hex digit of md5("tag:b:d") is odd,
    * else -1 — reproducible in DuckDB as `strpos`/`substr` arithmetic.
    * ±1 planes are the standard derandomized sign-LSH family (random
    * projections with Rademacher entries preserve cosine sign
    * statistics like gaussian ones). */
  def rademacherPlanes(nBits: Int, dim: Int, tag: String): Array[Array[Int]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        if ((PortableHash.digit(PortableHash.md5Hex(s"$tag:$b:$d"), 0) & 1) == 1) 1 else -1
      }
    }

  /** Portable sign-LSH signature: bit b set when
    * Σ_d plane(b,d) · floor(v_d · 1e6) ≥ 0. The dot product runs over
    * EXACT int64 micro components (floor of the exact float→double
    * product), so it is order-independent and bit-identical to a SQL
    * replica — no cross-engine float-summation knife edges at the sign
    * threshold. */
  def signaturePortable(v: Array[Float], planes: Array[Array[Int]]): Int = {
    var sig = 0; var b = 0
    while (b < planes.length) {
      val p = planes(b); var dot = 0L; var i = 0
      val n = math.min(v.length, p.length)
      while (i < n) { dot += p(i) * math.floor(v(i).toDouble * 1e6).toLong; i += 1 }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** Shared-dialect SQL fragment for one portable plane component:
    * ±1 from the first hex digit of md5('tag:b:d') — the exact
    * [[rademacherPlanes]] rule. `b`/`d` are SQL expressions. */
  def planeSql(tag: String, b: String, d: String): String =
    s"(CASE WHEN (instr('0123456789abcdef', substr(md5('$tag:' || ($b) || ':' || ($d)), 1, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END)"

  /** Sign-LSH signature of a vector under the shared hyperplanes. */
  def signature(v: Array[Float], planes: Array[Array[Double]]): Int = {
    var sig = 0; var b = 0
    while (b < planes.length) {
      val p = planes(b); var dot = 0.0; var i = 0
      while (i < v.length && i < p.length) { dot += v(i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed top-k: same output shape as [[bruteForceTopK]] but only
    * candidates sharing a (multi-probed) signature bucket in at least one
    * of `tables` independent hash tables are scored — the standard
    * recall/cost dial (L tables × b bits). Recall is property-tested
    * against brute force in `OpsSpec`.
    *
    * `probes` is a Hamming RADIUS level, not a probe count: ≤1 probes
    * only the exact bucket; ≥2 additionally probes ALL nBits buckets at
    * Hamming distance 1 (symmetric radius-1 multi-probe — without
    * per-plane margins no Hamming-1 neighbor is likelier than another,
    * so there is no principled "first m probes" order to offer).
    *
    * Scale shape: signatures are a row-local map; the candidate join is
    * keyed by (table, bucket) with near-uniform buckets, then scored
    * per pair — no full cross product ever materializes. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 6,
      dim: Int = 64,
      probes: Int = 1,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portable: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      if (portable) null
      else Array.tabulate(tables)(t => hyperplanes(nBits, dim, seed = 42L + 1000L * t)))
    val pPlanes = spark.sparkContext.broadcast(
      if (portable) Array.tabulate(tables)(t => rademacherPlanes(nBits, dim, s"ann:$t"))
      else null)

    def sigOf(df: DataFrame, id: String, vec: String, outId: String, outVec: String): DataFrame =
      df.select(col(id).cast("long"), col(vec)).as[(Long, Array[Float])]
        .flatMap { case (i, v) =>
          (0 until tables).map { t =>
            val s = if (portable) signaturePortable(v, pPlanes.value(t))
                    else signature(v, planes.value(t))
            (i, v, t, s)
          }
        }
        .toDF(outId, outVec, "tbl", "sig")

    val c = sigOf(corpus, idCol, vecCol, "cand_id", "cv")
    val qSig = sigOf(queries, idCol, vecCol, "query_id", "qv")
    // multi-probe: each query also probes buckets at Hamming distance 1
    val probed =
      if (probes <= 1) qSig
      else qSig.withColumn("sig",
        explode(expr(s"concat(array(sig), transform(sequence(0, ${nBits - 1}), b -> cast(sig ^ shiftleft(1, b) as int)))")))

    broadcast(probed).join(c, Seq("tbl", "sig"))
      .where(col("query_id") =!= col("cand_id"))
      .select("query_id", "qv", "cand_id", "cv").dropDuplicates("query_id", "cand_id")
      .withColumn("cosine", expr(cosineExpr("qv", "cv")))
      // zero-norm side -> NULL cosine (see cosineExpr): undefined
      // similarity is not a neighbour; unfiltered, row_number would
      // still hand NULL-cosine rows ranks
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        (round(col("cosine") * 1e6, 0)).cast("long").as("cosine_micro"))
  }

  // ----------------------------------------------------------------- IVF

  /** IVF-flat top-k — the third ANN tier: the corpus is partitioned
    * into C cells around coarse centroids, and each query searches
    * exactly only its `nProbe` nearest cells. The recall/cost dial is
    * (C, nProbe): nProbe = C degrades to exact brute force (tested),
    * nProbe « C scans ~nProbe/C of the corpus per query.
    *
    * Centroids are a deterministic corpus sample (`idCol %
    * centroidMod == 0`) — IVF's coarse quantizer seeded from data,
    * reproducible with no stored model and SQL-replicable for the
    * oracle; a production run may refine them with k-means, which
    * changes cell quality but nothing about this operator's shape.
    * Contract: some corpus id must satisfy `id % centroidMod == 0`
    * (ids are assumed non-negative, as everywhere in this module) —
    * an empty centroid sample means no cells, hence an EMPTY result,
    * not an error; pick centroidMod ≤ max id (and at scale, pick it
    * so C = |corpus|/centroidMod stays ~10^4–10^5: broadcast bytes
    * and the per-row assignment fold are both O(C)).
    *
    * Scale shape (the reason this beats brute at 100 TB):
    *  - the centroid set is packed into ONE row (array of structs,
    *    sorted by centroid id) and broadcast — C·dim·8B, a few MB at
    *    production C;
    *  - cell assignment is a ROW-LOCAL argmax fold over that array
    *    (nested higher-order functions, codegen'd — no UDF): the
    *    corpus is scanned once with zero shuffle, exactly like a
    *    projection;
    *  - queries probe their nProbe cells via a tiny windowed join
    *    (query side is small by contract, as in [[bruteForceTopK]]);
    *  - the probed-cell search is a broadcast join on cell id against
    *    the assigned corpus — still no corpus shuffle; the only
    *    exchange is the final per-query top-k window, pre-limited
    *    per-partition by Spark's WindowGroupLimit.
    *
    * Ties everywhere break to the smaller id (strict `>` over a
    * cid-sorted array for assignment; explicit orderBy for ranks) —
    * fully deterministic. Output shape matches [[bruteForceTopK]]. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroidMod: Long = 25,
      nProbe: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val normExpr = (v: String) =>
      s"sqrt(aggregate($v, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    // tiny centroid frame (cid, cv, cnorm), reused by both sides
    val cent = corpus.where(col(idCol) % centroidMod === 0)
      .select(col(idCol).cast("long").as("cid"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("cv"),
        expr(normExpr(vecCol)).as("cnorm"))
    // ... packed into one broadcastable row, sorted by cid so the
    // strict-`>` fold below keeps the smallest cid on exact ties
    val packed = broadcast(
      cent.agg(array_sort(collect_list(struct(col("cid"), col("cv"), col("cnorm")))).as("cents")))
    // row-local argmax: cos(v, c) = dot/(|v|·|c|), left-to-right fold
    // order identical to cosineExpr so the oracle's doubles match.
    // transform-then-argmax, NOT a CASE that repeats the dot product:
    // common-subexpression elimination does not reach inside
    // higher-order-function lambdas, so the CASE form computed each
    // O(dim) dot TWICE per (row, centroid) — the documented dominant
    // cost of this operator. Strict `>` keeps the earlier (smallest,
    // cents are cid-sorted) centroid on exact ties, as before; a
    // zero-norm row's NULL cosines never beat the seed, so it gets
    // cell -1 and is simply never probed.
    val assignExpr = expr(
      s"""aggregate(
         |  transform(cents, c -> named_struct(
         |    'bc', aggregate(zip_with(cv0, c.cv, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)
         |      / nullif(vnorm * c.cnorm, 0.0d),
         |    'bid', c.cid)),
         |  named_struct('bc', cast(-2.0 as double), 'bid', cast(-1 as bigint)),
         |  (acc, s) -> CASE WHEN s.bc > acc.bc THEN s ELSE acc END,
         |  acc -> acc.bid)""".stripMargin)
    val assigned = corpus
      .select(col(idCol).cast("long").as("cand_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("cv0"),
        expr(normExpr(vecCol)).as("vnorm"))
      .crossJoin(packed) // broadcast 1-row join: attaches `cents`
      .withColumn("cell", assignExpr)
      .select(col("cand_id"), col("cv0").as("cv"), col("cell"))
    // query side: nProbe nearest cells via a windowed join (tiny)
    val probed = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(cosineExpr("qv", "cv")).cast("double"))
      .withColumn("crank", row_number().over(
        w.partitionBy("query_id").orderBy(col("ccos").desc, col("cid").asc)))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    // exact search restricted to the probed cells
    broadcast(probed).join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", expr(cosineExpr("qv", "cv")))
      // zero-norm side -> NULL cosine (see cosineExpr): undefined
      // similarity is not a neighbour; unfiltered, row_number would
      // still hand NULL-cosine rows ranks
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(
        w.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"),
        (round(col("cosine") * 1e6, 0)).cast("long").as("cosine_micro"))
  }
}
