package graft

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the training-data pipeline operators (the
  * rows-only entries of SparkEntry: MinHash/SimHash/LSH/winnowing). */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"

  test("minhash signature estimates Jaccard within tolerance") {
    val a = Dedup.shingleHashes(base * 5, 5)
    val b = Dedup.shingleHashes((base * 5) + " extra tail", 5)
    val sa = Dedup.minhashSignature(a, 256)
    val sb = Dedup.minhashSignature(b, 256)
    val est = Dedup.sigJaccard(sa, sb)
    val inter = a.toSet.intersect(b.toSet).size.toDouble
    val union = a.toSet.union(b.toSet).size.toDouble
    val truth = inter / union
    assert(math.abs(est - truth) < 0.12, s"est=$est truth=$truth")
  }

  test("minhash LSH finds near-duplicate pairs, not unrelated ones") {
    val d = docs(
      1L -> (base * 4),
      2L -> (base * 4 + " minor tail change"),
      3L -> "completely different content about spark shuffles and parquet files and bloom filters",
      4L -> (base * 4))
    val pairs = Dedup.minhashLshPairs(d, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs at Hamming 0; near docs close; far docs far") {
    val s1 = Dedup.simhash64(base)
    val s2 = Dedup.simhash64(base)
    assert(s1 == s2)
    val near = Dedup.simhash64(base.replace("tonight", "today"))
    val far = Dedup.simhash64("spark catalyst tungsten codegen adaptive execution engine")
    assert(java.lang.Long.bitCount(s1 ^ near) < java.lang.Long.bitCount(s1 ^ far))
  }

  test("simhash pair blocking catches Hamming<=3 pairs") {
    val d = docs(1L -> (base * 3), 2L -> (base * 3 + " x"), 3L -> "unrelated words entirely about databases")
    val pairs = Dedup.simhashPairs(d, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard exact verifier: identity=1, disjoint=0") {
    import spark.implicits._
    val d = docs(1L -> base, 2L -> base, 3L -> "zzzz qqqq xxxx vvvv kkkk")
    val out = Dedup.ngramJaccardAllPairs(d)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(!out.contains((1L, 3L)) || out((1L, 3L)) < 0.05)
  }

  test("zero-norm vectors never rank: NULL cosine, not rank-1 NaN") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)), // zero norm: raw 0/0 NaN would rank FIRST
      (4L, Array(0.5f, 0.5f)))
    val e = rows.toDF("vec_id", "embedding")
    val q = e.where($"vec_id" === 1L)
    val top = Ann.bruteForceTopK(e, q, k = 2)
      .select("cand_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(top.map(_._1).toSeq == Seq(2L, 4L), s"got ${top.toSeq}")
    // and as a QUERY a zero vector returns no NaN rows either
    val qz = e.where($"vec_id" === 3L)
    val tz = Ann.bruteForceTopK(e, qz, k = 2).collect()
    assert(tz.isEmpty, s"got ${tz.toSeq}")
  }

  test("LSH ANN achieves reasonable recall vs brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Ann.bruteForceTopK(e, q, k = 5))
    val lsh = pairs(Ann.lshTopK(e, q, k = 5, probes = 2))
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall=$recall")
    // and every LSH hit must carry the same cosine the brute pass computed
    assert(lsh.subsetOf(pairs(Ann.bruteForceTopK(e, q, k = e.count().toInt))))
  }

  test("IVF ANN: probe-all degrades to exact brute force; nProbe<C keeps recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val brute = rows(Ann.bruteForceTopK(e, q, k = 5))
    // centroidMod=10 → C = |corpus|/10 cells; probing every cell must
    // reproduce brute force EXACTLY (ranks and micro-cosines included)
    val nCells = e.where(col("vec_id") % 10 === 0).count().toInt
    assert(rows(Ann.ivfTopK(e, q, k = 5, centroidMod = 10, nProbe = nCells)) == brute)
    // the approximate setting: hits must be a subset of the full exact
    // ranking, with usable recall of the true top-5
    def pairs(s: Set[(Long, Long, Int, Long)]) = s.map(t => (t._1, t._2))
    val ivf = pairs(rows(Ann.ivfTopK(e, q, k = 5, centroidMod = 10, nProbe = 3)))
    val recall = (pairs(brute) intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall=$recall")
    assert(ivf.subsetOf(pairs(rows(Ann.bruteForceTopK(e, q, k = e.count().toInt)))))
  }

  test("embedding near-dup: LSH path has precision 1.0 and high recall on injected dups") {
    import spark.implicits._
    // real embeddings + deterministic near-duplicates (tiny perturbation
    // of one component) → true near-dup pairs at cosine >= 0.95
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val injected = e.flatMap { case (id, v) =>
      val dup = v.clone(); dup(0) = dup(0) + 0.01f
      if (id % 10 == 0) Seq((id, v), (id + 100000L, dup)) else Seq((id, v))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingNearDupExact(injected, 0.95))
    assert(exact.size >= 40, s"expected ~50 injected pairs, got ${exact.size}")
    val lsh = pairs(Dedup.embeddingNearDupLsh(injected, 0.95))
    assert(lsh.subsetOf(exact), "LSH emitted a pair exact cosine rejects (precision < 1)")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("connected components: min-id labels match brute-force union-find") {
    import spark.implicits._
    // deterministic pseudo-random graph + a long chain (exercises the
    // multi-round propagation path) + isolated pair
    val rnd = new scala.util.Random(42)
    val randomPairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val chain = (100L until 140L).map(i => (i, i + 1))
    val pairs = (randomPairs ++ chain :+ ((500L, 501L))).distinct
    val got = Dedup.connectedComponents(pairs.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toMap
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize union-find roots to the min member of each set
    val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
    val want = nodes.map(n => n -> minOfRoot(find(n))).toMap
    assert(got == want)
    // every cluster keeper is its own cluster id
    assert(got.filter { case (id, c) => id == c }.keySet == got.values.toSet)
  }

  test("winnowing fingerprints are stable under distant edits") {
    val a = TextAnalysis.winnow(base * 10).toSet
    val b = TextAnalysis.winnow(base * 10 + " changed ending here").toSet
    val overlap = (a intersect b).size.toDouble / a.size
    assert(overlap > 0.8, s"overlap=$overlap")
  }

  test("multimodal decode plumbing: deterministic, schema-typed, prunable") {
    val d = docs(0L -> "image payload bytes", 1L -> "audio payload", 2L -> "video payload data")
      .withColumn("doc_id", col("doc_id").cast("long"))
    val out1 = Multimodal.decodeAll(Multimodal.synthAssets(d)).collect()
    val out2 = Multimodal.decodeAll(Multimodal.synthAssets(d)).collect()
    assert(out1.map(_.toString).sorted.sameElements(out2.map(_.toString).sorted))
    val video = out1.find(_.getString(1) == "video").get
    assert(video.getInt(5) >= 1) // n_frames
  }

  test("langId/quality/tokenCounts run and type as bigint metrics") {
    val d = docs(1L -> "the cat and the dog of the house", 2L -> "der hund und der mann und die frau")
    val l = TextAnalysis.langId(d).collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(l(1L) == "en" && l(2L) == "de")
    val q = TextAnalysis.quality(d)
    assert(q.columns.toSeq == Seq("doc_id", "n_chars_q", "n_words", "mean_word_len_micro", "stop_ratio_micro", "alpha_ratio_micro"))
    val t = TextAnalysis.tokenCounts(d).where(col("doc_id") === 1).head
    assert(t.getLong(1) == 8 && t.getLong(2) == 8)
  }
}
