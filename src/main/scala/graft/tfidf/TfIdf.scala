package graft.tfidf

/** TF-IDF with the exact reference semantics
  * (`/root/reference/tfidf-elm.py:43-86`):
  *
  *  - binary term frequency over the SET of terms per doc (:45-51);
  *  - sklearn `TfidfTransformer(smooth_idf=False)`:
  *    `idf = ln(n/df) + 1`, rows L2-normalized (:53-55). Spark ML's IDF
  *    uses `ln((n+1)/(df+1))` — deliberately NOT used (SURVEY.md §2.2 A11);
  *  - term selection at K%: keep term index i if any document's tfidf
  *    value ≥ K/100. The reference indexes `tfidf_array[:][i]` — row i,
  *    not column i (:77-79, a bug). [[selectTerms]] implements the
  *    INTENDED column semantics; [[selectTermsRowBug]] reproduces the
  *    bug for parity with the shipped `tfidf2 K% term` files.
  *
  * Vocabulary order: the reference iterates a CPython2 set (hash
  * order); our canonical order is first occurrence (documented).
  */
object TfIdf {

  final case class Model(
      vocab: Vector[String],
      idf: Array[Double],
      /** doc-major tfidf matrix, L2-normalized rows */
      tfidf: Array[Array[Double]])

  def fit(docs: Seq[Seq[String]]): Model = {
    val vocab = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      for (d <- docs; t <- d) seen += t
      seen.toVector
    }
    val index = vocab.zipWithIndex.toMap
    val n = docs.size
    val df = new Array[Int](vocab.size)
    val tf = Array.ofDim[Double](n, vocab.size)
    for ((d, r) <- docs.zipWithIndex) {
      val set = d.toSet
      for (t <- set) { val c = index(t); tf(r)(c) = 1.0; df(c) += 1 }
    }
    val idf = df.map(f => if (f == 0) 0.0 else math.log(n.toDouble / f) + 1.0)
    val tfidf = tf.map { row =>
      val scaled = row.zip(idf).map { case (v, w) => v * w }
      val norm = math.sqrt(scaled.map(x => x * x).sum)
      if (norm == 0.0) scaled else scaled.map(_ / norm)
    }
    Model(vocab, idf, tfidf)
  }

  /** Intended semantics: keep term i if max over docs of tfidf(_, i) ≥ k. */
  def selectTerms(m: Model, percent: Double): Vector[Int] = {
    val k = percent
    (0 until m.vocab.size).filter { i =>
      m.tfidf.exists(row => row(i) >= k)
    }.toVector
  }

  /** The reference's row/column indexing bug (`tfidf-elm.py:77-79`):
    * `tfidf_array[:][i]` is ROW i; the loop runs over vocab indices, so
    * indices ≥ n(docs) crash upstream — here they simply select
    * nothing. */
  def selectTermsRowBug(m: Model, percent: Double): Vector[Int] = {
    (0 until m.vocab.size).filter { i =>
      i < m.tfidf.length && m.tfidf(i).exists(_ >= percent)
    }.toVector
  }

  /** ELM train matrix + labels (`tfidf-elm.py:108-116`): binary doc ×
    * selected-term matrix; label 1 if any selected tfidf ≥ k. */
  def elmTrainMatrix(m: Model, selected: Seq[Int], percent: Double): (Array[Array[Double]], Array[Double]) = {
    val x = Array.ofDim[Double](m.tfidf.length, selected.size)
    val y = new Array[Double](m.tfidf.length)
    val sel = selected.toArray // zipped once, not re-built per doc row
    for (r <- m.tfidf.indices; c <- sel.indices) {
      if (m.tfidf(r)(sel(c)) >= percent) { x(r)(c) = 1.0; y(r) = 1.0 }
    }
    (x, y)
  }
}

/** S11: the `tfidf K% term` file format (`tfidf-elm.py:76-106`):
  * line 1 = Python-repr JSON list of kept column indices
  * (`[0, 1, 2]`, spaces after commas), line 2 = space-joined terms.
  * The reference REFUSES to overwrite an existing file (:81-83) —
  * mirrored here by throwing; read returns (indices, terms). The
  * shipped corpora at `/root/reference/tfidf2 0%..90% term` use this
  * exact shape. Small driver-side artifact → broadcast on use (J1). */
object TermFile {

  def render(indices: Seq[Int], terms: Seq[String]): String =
    indices.mkString("[", ", ", "]") + "\n" + terms.mkString(" ")

  /** Write, refusing overwrite like the reference. */
  def write(path: java.nio.file.Path, indices: Seq[Int], terms: Seq[String]): Unit = {
    if (java.nio.file.Files.exists(path))
      throw new IllegalStateException(s"$path existed")
    java.nio.file.Files.writeString(path, render(indices, terms),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  def parse(content: String): (Vector[Int], Vector[String]) = {
    val lines = content.split("\n", 2)
    val idx = lines(0).trim.stripPrefix("[").stripSuffix("]").split(",")
      .iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toVector
    val terms =
      if (lines.length < 2) Vector.empty
      else lines(1).trim match {
        case "" => Vector.empty
        case t => t.split(" ").toVector
      }
    (idx, terms)
  }

  def read(path: java.nio.file.Path): (Vector[Int], Vector[String]) =
    parse(java.nio.file.Files.readString(path, java.nio.charset.StandardCharsets.UTF_8))
}
