package graft.tfidf

import breeze.linalg.{pinv, DenseMatrix, DenseVector}

/** Extreme Learning Machine, the architecture+formula contract of the
  * reference's `ELMClassifier(activation_func='sigmoid')`
  * (`/root/reference/tfidf-elm.py:117-121`; SURVEY.md §2.9): a random
  * hidden layer `H = σ(X·Wᵀ + b)` with seeded weights, closed-form
  * output weights `β = pinv(H)·y`. The upstream pickled models are
  * missing (`.MISSING_LARGE_BLOBS`), so exact weight parity is
  * impossible; we train our own with a FIXED seed so predictions are
  * deterministic and test-stable.
  *
  * Binary labels {0,1} are mapped to {-1,+1} for the solve (sklearn's
  * LabelBinarizer(-1, 1) behavior); predict thresholds at 0.
  */
final case class ElmModel(
    w: Array[Array[Double]], // nHidden × nFeatures
    b: Array[Double],        // nHidden
    beta: Array[Double]) {   // nHidden

  def decision(x: Array[Double]): Double = {
    var s = 0.0
    var h = 0
    while (h < w.length) {
      var z = b(h)
      val wh = w(h)
      var j = 0
      while (j < wh.length) { z += wh(j) * x(j); j += 1 }
      s += beta(h) * Elm.sigmoid(z)
      h += 1
    }
    s
  }

  /** Predicted class label in {0,1}. */
  def predict(x: Array[Double]): Double = if (decision(x) >= 0.0) 1.0 else 0.0
}

object Elm {

  def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Train with a seeded java.util.Random hidden layer (uniform in
    * [-1, 1], the sklearn_extensions SimpleRandomLayer shape). */
  def train(x: Array[Array[Double]], y01: Array[Double], nHidden: Int = 20,
      seed: Long = 42L): ElmModel = {
    require(x.nonEmpty)
    val d = x(0).length
    val rnd = new java.util.Random(seed)
    val w = Array.fill(nHidden, d)(rnd.nextDouble() * 2 - 1)
    val b = Array.fill(nHidden)(rnd.nextDouble() * 2 - 1)
    val n = x.length
    val h = DenseMatrix.tabulate(n, nHidden) { (i, j) =>
      var z = b(j)
      var k = 0
      while (k < d) { z += w(j)(k) * x(i)(k); k += 1 }
      sigmoid(z)
    }
    val ypm = DenseVector(y01.map(v => if (v > 0.5) 1.0 else -1.0))
    val beta = pinv(h) * ypm
    ElmModel(w, b, beta.toArray)
  }
}

/** LC-ELM: the reference's 25-member ELM ensemble with a linear
  * combiner (`train/lc-elm.py:20-103`):
  *
  *  - members: `n` ELMClassifiers fit on X with ±1-binarized labels
  *    (`lc-elm.py:56-60`); member output F(X)ᵢⱼ ∈ {-1, +1}
  *    (`_f`, `lc-elm.py:65-75`);
  *  - combiner: `v = pinv(F)·y` where y is the RAW 0/1 class index
  *    vector — not the ±1 binarized one (`lc-elm.py:61-63`; preserved
  *    verbatim, including the consequence that `predict` =
  *    `sign(F·v)` thresholds 0/1-regressed values at 0, so rows fitted
  *    near 0 flip on numerical noise — a reference quirk, kept);
  *  - predict: `binarizer.inverse_transform(sign(F·v))` → {0, 1}
  *    (`lc-elm.py:101-103`); sign(0) → class 0.
  *
  * Seeding: the reference passes the SAME `random_state` to every
  * member (`lc-elm.py:41-45`), which with a fixed int seed makes all 25
  * members identical (rank-1 F). We derive per-member seeds
  * (`seed + 1000·i`) for a meaningful ensemble and document the
  * divergence; `identicalMembers = true` reproduces the quirk.
  */
final case class LcElmModel(members: Vector[ElmModel], v: Array[Double]) {

  /** Member vote vector F(x) ∈ {-1, +1}ⁿ. */
  def f(x: Array[Double]): Array[Double] =
    members.iterator.map(m => if (m.decision(x) >= 0.0) 1.0 else -1.0).toArray

  def decision(x: Array[Double]): Double = {
    val fx = f(x)
    var s = 0.0
    var i = 0
    while (i < fx.length) { s += fx(i) * v(i); i += 1 }
    s
  }

  /** Class in {0,1}: `sign(F·v)` inverse-binarized (threshold 0). */
  def predict(x: Array[Double]): Double = if (decision(x) > 0.0) 1.0 else 0.0
}

object LcElm {

  def train(x: Array[Array[Double]], y01: Array[Double],
      nEstimators: Int = 25, nHidden: Int = 20, seed: Long = 42L,
      identicalMembers: Boolean = false): LcElmModel = {
    val members = Vector.tabulate(nEstimators) { i =>
      Elm.train(x, y01, nHidden, if (identicalMembers) seed else seed + 1000L * i)
    }
    val n = x.length
    val f = DenseMatrix.tabulate(n, nEstimators) { (i, j) =>
      if (members(j).decision(x(i)) >= 0.0) 1.0 else -1.0
    }
    val v = pinv(f) * DenseVector(y01) // raw 0/1 targets — lc-elm.py:61-63
    LcElmModel(members, v.toArray)
  }
}

/** Title scorer backed by a vocab + ELM — the engine-side counterpart
  * of `get_title_feature` (`extractors5/http_feature.py:477-512`):
  * build the 0/1 membership vector of vocab terms in the title tokens,
  * score with the ELM. */
final class ElmTitleScorer(vocab: Array[String], model: ElmModel)
    extends graft.features.TitleScorer {
  def score(titleTokens: Seq[String]): Double = {
    val tokenSet = titleTokens.toSet
    val v = new Array[Double](vocab.length)
    var i = 0
    while (i < vocab.length) {
      if (tokenSet.contains(vocab(i).toLowerCase)) v(i) = 1.0
      i += 1
    }
    model.predict(v)
  }
}
