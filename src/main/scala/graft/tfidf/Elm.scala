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
