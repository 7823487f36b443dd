package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tfidf._

class TokenizeSpec extends AnyFunSuite {
  test("delimiters replaced, lower-cased, empties dropped") {
    assert(Tokenize.terms("  PayPal - Secure/Login!  ") == Vector("paypal", "secure", "login"))
    assert(Tokenize.terms("a.b,c|d[e]f(g)") == Vector("a", "b", "c", "d", "e", "f", "g"))
    assert(Tokenize.terms("【安全】銀行・ログイン") == Vector("安全", "銀行", "ログイン"))
    assert(Tokenize.terms("") == Vector())
  }
}

class TfIdfSpec extends AnyFunSuite {
  val docs = Seq(Seq("apple", "banana"), Seq("banana", "cherry"), Seq("apple"))
  val m = TfIdf.fit(docs)

  test("vocab first-occurrence order") {
    assert(m.vocab == Vector("apple", "banana", "cherry"))
  }

  test("idf = ln(n/df) + 1 (no smoothing)") {
    val e = 1e-12
    assert(math.abs(m.idf(0) - (math.log(3.0 / 2) + 1)) < e)
    assert(math.abs(m.idf(1) - (math.log(3.0 / 2) + 1)) < e)
    assert(math.abs(m.idf(2) - (math.log(3.0) + 1)) < e)
  }

  test("rows L2-normalized") {
    for (row <- m.tfidf) {
      val n = math.sqrt(row.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12)
    }
    // doc0: equal idf weights → 1/sqrt(2) each
    assert(math.abs(m.tfidf(0)(0) - 1 / math.sqrt(2)) < 1e-12)
  }

  test("term selection at 90%: only apple (doc2 gives it 1.0)") {
    assert(TfIdf.selectTerms(m, 0.9) == Vector(0))
  }

  test("elm train matrix + labels") {
    val (x, y) = TfIdf.elmTrainMatrix(m, Seq(0), 0.9)
    assert(x.map(_.toSeq).toSeq == Seq(Seq(0.0), Seq(0.0), Seq(1.0)))
    assert(y.toSeq == Seq(0.0, 0.0, 1.0))
  }
}

class ElmSpec extends AnyFunSuite {
  test("deterministic under fixed seed; fits separable data") {
    val x = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0), Array(0.0, 0.0))
    val y = Array(1.0, 0.0, 1.0, 0.0)
    val m1 = Elm.train(x, y, nHidden = 10, seed = 7)
    val m2 = Elm.train(x, y, nHidden = 10, seed = 7)
    for (r <- x.indices) {
      assert(m1.predict(x(r)) == m2.predict(x(r)))
      assert(m1.predict(x(r)) == y(r))
    }
  }

  test("title scorer builds the vocab membership vector") {
    val x = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val y = Array(1.0, 0.0)
    val m = Elm.train(x, y, nHidden = 8, seed = 3)
    val scorer = new ElmTitleScorer(Array("verify", "welcome"), m)
    assert(scorer.score(Seq("verify", "your", "account")) == m.predict(Array(1.0, 0.0)))
    assert(scorer.score(Seq("welcome")) == m.predict(Array(0.0, 1.0)))
  }
}
