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

  test("strip is unicode.strip: NBSP/NEL padding drops, interior stays") {
    // both reference call sites are unicode (codecs.open utf-8 /
    // BeautifulSoup .text): u'\xa0Login\xa0'.strip() -> u'Login'
    assert(Tokenize.terms("\u00A0\u0085 Secure Login\u202F") ==
      Vector("secure", "login"))
    // interior NBSP is NOT a delimiter or split space: it stays in the token
    assert(Tokenize.terms("a\u00A0b") == Vector("a\u00a0b"))
    // token lowering is the simple unicode mapping: 'İ' -> 'i', not "i̇"
    assert(Tokenize.terms("\u0130stanbul Bankas\u0131") ==
      Vector("istanbul", "bankas\u0131"))
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

class LcElmSpec extends AnyFunSuite {
  private val x = Array(
    Array(1.0, 0.1), Array(0.9, 0.0), Array(1.1, 0.2), Array(0.8, 0.1),
    Array(0.0, 1.0), Array(0.1, 0.9), Array(0.2, 1.1), Array(0.0, 0.8))
  private val y = Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)

  test("deterministic; members vote ±1; combiner fits separable data") {
    val m1 = LcElm.train(x, y, nEstimators = 7, nHidden = 10, seed = 11)
    val m2 = LcElm.train(x, y, nEstimators = 7, nHidden = 10, seed = 11)
    for (r <- x.indices) {
      assert(m1.f(x(r)).forall(v => v == 1.0 || v == -1.0))
      assert(m1.predict(x(r)) == m2.predict(x(r)))
    }
    // positive class rows must predict 1 (fitted ≈ 1 → sign > 0);
    // the reference quirk (lc-elm.py:61-63,101-103) makes class-0 rows
    // sit at fitted ≈ 0 — assert only the stable half
    for (r <- 0 until 4) assert(m1.predict(x(r)) == 1.0, s"row $r")
  }

  test("identicalMembers reproduces the reference's same-seed rank-1 ensemble") {
    val m = LcElm.train(x, y, nEstimators = 5, nHidden = 10, seed = 11,
      identicalMembers = true)
    // all member columns identical → F is rank 1
    for (r <- x.indices) {
      val fx = m.f(x(r))
      assert(fx.distinct.length == 1)
    }
  }
}

class FeatureVectorsSpec extends AnyFunSuite {
  import graft.sources.FeatureVectors

  test("plain numeric line parses; booleans coerce 0/1") {
    assert(FeatureVectors.parseLine("[1, 2.5, true, false]").get.toSeq ==
      Seq(1.0, 2.5, 1.0, 0.0))
  }

  test("element [-4] list is spliced OUT (lc-elm.py:188-191)") {
    assert(FeatureVectors.parseLine("""[1, 2, [9, 9], 3, 4, 5]""").get.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // a list NOT at [-4] is untouched → malformed numeric coercion is
    // the caller's concern; here [-4] is scalar so splice does not fire
    assert(FeatureVectors.parseLine("""[1, 2, 3, 4]""").get.toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("blank and malformed lines drop; distributed read returns vec rows") {
    assert(FeatureVectors.parseLine("   ").isEmpty)
    assert(FeatureVectors.parseLine("{\"not\": \"array\"}").isEmpty)
    // non-numeric ELEMENTS are malformed too (asDouble would silently
    // coerce them to 0.0 and corrupt the training matrix)
    assert(FeatureVectors.parseLine("[1, \"oops\", 3]").isEmpty)
    assert(FeatureVectors.parseLine("[1, null, 3]").isEmpty)
    assert(FeatureVectors.parseLine("[[7], 1]").isEmpty) // list NOT at [-4]
    assert(FeatureVectors.parseLine("[1, [7], 2, 3, 4]").toSeq.map(_.toSeq) ==
      Seq(Seq(1.0, 2.0, 3.0, 4.0))) // list AT [-4] splices out
    val spark = SparkTestBase.spark
    val p = java.nio.file.Files.createTempDirectory("fv-").resolve("v.jsonl")
    java.nio.file.Files.writeString(p,
      "[1, 2, [7], 3, 4, 5]\n\n[0.5, true]\nnot json\n")
    val df = FeatureVectors.read(spark, p.toString)
    val rows = df.collect().map(_.getSeq[Double](0).toSeq).sortBy(_.length)
    assert(rows.length == 2)
    assert(rows.contains(Seq(1.0, 2.0, 3.0, 4.0, 5.0)))
    assert(rows.contains(Seq(0.5, 1.0)))
  }
}

class TermFileSpec extends AnyFunSuite {
  import java.nio.file.Files

  test("round trip in the reference's exact shape; refuses overwrite") {
    val dir = Files.createTempDirectory("tf-")
    val p = dir.resolve("tfidf 50% term")
    TermFile.write(p, Seq(0, 2, 5), Seq("verify", "account", "login"))
    assert(Files.readString(p) == "[0, 2, 5]\nverify account login")
    val (idx, terms) = TermFile.read(p)
    assert(idx == Vector(0, 2, 5) && terms == Vector("verify", "account", "login"))
    intercept[IllegalStateException] { TermFile.write(p, Seq(1), Seq("x")) }
  }

  test("parses the shipped reference corpora shape") {
    val (idx, terms) = TermFile.parse("[0, 1, 2]\nfoo bar baz")
    assert(idx == Vector(0, 1, 2) && terms == Vector("foo", "bar", "baz"))
    assert(TermFile.parse("[]\n")._2.isEmpty)
  }
}

class TitlesSpec extends AnyFunSuite {
  test("title-list scan keeps blank lines as empty titles, strips each, preserves order") {
    val spark = SparkTestBase.spark
    val p = java.nio.file.Files.createTempDirectory("titles-").resolve("t.txt")
    java.nio.file.Files.writeString(p, "  Verify your account \n\nWelcome page\n")
    val rows = graft.sources.Titles.read(spark, p.toString)
      .orderBy("line_no").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("Verify your account", "", "Welcome page"))
    // line_no is the readlines() index: contiguous from 0
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }
}
