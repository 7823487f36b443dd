package graft

import graft.store.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("commit publishes atomically; latest tracks; read round-trips") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    assert(st.latestVersion.isEmpty)
    val v1 = st.commit(Map("t" -> Seq(1, 2, 3).toDF("x")), Map("k" -> 7L))
    assert(v1 == 1 && st.latestVersion.contains(1))
    val v2 = st.commit(Map("t" -> Seq(4).toDF("x")))
    assert(v2 == 2)
    assert(st.read("t", 1).count() == 3)
    assert(st.readLatest("t").get.count() == 1)
    assert(st.manifest(1).contains("\"row_counts\": {\"t\": 3}"))
  }

  test("optimistic concurrency: stale parent refused") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(Map("t" -> Seq(1).toDF("x")))
    st.commit(Map("t" -> Seq(2).toDF("x")))
    intercept[IllegalStateException] {
      st.commit(Map("t" -> Seq(3).toDF("x")), expectedParent = Some(1))
    }
  }

  test("leftover staging dir is ignored by readers and cleared on retry") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(Map("t" -> Seq(1).toDF("x")))
    // simulate a crash mid-commit of v2
    Files.createDirectories(java.nio.file.Paths.get(root, "_staging_v00002", "junk"))
    assert(st.latestVersion.contains(1))
    val v2 = st.commit(Map("t" -> Seq(9).toDF("x")))
    assert(v2 == 2 && st.read("t", 2).as[Int].collect().toSeq == Seq(9))
  }
}
