package graft

import graft.store.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("replace-commit publishes atomically; latest tracks; read round-trips") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    assert(st.latestVersion.isEmpty)
    val v1 = st.commit(replace = Map("t" -> Seq(1, 2, 3).toDF("x")),
      metrics = Map("k" -> 7L), rowCounts = Map("t" -> 3L))
    assert(v1 == 1 && st.latestVersion.contains(1))
    val v2 = st.commit(replace = Map("t" -> Seq(4).toDF("x")))
    assert(v2 == 2)
    assert(st.read("t", 1).count() == 3)
    assert(st.readLatest("t").get.count() == 1)
    assert(st.manifest(1).contains("\"t\": 3"))
    assert(st.manifest(1).contains("\"k\": 7"))
  }

  test("manifest survives quotes/backslashes in table and metric keys") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-esc-").toString
    val st = new SnapshotTable(spark, root)
    val weird = "host \"a\"\\b"
    st.commit(replace = Map("t" -> Seq(1).toDF("x")),
      metrics = Map(weird -> 7L))
    // the NEXT commit parses the previous manifest — an unescaped key
    // bricked the store here
    val v2 = st.commit(replace = Map("t" -> Seq(2).toDF("x")))
    assert(st.metricsOf(1).get(weird).contains(7L))
    assert(st.read("t", v2).count() == 1)
  }

  test("latestVersion sees versions past 99999 (%05d pads, never truncates)") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-big-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(replace = Map("t" -> Seq(1).toDF("x")))
    val manifests = java.nio.file.Paths.get(root, "manifests")
    java.nio.file.Files.copy(manifests.resolve("v00001.json"),
      manifests.resolve("v100000.json"))
    // drop the hint: an externally-assembled GAP is only discoverable
    // by the listing fallback (commit() itself never skips versions)
    java.nio.file.Files.delete(manifests.resolve("version-hint.text"))
    assert(st.latestVersion.contains(100000))
  }

  test("version hint: O(1) resolution, heals a lagging hint, survives garbage") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-hint-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(replace = Map("t" -> Seq(1).toDF("x")))
    st.commit(replace = Map("t" -> Seq(2).toDF("x")))
    val hint = java.nio.file.Paths.get(root, "manifests", "version-hint.text")
    assert(java.nio.file.Files.readString(hint).trim == "2")
    // crash between manifest publish and hint write → hint lags by one;
    // the forward probe heals it (versions are contiguous by commit())
    java.nio.file.Files.writeString(hint, "1")
    assert(st.latestVersion.contains(2))
    val v3 = st.commit(replace = Map("t" -> Seq(3).toDF("x")))
    assert(v3 == 3 && java.nio.file.Files.readString(hint).trim == "3")
    // garbage / out-of-range hints fall back to the listing
    java.nio.file.Files.writeString(hint, "not-a-number")
    assert(st.latestVersion.contains(3))
    java.nio.file.Files.writeString(hint, "999")
    assert(st.latestVersion.contains(3))
  }

  test("a table whose rows arrive ONLY via appendRef is readable") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-refonly-").toString
    val st = new SnapshotTable(spark, root)
    // pre-written parquet the ref adopts (the ViewRef pattern: existing
    // data files become table rows without a second write)
    val base = "scratch/pre"
    Seq((1, "a", true), (2, "b", false)).toDF("id", "s", "ok")
      .write.parquet(java.nio.file.Paths.get(root, base, "wave=0").toString)
    val v = st.commit(appendRef = Map("only_ref" -> SnapshotTable.ViewRef(
      base, Seq(s"$base/wave=0"), "ok", Seq("id", "s"))))
    // the manifest must carry the table entry (no data dirs) so read()
    // resolves it and serves the view rows
    val got = st.read("only_ref", v).collect()
    assert(got.map(_.getInt(0)).toSet == Set(1))
    // a later plain append composes with the ref rows
    val v2 = st.commit(append = Map("only_ref" -> Seq((3, "c")).toDF("id", "s")))
    assert(st.read("only_ref", v2).count() == 2)
  }

  test("append tables accumulate deltas across versions; time travel works") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(append = Map("log" -> Seq(1).toDF("x")))
    st.commit(append = Map("log" -> Seq(2, 3).toDF("x")))
    st.commit(replace = Map("state" -> Seq("a").toDF("s")),
      append = Map("log" -> Seq(4).toDF("x")))
    assert(st.read("log", 1).as[Int].collect().sorted.toSeq == Seq(1))
    assert(st.read("log", 2).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(st.read("log", 3).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(st.read("state", 3).count() == 1)
  }

  test("optimistic concurrency: stale parent refused") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(replace = Map("t" -> Seq(1).toDF("x")))
    st.commit(replace = Map("t" -> Seq(2).toDF("x")))
    intercept[IllegalStateException] {
      st.commit(replace = Map("t" -> Seq(3).toDF("x")), expectedParent = Some(1))
    }
  }

  test("squash compacts the dir-list tail; content identical; misuse refused") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-squash-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(append = Map("log" -> Seq(1).toDF("x")))
    st.commit(append = Map("log" -> Seq(2, 3).toDF("x")))
    st.commit(append = Map("log" -> Seq(4).toDF("x")))
    assert(st.tableDirs(3)("log").length == 3)

    // keep dir 0, fold dirs 1.. plus a new delta into ONE write
    val tail = st.readTail("log", 3, 1).unionByName(Seq(5).toDF("x"))
    val v4 = st.commit(squash = Map("log" -> (1, tail)))
    assert(st.tableDirs(v4)("log").length == 2)
    assert(st.read("log", v4).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // time travel unaffected: v3 still reads its own dirs
    assert(st.read("log", 3).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    // empty-tail read synthesizes from the manifest schema
    assert(st.readTail("log", v4, 2).count() == 0)

    intercept[IllegalArgumentException] { // keep out of range
      st.commit(squash = Map("log" -> (5, Seq(9).toDF("x"))))
    }
    intercept[IllegalArgumentException] { // same table squash + append
      st.commit(append = Map("log" -> Seq(9).toDF("x")),
        squash = Map("log" -> (0, Seq(9).toDF("x"))))
    }
    // view-bearing tables refuse (squash replaces dirs only; view rows
    // would survive and duplicate)
    Seq((1, true)).toDF("id", "ok")
      .write.parquet(java.nio.file.Paths.get(root, "scratch/sq", "wave=0").toString)
    st.commit(appendRef = Map("viewed" -> SnapshotTable.ViewRef(
      "scratch/sq", Seq("scratch/sq/wave=0"), "ok", Seq("id"))))
    intercept[IllegalArgumentException] {
      st.commit(squash = Map("viewed" -> (0, Seq(1).toDF("id"))))
    }
  }

  test("expire deletes old manifests and the dirs only they reference") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-expire-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(replace = Map("r" -> Seq(1).toDF("x")), append = Map("a" -> Seq(1).toDF("x")))
    st.commit(replace = Map("r" -> Seq(2).toDF("x")), append = Map("a" -> Seq(2).toDF("x")))
    st.commit(append = Map("a" -> Seq(3).toDF("x")))
    st.commit(append = Map("a" -> Seq(4).toDF("x")))
    val rv1 = java.nio.file.Paths.get(root, "data", "r", "v00001")
    val rv2 = java.nio.file.Paths.get(root, "data", "r", "v00002")
    assert(java.nio.file.Files.isDirectory(rv1))
    val (m, d) = st.expire(keepLast = 2)
    assert(m == 2 && d == 1)
    // r's v1 write was referenced only by the expired manifests; r's v2
    // write and ALL of a's deltas are carried forward by kept manifests
    assert(!java.nio.file.Files.exists(rv1) && java.nio.file.Files.isDirectory(rv2))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "manifests", "v00001.json")))
    assert(st.read("a", 4).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(st.read("r", 3).as[Int].collect().toSeq == Seq(2))
    assert(st.latestVersion.contains(4))
    val v5 = st.commit(append = Map("a" -> Seq(5).toDF("x")))
    assert(v5 == 5)
    assert(st.expire(10) == ((0, 0))) // nothing past the window: no-op
    intercept[IllegalArgumentException] { st.expire(0) }
  }

  test("expire: alwaysKeep pins the init manifest; scratch dirs follow references") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-expire2-").toString
    val st = new SnapshotTable(spark, root)
    Seq((1, true)).toDF("id", "ok").write
      .parquet(java.nio.file.Paths.get(root, "scratch/s", "wave=0").toString)
    st.commit(append = Map("a" -> Seq(1).toDF("x")),
      appendRef = Map("v" -> SnapshotTable.ViewRef(
        "scratch/s", Seq("scratch/s/wave=0"), "ok", Seq("id"))),
      metrics = Map("layout" -> 42L))
    st.commit(append = Map("a" -> Seq(2).toDF("x")))
    // v3 REPLACES the view-backed table (drops its views), v4 appends on
    st.commit(replace = Map("v" -> Seq(9).toDF("id")),
      append = Map("a" -> Seq(3).toDF("x")))
    st.commit(append = Map("a" -> Seq(4).toDF("x")))
    val scratch = java.nio.file.Paths.get(root, "scratch/s", "wave=0")
    // keep {3,4} + pinned v1: only v2 expires, and the scratch dir
    // survives because the PINNED manifest still references it
    val (m1, _) = st.expire(2, alwaysKeep = Set(1))
    assert(m1 == 1)
    assert(java.nio.file.Files.exists(scratch))
    assert(st.metricsOf(1).get("layout").contains(42L))
    // drop the pin: v1 expires and takes the now-unreferenced scratch
    // dir with it (kept manifests reference only the replace write)
    val (m2, d2) = st.expire(2)
    assert(m2 == 1 && d2 == 1)
    assert(!java.nio.file.Files.exists(scratch))
    assert(st.read("v", 4).as[Int].collect().toSeq == Seq(9))
    assert(st.read("a", 4).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("removeOrphans deletes only old unreferenced dirs") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-orphan-").toString
    val st = new SnapshotTable(spark, root)
    Seq((1, true)).toDF("id", "ok").write
      .parquet(java.nio.file.Paths.get(root, "scratch/pre", "wave=0").toString)
    st.commit(replace = Map("t" -> Seq(1).toDF("x")),
      appendRef = Map("v" -> SnapshotTable.ViewRef(
        "scratch/pre", Seq("scratch/pre/wave=0"), "ok", Seq("id"))))
    // crash leftovers: a data dir whose commit never published, and a
    // scratch dir no manifest adopted
    val orphanData = java.nio.file.Paths.get(root, "data", "t", "v00002")
    val orphanScratch = java.nio.file.Paths.get(root, "scratch/pre", "wave=9")
    Seq(7).toDF("x").write.parquet(orphanData.toString)
    Seq((9, true)).toDF("id", "ok").write.parquet(orphanScratch.toString)
    // too new → protected by the age threshold
    assert(st.removeOrphans(olderThanMs = 3600L * 1000) == 0)
    // age everything: referenced dirs must STILL survive on reference
    val old = java.nio.file.attribute.FileTime.fromMillis(1L)
    for (d <- Seq(orphanData, orphanScratch,
        java.nio.file.Paths.get(root, "data", "t", "v00001"),
        java.nio.file.Paths.get(root, "scratch/pre", "wave=0")))
      java.nio.file.Files.setLastModifiedTime(d, old)
    assert(st.removeOrphans(olderThanMs = 3600L * 1000) == 2)
    assert(!java.nio.file.Files.exists(orphanData))
    assert(!java.nio.file.Files.exists(orphanScratch))
    assert(st.read("t", 1).as[Int].collect().toSeq == Seq(1))
    assert(st.read("v", 1).as[Int].collect().toSeq == Seq(1))
    // the store keeps committing into the reclaimed version slot
    assert(st.commit(replace = Map("t" -> Seq(2).toDF("x"))) == 2)
  }

  test("model fuzz: random commit/squash/expire/orphan interleavings match an in-memory model") {
    import spark.implicits._
    // the single-op semantics are pinned above; this pins their
    // INTERACTIONS (expire after squash, squash after expire's dir
    // deletions, orphan sweeps between) against a trivial model:
    // per-table content multiset + latest-version dir count
    val root = Files.createTempDirectory("snap-fuzz-").toString
    val st = new SnapshotTable(spark, root)
    val rnd = new scala.util.Random(20260820L)
    val names = Vector("alpha", "beta", "gamma")
    val content = scala.collection.mutable.Map[String, Vector[Int]]()
    val dirs = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    var nextVal = 0
    def fresh(n: Int) = { val v = (nextVal until nextVal + n).toVector; nextVal += n; v }
    var latest = 0
    def checkAll(step: Int): Unit =
      for (t <- content.keys)
        assert(st.read(t, latest).as[Int].collect().sorted.toVector ==
          content(t).sorted, s"step $step table $t diverged")
    for (step <- 1 to 36) {
      rnd.nextInt(10) match {
        case k if k <= 4 =>
          val t = names(rnd.nextInt(names.size))
          val vs = fresh(1 + rnd.nextInt(3))
          latest = st.commit(append = Map(t -> vs.toDF("x")))
          content(t) = content.getOrElse(t, Vector()) ++ vs; dirs(t) += 1
        case 5 | 6 =>
          val t = names(rnd.nextInt(names.size))
          val vs = fresh(1 + rnd.nextInt(3))
          latest = st.commit(replace = Map(t -> vs.toDF("x")))
          content(t) = vs; dirs(t) = 1
        case 7 =>
          val cand = names.filter(dirs(_) >= 2)
          if (cand.nonEmpty) {
            val t = cand(rnd.nextInt(cand.size))
            val keep = rnd.nextInt(dirs(t))
            val delta = fresh(1)
            val df = st.readTail(t, latest, keep).unionByName(delta.toDF("x"))
            latest = st.commit(squash = Map(t -> (keep, df)))
            content(t) = content(t) ++ delta; dirs(t) = keep + 1
            checkAll(step)
          }
        case 8 =>
          if (latest >= 1) {
            st.expire(1 + rnd.nextInt(3),
              alwaysKeep = if (rnd.nextBoolean()) Set(1) else Set.empty)
            checkAll(step)
          }
        case 9 =>
          // zero-age sweep: everything on disk is referenced by some
          // remaining manifest, so this must change nothing readable
          st.removeOrphans(0L)
          checkAll(step)
      }
    }
    checkAll(99)
    // the store still commits and the hint still tracks after the storm
    val fin = st.commit(append = Map("alpha" -> Seq(424242).toDF("x")))
    assert(st.latestVersion.contains(fin))
  }

  test("crash mid-commit leaves no visible version; retry overwrites orphan data") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-").toString
    val st = new SnapshotTable(spark, root)
    st.commit(replace = Map("t" -> Seq(1).toDF("x")))
    // simulate a crash AFTER data write, BEFORE manifest publish:
    Seq(7, 8).toDF("x").write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(root, "data", "t", "v00002").toString)
    assert(st.latestVersion.contains(1)) // orphan data is invisible
    val v2 = st.commit(replace = Map("t" -> Seq(9).toDF("x")))
    assert(v2 == 2 && st.read("t", 2).as[Int].collect().toSeq == Seq(9))
  }

  test("verify(): healthy stores fsck clean; every planted corruption class is reported") {
    import spark.implicits._
    val root = Files.createTempDirectory("snap-fsck-").toString
    val st = new SnapshotTable(spark, root)
    assert(st.verify().isEmpty) // empty store: trivially healthy

    // a store exercising every shape verify walks: data dirs, appends,
    // a ViewRef group, recorded row_counts, squash, orphans
    val base = "scratch/pre"
    Seq((1, true), (2, false)).toDF("id", "ok")
      .write.parquet(java.nio.file.Paths.get(root, base, "wave=0").toString)
    st.commit(replace = Map("t" -> Seq(1, 2, 3).toDF("x")), rowCounts = Map("t" -> 3L))
    st.commit(append = Map("t" -> Seq(4).toDF("x")),
      appendRef = Map("v" -> SnapshotTable.ViewRef(base, Seq(s"$base/wave=0"), "ok", Seq("id"))),
      rowCounts = Map("t" -> 1L, "v" -> 1L))
    assert(st.verify(deepVersions = 2).isEmpty)
    // an orphan (crash leftover) is NOT a corruption
    Seq(9).toDF("x").write
      .parquet(java.nio.file.Paths.get(root, "data", "t", "v00009").toString)
    assert(st.verify().isEmpty)

    // corruption 1: recorded row_counts disagree with the data on disk
    val lying = st.commit(append = Map("t" -> Seq(5, 6).toDF("x")),
      rowCounts = Map("t" -> 7L))
    val p1 = st.verify()
    assert(p1.exists(m => m.contains("row_counts=7") && m.contains("2 rows")), p1.mkString("; "))

    // corruption 2: a referenced data dir vanishes
    val dir = st.tableDirs(lying)("t").head
    val moved = java.nio.file.Paths.get(root, dir + ".hidden")
    java.nio.file.Files.move(java.nio.file.Paths.get(root, dir), moved)
    assert(st.verify().exists(_.contains("missing data dir")))
    java.nio.file.Files.move(moved, java.nio.file.Paths.get(root, dir))

    // corruption 3: a referenced view dir vanishes
    val vmoved = java.nio.file.Paths.get(root, base, "wave=0.hidden")
    java.nio.file.Files.move(java.nio.file.Paths.get(root, base, "wave=0"), vmoved)
    assert(st.verify().exists(_.contains("missing view dir")))
    java.nio.file.Files.move(vmoved, java.nio.file.Paths.get(root, base, "wave=0"))

    // corruption 4: an unparseable manifest
    val mp = java.nio.file.Paths.get(root, "manifests", f"v$lying%05d.json")
    val good = java.nio.file.Files.readString(mp)
    java.nio.file.Files.writeString(mp, good.dropRight(5))
    assert(st.verify().exists(_.contains("unreadable")))
    java.nio.file.Files.writeString(mp, good)
  }
}
