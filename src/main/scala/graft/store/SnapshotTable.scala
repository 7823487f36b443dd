package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-like versioned snapshot store over plain Parquet.
  *
  * No Iceberg jar exists in this sandbox (SURVEY.md §7.1), so this module
  * provides the narrow subset the crawl engine needs with the same
  * guarantees, and the trait boundary a real Iceberg catalog would drop
  * into:
  *
  *  - layout: `<root>/v%05d/<table>/` Parquet dirs + `<root>/v%05d/manifest.json`;
  *  - commits are ATOMIC: data is staged under `<root>/_staging_v%05d`,
  *    then a single directory rename publishes the version; the manifest
  *    is written inside the staged dir BEFORE the rename, so a version
  *    directory is complete iff it exists — a crash mid-commit leaves
  *    only a `_staging_*` dir, which readers ignore and a retried commit
  *    overwrites (idempotent re-commit);
  *  - resume: `latestVersion` = max published `v*`; readers never see a
  *    partial snapshot;
  *  - lineage: the manifest records per-table row counts, the wave
  *    metrics map, and the parent version.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  private def vdir(v: Int): Path = Paths.get(root, f"v$v%05d")
  private def staging(v: Int): Path = Paths.get(root, f"_staging_v$v%05d")

  def latestVersion: Option[Int] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return None
    val vs = Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{5}") => s.substring(1).toInt }
      .toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Commit `tables` (+ metrics lineage) as the next version; returns it.
    * `expectedParent` guards against concurrent/duplicate commits: the
    * commit is refused if the current latest is not the parent we built
    * from (optimistic concurrency, the Iceberg commit rule). */
  def commit(tables: Map[String, DataFrame], metrics: Map[String, Long] = Map.empty,
      expectedParent: Option[Int] = None): Int = {
    val parent = latestVersion
    if (expectedParent.isDefined && parent != expectedParent)
      throw new IllegalStateException(
        s"snapshot conflict: latest=$parent expectedParent=$expectedParent")
    val v = parent.getOrElse(0) + 1
    val stage = staging(v)
    deleteRecursively(stage) // retried commit: clear leftover staging
    Files.createDirectories(stage)
    val counts = tables.map { case (name, df) =>
      df.write.mode("overwrite").parquet(stage.resolve(name).toString)
      // count from the written files so the manifest reflects what is on disk
      name -> spark.read.parquet(stage.resolve(name).toString).count()
    }
    val manifest = render(v, parent, counts, metrics)
    Files.writeString(stage.resolve("manifest.json"), manifest)
    Files.move(stage, vdir(v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  def read(table: String, version: Int): DataFrame =
    spark.read.parquet(vdir(version).resolve(table).toString)

  def readLatest(table: String): Option[DataFrame] =
    latestVersion.map(read(table, _))

  def manifest(version: Int): String =
    Files.readString(vdir(version).resolve("manifest.json"))

  private def render(v: Int, parent: Option[Int], counts: Map[String, Long],
      metrics: Map[String, Long]): String = {
    def obj(m: Map[String, Long]) =
      m.toSeq.sortBy(_._1).map { case (k, x) => s""""$k": $x""" }.mkString("{", ", ", "}")
    s"""{"version": $v, "parent": ${parent.getOrElse(0)}, "row_counts": ${obj(counts)}, "metrics": ${obj(metrics)}}"""
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
}
