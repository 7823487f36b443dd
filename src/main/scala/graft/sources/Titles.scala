package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: title-list scan (`tfidf-elm.py:31-41`): one title per line,
  * every line kept (INCLUDING empties — the reference readlines() keeps
  * them and strip()s each in place, so blank lines become empty-string
  * titles, which then tokenize to nothing).
  *
  * `line_no` is the reference's readlines() index: contiguous 0-based
  * file order, produced with RDD `zipWithIndex` (one extra job to count
  * per-partition sizes — worth it: `monotonically_increasing_id` encodes
  * partition offsets and is neither contiguous nor a line number).
  * Distributed `spark.read.text` — splittable, no driver loop. */
object Titles {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .map { case (t, i) => (i, graft.py.Py.stripUni(t)) } // codecs.open → unicode.strip()
      .toDF("line_no", "title")
  }
}
