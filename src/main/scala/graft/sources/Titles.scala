package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: title-list scan (`tfidf-elm.py:31-41`): one title per line,
  * every line kept (INCLUDING empties — the reference readlines() keeps
  * them and strip()s each in place, so blank lines become empty-string
  * titles, which then tokenize to nothing), line order preserved via
  * an index column. Distributed `spark.read.text` — splittable, no
  * driver loop. */
object Titles {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(t => graft.py.Py.strip(t)) // Python unicode.strip semantics
      .toDF("title")
      .withColumn("idx", monotonically_increasing_id())
      .select("idx", "title")
  }
}
