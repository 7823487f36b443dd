package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10: JSONL feature-vector scan (`train/lc-elm.py:180-196`,
  * `get_data`). Each line is a JSON array of numbers/booleans; blank
  * lines are skipped; when element `[-4]` is itself a list the WHOLE
  * element is spliced out (`json_text[:-4] + json_text[-3:]` — the
  * reference drops the nested keyword list some extractor sets emit at
  * that position). Booleans coerce to 0/1 like the reference's numeric
  * mode (`extractor/__init__.py:22-35`).
  *
  * Distributed shape: `spark.read.text` → per-row parse in a typed
  * map — no driver-side loop, splittable input, columnar output
  * `(vec: array<double>)`. The reference's `length`/`percent`/shuffle
  * knobs are driver-side sampling concerns → `limit`/`sample` on the
  * returned DataFrame.
  */
object FeatureVectors {

  private val mapper = new ObjectMapper()

  /** Numeric value of one element, or None when it is neither a number
    * nor a boolean. Jackson's asDouble() would silently coerce strings,
    * nulls and nested objects to 0.0 — a vector with silent zeros (and
    * possibly the wrong width) entering the training matrix; the
    * reference passes such elements through to numpy, which rejects
    * them, so the row is data no one can train on either way. */
  private def num(n: JsonNode): Option[Double] =
    if (n.isBoolean) Some(if (n.asBoolean()) 1.0 else 0.0)
    else if (n.isNumber) Some(n.asDouble())
    else None

  /** Parse one JSONL line; None for blank/malformed rows (non-array,
    * or any element that is not a number/boolean after the splice). */
  def parseLine(line: String): Option[Array[Double]] = {
    val t = line.trim
    if (t.isEmpty) return None
    val node = try mapper.readTree(t) catch { case _: Exception => return None }
    if (!node.isArray) return None
    val n = node.size()
    val spliced: IndexedSeq[JsonNode] =
      if (n >= 4 && node.get(n - 4).isArray)
        (0 until n - 4).map(node.get) ++ (n - 3 until n).map(node.get)
      else (0 until n).map(node.get)
    val vals = spliced.map(num)
    if (vals.exists(_.isEmpty)) None else Some(vals.map(_.get).toArray)
  }

  /** The scan: one row per valid line, `vec: array<double>`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(parseLine _)
      .toDF("vec")
  }
}
