package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly batch (SURVEY.md §2.7) and the crawl loop
  * deliberately stays batch-iterative for order-exactness; this module
  * is the engine's streaming capability for event-shaped inputs: the
  * same transforms run over `spark.read` (batch) and
  * `spark.readStream` (incremental) DataFrames —
  * watermark + windowed aggregation, and gap-based sessionization via
  * `flatMapGroupsWithState` (event-time timeout). `StreamingSpec`
  * drives them through MemoryStream and checks the stateful path agrees
  * with the window-function batch oracle.
  */
object EventStream {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)

  final case class SessionAcc(var startMs: Long, var lastMs: Long,
      var n: Long, var total: Double)

  final case class Session(user_id: Long, session_start_epoch: Long,
      session_end_epoch: Long, n_events: Long, total_value_micro: Long)

  /** Watermarked hourly tumbling-window counts per event type. Works on
    * both batch and streaming inputs (same plan; watermark is a no-op
    * in batch). */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("value")) * 1e6, 0)).cast("long").as("value_micro"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("value_micro"))

  private def finish(uid: Long, a: SessionAcc): Session =
    // HALF_UP like both SQL oracles' round() — math.rint (half-even)
    // would diverge by 1 micro on exact .5 ties
    Session(uid, a.startMs / 1000L, a.lastMs / 1000L, a.n,
      BigDecimal(a.total * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** Gap-based sessionization with `flatMapGroupsWithState`:
    * sessions close after `gapSec` of event-time silence.
    *
    * Streaming (`emitOpen = false`, requires an upstream
    * `withWatermark("ts", …)`): the open session is carried in
    * GroupState across micro-batches and emitted when the event-time
    * timeout fires past the watermark. Batch (`emitOpen = true`): each
    * group is processed once and the trailing open session is emitted
    * too — the bounded-input closure of the same logic. */
  def sessionize(events: Dataset[Ev], gapSec: Long, emitOpen: Boolean): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    val timeout =
      if (emitOpen) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout

    val fn = (uid: Long, it: Iterator[Ev], state: GroupState[SessionAcc]) => {
      if (state.hasTimedOut) {
        val closed = finish(uid, state.get)
        state.remove()
        Iterator(closed)
      } else {
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[Session]
        var acc: SessionAcc = state.getOption.orNull
        for (e <- sorted) {
          // FLOOR to the second boundary: the window-SQL oracles gap on
          // unix_timestamp (whole seconds), so an exact-ms gap here
          // would split/merge differently on boundary-straddling pairs
          // (the fixture timestamps all carry sub-second parts)
          val t = Math.floorDiv(e.ts.getTime, 1000L) * 1000L
          if (acc == null) acc = SessionAcc(t, t, 1, e.value)
          else if (t - acc.lastMs > gapMs) {
            out += finish(uid, acc)
            acc = SessionAcc(t, t, 1, e.value)
          } else {
            // max/min, not assignment: a late event arriving in a later
            // micro-batch (within watermark) must not rewind the session
            // bounds or the gap/timeout baseline
            acc.lastMs = math.max(acc.lastMs, t)
            acc.startMs = math.min(acc.startMs, t)
            acc.n += 1; acc.total += e.value
          }
        }
        if (emitOpen) {
          if (acc != null) out += finish(uid, acc)
          state.remove()
        } else if (acc != null) {
          state.update(acc)
          state.setTimeoutTimestamp(acc.lastMs + gapMs)
        }
        out.result().iterator
      }
    }
    events.groupByKey(_.user_id).flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** Batch sessionization as pure window SQL (the DuckDB-checkable
    * oracle shape): a new session starts when the gap to the previous
    * event of the same user exceeds `gapSec`; session_id = running sum
    * of session starts. */
  def sessionizeSqlSpark(gapSec: Long): String =
    s"""WITH l AS (
       |  SELECT user_id, event_id, value, ts, unix_timestamp(ts) AS es,
       |         lag(unix_timestamp(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (SELECT *, CASE WHEN prev IS NULL OR es - prev > $gapSec THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  min(es) AS session_start_epoch, max(es) AS session_end_epoch,
       |  cast(round(sum(value) * 1000000, 0) as bigint) AS total_value_micro
       |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Same computation in the DuckDB dialect (epoch() is fractional —
    * floored to whole seconds to match Spark's unix_timestamp). */
  def sessionizeSqlDuck(gapSec: Long): String =
    s"""WITH l AS (
       |  SELECT user_id, event_id, value, ts, cast(floor(epoch(ts)) as bigint) AS es,
       |         lag(cast(floor(epoch(ts)) as bigint)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (SELECT *, CASE WHEN prev IS NULL OR es - prev > $gapSec THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
       |SELECT user_id, cast(session_id as bigint) AS session_id, count(*) AS n_events,
       |  min(es) AS session_start_epoch, max(es) AS session_end_epoch,
       |  cast(round(sum(value) * 1000000, 0) as bigint) AS total_value_micro
       |FROM s GROUP BY user_id, session_id""".stripMargin
}
