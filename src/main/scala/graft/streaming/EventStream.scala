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

  /** One buffered event: second-floored epoch ms, tie-order id, value. */
  final case class EvM(t: Long, id: Long, v: Double)

  /** Per-user state: the not-yet-watermark-final events, kept sorted by
    * (t, id). Memory is bounded by the watermark delay + gap per user —
    * the price of exact batch-oracle parity under out-of-order arrival
    * (an incremental (start, last, n, total) accumulator cannot split
    * retroactively when a late event reveals a gap). */
  final case class SessionBuf(evs: Seq[EvM])

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

  private def finishS(uid: Long, s: Seq[EvM]): Session =
    // total summed in (t, id) order; HALF_UP like both SQL oracles'
    // round() — math.rint (half-even) would diverge by 1 micro on
    // exact .5 ties. (Known residual: the oracles' SUM aggregates in
    // arbitrary order, so a session within 1 ULP of an exact .5·1e-6
    // boundary could still round one micro apart — unobserved on the
    // fixture space, inherent to float sums across engines.)
    Session(uid, s.head.t / 1000L, s.last.t / 1000L, s.length.toLong,
      BigDecimal(s.iterator.map(_.v).sum * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  /** Split a (t, id)-sorted event buffer on > gapMs silences. */
  private def splitSorted(evs: Vector[EvM], gapMs: Long): Vector[Vector[EvM]] = {
    if (evs.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Vector[EvM]]
    var cur = Vector.newBuilder[EvM]
    var last = evs.head.t
    for (e <- evs) {
      if (e.t - last > gapMs) { out += cur.result(); cur = Vector.newBuilder[EvM] }
      cur += e
      last = e.t
    }
    out += cur.result()
    out.result()
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`:
    * sessions close after `gapSec` of event-time silence, with EXACT
    * batch-oracle parity under out-of-order arrival.
    *
    * Streaming (`emitOpen = false`, requires an upstream
    * `withWatermark("ts", …)`): the state buffers the user's
    * not-yet-final events ([[SessionBuf]]); a session is emitted only
    * once the watermark passes `end + gap + 999ms` (the floored-second
    * straddle: a raw ts in `(end+gap, end+gap+999]` floors to exactly
    * `end+gap` and still merges), because until then an admissible late
    * event can merge into it — or reveal a gap that splits it. An
    * incremental accumulator gets both cases wrong: a late event BEFORE
    * the open session's span would merge despite violating the gap
    * rule where the sorted batch oracle splits. Batch
    * (`emitOpen = true`): each group is processed once, sorted, split
    * and fully emitted — the bounded-input closure of the same logic. */
  def sessionize(events: Dataset[Ev], gapSec: Long, emitOpen: Boolean): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    val timeout =
      if (emitOpen) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout

    val fn = (uid: Long, it: Iterator[Ev], state: GroupState[SessionBuf]) => {
      // FLOOR to the second boundary: the window-SQL oracles gap on
      // unix_timestamp (whole seconds), so an exact-ms gap here would
      // split/merge differently on boundary-straddling pairs
      val incoming = it.map(e =>
        EvM(Math.floorDiv(e.ts.getTime, 1000L) * 1000L, e.event_id, e.value)).toVector
      val buffered = state.getOption.map(_.evs.toVector).getOrElse(Vector.empty)
      val all = (buffered ++ incoming).sortBy(e => (e.t, e.id))
      val sessions = splitSorted(all, gapMs)
      if (emitOpen) {
        state.remove()
        sessions.iterator.map(s => finishS(uid, s))
      } else {
        val wm = state.getCurrentWatermarkMs()
        // sessions are time-ordered and finality is monotone, so the
        // final prefix can emit; the rest stays buffered
        val (closed, open) = sessions.span(s => s.last.t + gapMs + 999L < wm)
        val rest = open.flatten
        if (rest.isEmpty) state.remove()
        else {
          state.update(SessionBuf(rest))
          // fire when the OLDEST buffered session can finalize; merges
          // only push ends later, so firing early is safe — the
          // hasTimedOut pass re-checks against the real watermark and
          // re-arms (strictly later, since a timeout implies wm >= the
          // old timestamp and the new one is > wm)
          state.setTimeoutTimestamp(
            math.max(open.head.last.t + gapMs + 999L, wm + 1L))
        }
        closed.iterator.map(s => finishS(uid, s))
      }
    }
    events.groupByKey(_.user_id).flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** Batch sessionization as pure window SQL (the DuckDB-checkable
    * oracle shape): a new session starts when the gap to the previous
    * event of the same user exceeds `gapSec`; session_id = running sum
    * of session starts. */
  def sessionizeSqlSpark(gapSec: Long, includeSessionId: Boolean = true): String =
    s"""WITH l AS (
       |  SELECT user_id, event_id, value, ts, unix_timestamp(ts) AS es,
       |         lag(unix_timestamp(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (SELECT *, CASE WHEN prev IS NULL OR es - prev > $gapSec THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
       |SELECT user_id,${if (includeSessionId) " session_id," else ""} count(*) AS n_events,
       |  min(es) AS session_start_epoch, max(es) AS session_end_epoch,
       |  cast(round(sum(value) * 1000000, 0) as bigint) AS total_value_micro
       |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Same computation in the DuckDB dialect (epoch() is fractional —
    * floored to whole seconds to match Spark's unix_timestamp). */
  def sessionizeSqlDuck(gapSec: Long, includeSessionId: Boolean = true): String =
    s"""WITH l AS (
       |  SELECT user_id, event_id, value, ts, cast(floor(epoch(ts)) as bigint) AS es,
       |         lag(cast(floor(epoch(ts)) as bigint)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (SELECT *, CASE WHEN prev IS NULL OR es - prev > $gapSec THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM m)
       |SELECT user_id,${if (includeSessionId) " cast(session_id as bigint) AS session_id," else ""} count(*) AS n_events,
       |  min(es) AS session_start_epoch, max(es) AS session_end_epoch,
       |  cast(round(sum(value) * 1000000, 0) as bigint) AS total_value_micro
       |FROM s GROUP BY user_id, session_id""".stripMargin
}
