package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(min * 60L))

  private val evs = Seq(
    Ev(0, ts(0), 1, 10.0), Ev(1, ts(5), 1, 5.0),   // session A (user 1)
    Ev(2, ts(90), 1, 1.0),                          // gap > 30min → session B
    Ev(3, ts(2), 2, 7.0))                           // user 2

  test("batch stateful sessionization matches the window-SQL shape") {
    import spark.implicits._
    val out = EventStream.sessionize(spark.createDataset(evs), gapSec = 1800, emitOpen = true)
      .collect().sortBy(s => (s.user_id, s.session_start_epoch))
    assert(out.length == 3)
    assert(out(0).user_id == 1 && out(0).n_events == 2 && out(0).total_value_micro == 15000000L)
    assert(out(1).user_id == 1 && out(1).n_events == 1)
    assert(out(2).user_id == 2 && out(2).n_events == 1)
    // cross-check with the pure SQL sessionizer over the same rows
    evs.toDF("event_id", "ts", "user_id", "value").createOrReplaceTempView("events")
    val sqlOut = spark.sql(EventStream.sessionizeSqlSpark(1800))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(sqlOut.map(_._1).toSeq == out.map(_.user_id).toSeq.sorted)
    assert(sqlOut.map(_._3).sum == out.map(_.total_value_micro).sum)
  }

  test("gap compares floored SECONDS (oracle semantics), not exact millis") {
    import spark.implicits._
    // sub-second timestamps straddling the gap boundary: 00:00:00.900 →
    // 00:30:00.100 is 1799.2 s exact but 1800 s floored — the SQL
    // oracles (unix_timestamp/epoch floor) MERGE these; so must we
    def t(ms: Long) = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + ms)
    val e = Seq(Ev(0, t(900), 1, 1.0), Ev(1, t(1800L * 1000 + 100), 1, 1.0))
    val out = EventStream.sessionize(spark.createDataset(e), gapSec = 1800, emitOpen = true)
      .collect()
    assert(out.length == 1 && out(0).n_events == 2)
    // one tick later the floored gap is 1801 s > 1800 → split
    val e2 = Seq(Ev(0, t(900), 1, 1.0), Ev(1, t(1801L * 1000 + 100), 1, 1.0))
    val out2 = EventStream.sessionize(spark.createDataset(e2), gapSec = 1800, emitOpen = true)
      .collect()
    assert(out2.length == 2)
  }

  test("SQL sessionizer: is_new and the running sum share one ordering (intra-second boundary)") {
    import spark.implicits._
    // two boundary rows in the SAME second whose event_id order opposes
    // their sub-second ts order: if the running sum ordered by
    // (es, event_id) while lag ordered by (ts, event_id), the later-ts
    // row would start the new session and the earlier one would attach
    // to the OLD session — violating the gap invariant and diverging
    // from the stateful path
    def t(ms: Long) = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + ms)
    val e = Seq(
      Ev(1, t(500), 7, 1.0),                 // session 1
      Ev(9, t(600L * 1000 + 100), 7, 1.0),   // new session, ts .1
      Ev(2, t(600L * 1000 + 900), 7, 1.0))   // same second, ts .9, LOWER id
    val stateful = EventStream.sessionize(spark.createDataset(e), gapSec = 60, emitOpen = true)
      .collect().sortBy(_.session_start_epoch)
    assert(stateful.map(_.n_events).toSeq == Seq(1, 2))
    e.toDF("event_id", "ts", "user_id", "value").createOrReplaceTempView("events")
    val sqlOut = spark.sql(EventStream.sessionizeSqlSpark(60))
      .collect().map(r => (r.getLong(3), r.getLong(2))) // (start_epoch, n)
      .sortBy(_._1)
    assert(sqlOut.map(_._2).toSeq == Seq(1L, 2L),
      "SQL oracle split sessions differently from the stateful path")
  }

  test("streaming sessionization: state carries across micro-batches, timeout closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = EventStream.sessionize(
      mem.toDS().withWatermark("ts", "0 seconds"), gapSec = 1800, emitOpen = false)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Ev(0, ts(0), 1, 10.0), Ev(1, ts(5), 1, 5.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      // a much later event advances the watermark past the timeout
      mem.addData(Ev(2, ts(90), 1, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(3, ts(300), 2, 7.0))
      q.processAllAvailable()
      val closed = spark.table("sess").as[EventStream.Session].collect()
      assert(closed.exists(s => s.user_id == 1 && s.n_events == 2 && s.total_value_micro == 15000000L))
    } finally q.stop()
  }

  test("a late cross-batch event does not rewind the session bounds or gap baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = EventStream.sessionize(
      mem.toDS().withWatermark("ts", "2 hours"), gapSec = 1800, emitOpen = false)
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Ev(0, ts(10), 1, 1.0))  // lastMs = 00:10
      q.processAllAvailable()
      mem.addData(Ev(1, ts(0), 1, 1.0))   // LATE: must not rewind lastMs
      q.processAllAvailable()
      // 00:35 is 25 min after the true last event (00:10) → same session
      // (a rewound baseline of 00:00 would wrongly split at 35 min)
      mem.addData(Ev(2, ts(35), 1, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(3, ts(600), 2, 1.0)) // advance watermark, close it
      q.processAllAvailable()
      val closed = spark.table("sess_late").as[EventStream.Session].collect()
      assert(closed.exists(s => s.user_id == 1 && s.n_events == 3 &&
        s.session_start_epoch == ts(0).getTime / 1000 &&
        s.session_end_epoch == ts(35).getTime / 1000))
    } finally q.stop()
  }

  test("a late event a full gap BEFORE the open session splits like the batch oracle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = EventStream.sessionize(
      mem.toDS().withWatermark("ts", "2 hours"), gapSec = 1800, emitOpen = false)
    val q = sessions.writeStream.format("memory").queryName("sess_split")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Ev(0, ts(60), 1, 2.0))  // open session at 01:00
      q.processAllAvailable()
      // LATE but admissible (within the 2h watermark): 00:00 is a full
      // hour before the open session — the sorted batch oracle puts it
      // in its OWN session (gap 60min > 30min); an incremental
      // accumulator would merge it (t - lastMs is negative)
      mem.addData(Ev(1, ts(0), 1, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, ts(600), 2, 7.0)) // advance watermark, close both
      q.processAllAvailable()
      val closed = spark.table("sess_split").as[EventStream.Session]
        .collect().filter(_.user_id == 1).sortBy(_.session_start_epoch)
      assert(closed.length == 2, s"got ${closed.toSeq}")
      assert(closed(0).n_events == 1 &&
        closed(0).session_start_epoch == ts(0).getTime / 1000 &&
        closed(0).session_end_epoch == ts(0).getTime / 1000)
      assert(closed(1).n_events == 1 &&
        closed(1).session_start_epoch == ts(60).getTime / 1000)
    } finally q.stop()
  }

  test("hourly windowed counts run on a stream (complete mode) and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (0L, ts(10), 1L, "click", 1.5, "{}"),
      (1L, ts(20), 2L, "click", 2.5, "{}"),
      (2L, ts(70), 1L, "buy", 10.0, "{}"))
    val batch = EventStream.hourlyCounts(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.exists(t => t._2 == "click" && t._3 == 2 && t._4 == 4000000L))

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val streamDf = EventStream.hourlyCounts(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = streamDf.writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
