package graft

import java.sql.Timestamp

import graft.stream.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("batch sessionization: gap starts a new session, stats exact") {
    val events = Seq(
      (1L, ts(0), 1.25), (1L, ts(10), 2.0), (1L, ts(1810), 0.5), // one session (gaps ≤ 1800)
      (1L, ts(4000), 3.0),                                       // new session
      (2L, ts(5), 10.0))                                         // other key
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionStats(events, gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 0L, 1810L, 3L, 375L),   // 125 + 200 + 50 centi-units
      (1L, 4000L, 4000L, 1L, 300L),
      (2L, 5L, 5L, 1L, 1000L)))
  }

  test("tied timestamps share a session deterministically") {
    val events = Seq(
      (1L, ts(100), 1.0), (1L, ts(100), 2.0), (1L, ts(100), 3.0))
      .toDF("user_id", "ts", "value")
    val got = Sessions.sessionStats(events, gapSeconds = 10).collect()
    assert(got.length == 1)
    assert(got.head.getLong(3) == 3L && got.head.getLong(4) == 600L)
  }

  test("streaming session_window replay matches the batch islands") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = Sessions.streamingSessionStats(
      input.toDF().toDF("user_id", "ts", "value"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try {
      val batch = Seq(
        (1L, ts(0), 1.25), (1L, ts(10), 2.0), (1L, ts(1810), 0.5),
        (1L, ts(4000), 3.0), (2L, ts(5), 10.0))
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .select("user_id", "session_start", "n_events", "value_q2")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batched = Sessions.sessionStats(batch.toDF("user_id", "ts", "value"),
        gapSeconds = 1800)
        .select("user_id", "session_start", "n_events", "value_q2")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batched)
    } finally q.stop()
  }

  test("session windows are keyed (no global window)") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val events = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value")
    val plan = Sessions.sessionStats(events, 60).queryExecution.optimizedPlan
    assert(plan.collect { case w: Window if w.partitionSpec.isEmpty => w }.isEmpty)
  }
}
