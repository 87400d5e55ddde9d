package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream — the standard
 * user-activity analytics the reference's time-bucket grouping can't
 * express (a session is data-driven, not wall-clock-aligned): events of
 * one key belong to the same session while consecutive gaps stay within
 * `gapSeconds`.
 *
 * Batch form: one per-key window (partitioned — never global) computes
 * the gap flags, a running sum turns them into session ordinals, one
 * hash-agg emits per-session stats. Two shuffles on the key, both
 * carrying (key, epoch, value) triples.
 *
 * Streaming form: Spark's native `session_window` (watermark-bounded
 * state, sessions close when the gap passes) — the same semantics
 * continuously, used by the spec to pin batch ≡ streaming on a replay.
 *
 * Value sums are integer-quantized per event (centi-units) BEFORE the
 * order-independent integer sum, so results are exact under any
 * partitioning and replicable cross-engine.
 */
object Sessions {

  private def q2(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /**
   * Per-session stats: (key, session_start, session_end, n_events,
   * value_q2) with session bounds in epoch seconds. A session starts at
   * an event whose gap to the key's previous event exceeds `gapSeconds`.
   */
  def sessionStats(events: DataFrame, gapSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val t = unix_timestamp(col(tsCol))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("_t"))
    events
      .select(col(keyCol), t.as("_t"), q2(col(valueCol)).as("_vq"))
      .withColumn("_new",
        when(col("_t") - lag("_t", 1).over(byKey) <= gapSeconds, 0)
          .otherwise(1))
      .withColumn("_session", sum("_new").over(byKey))
      .groupBy(col(keyCol), col("_session"))
      .agg(
        min("_t").as("session_start"),
        max("_t").as("session_end"),
        count(lit(1)).as("n_events"),
        sum("_vq").as("value_q2"))
      .drop("_session")
  }

  /**
   * Streaming twin on the native `session_window`: identical stats per
   * closed session, state bounded by the watermark. Spark merges
   * overlapping per-event [t, t+gap) windows exactly like the batch
   * islands, so a bounded replay produces the same rows.
   */
  def streamingSessionStats(events: DataFrame, gapSeconds: Long,
      watermark: String = "1 hour", keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(q2(col(valueCol))).as("value_q2"))
      .select(col(keyCol),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("value_q2"))
}
