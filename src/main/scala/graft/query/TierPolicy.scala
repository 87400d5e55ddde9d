package graft.query

import java.time.{Duration, Instant}
import graft.model.Tier

/**
 * Retention-tier (rollup) selection — the reference's core query
 * optimization (reference: src/integration/tsdb/storage/mapping.go).
 *
 * This is materialized-view matching done as a plain pre-planning
 * function: the query's time range + requested resolution pick the
 * cheapest pre-aggregated tier that can serve it. At 100 TB the win is
 * identical to the reference's: a 1-year dashboard query scans the ~365-row
 * `gen_year` rollup instead of the raw tier.
 */
object TierPolicy {

  val DayMinutes = 24L * 60
  val WeekMinutes = 7 * DayMinutes
  val MonthMinutes = 4 * WeekMinutes // mapping.go:12 MonthDuration = 4 weeks

  /** Xm/Xh/Xd/Xw → minutes (mapping.go:106-122 ResolveDurationFromRelativeTime).
   *  NOTE the reference checks 'h' before 'm' before 'w' via Contains —
   *  reproduced by checking in that order. */
  def relativeToMinutes(rTime: String): Long = {
    def num(suffix: String): Long =
      try rTime.replace(suffix, "").trim.toLong catch { case _: NumberFormatException => 0L }
    if (rTime == null || rTime.isEmpty) 0L
    else if (rTime.contains("h")) num("h") * 60
    else if (rTime.contains("d")) num("d") * DayMinutes
    else if (rTime.contains("m")) num("m")
    else if (rTime.contains("w")) num("w") * WeekMinutes
    else 0L
  }

  /** Elapsed time since `from` → tier (mapping.go:28-45). */
  def resolveByElapsedMinutes(minutesSinceNow: Long, profile: String): Tier = {
    if (profile != Tier.ProfileOptimized) return Tier.GenRaw
    if (minutesSinceNow > 12 * MonthMinutes) Tier.GenYear
    else if (minutesSinceNow > MonthMinutes) Tier.GenMonth
    else if (minutesSinceNow > WeekMinutes) Tier.GenWeek
    else if (minutesSinceNow > DayMinutes) Tier.GenDay
    else Tier.GenRaw
  }

  /** Requested GROUP BY time bucket → coarsest tier that natively serves it
   *  (mapping.go:83-103 ResolveRetentionByTimeGroup). */
  def resolveByTimeGroup(timeGroup: String, profile: String): Tier = {
    if (profile != Tier.ProfileOptimized) return Tier.GenRaw
    val m = relativeToMinutes(timeGroup)
    if (m >= DayMinutes) Tier.GenYear
    else if (m >= 60) Tier.GenMonth
    else if (m >= 10) Tier.GenWeek
    else if (m >= 1) Tier.GenDay
    else Tier.GenRaw
  }

  /** Native aggregation resolution of a tier in minutes (mapping.go:63-80). */
  def tierResolutionMinutes(tier: Tier, profile: String): Long = {
    if (profile != Tier.ProfileOptimized) return 0
    tier.name match {
      case "gen_day" => 1
      case "gen_week" => 10
      case "gen_month" => 60
      case "gen_year" => DayMinutes
      case _ => 0
    }
  }

  /** Measurement → write tier (mapping.go:146-168). */
  def resolveWriteTier(measurement: String, profile: String): Tier = {
    if (measurement == "electricity_meter_energy_sampled" && profile == Tier.ProfileOptimized)
      Tier.GenYear
    else if (isHighFrequency(measurement)) Tier.GenRaw
    else Tier.GenDefault
  }

  /** High/low-frequency classifier (mapping.go:156-168). */
  def isHighFrequency(measurement: String): Boolean = {
    val m = measurement
    val candidate = m == "electricity_meter_power" || m == "electricity_meter_energy" ||
      m == "electricity_meter_ext" || m == "electricity_meter_energy_sampled" ||
      m.contains("sensor_")
    candidate && !m.contains("sensor_presence") && !m.contains("sensor_contact")
  }

  /** Column form of the classifier, so write routing runs inside the plan
   *  (used by TierStore.writeRouted; semantics identical to the driver
   *  form above). */
  def isHighFrequencyCol(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (m.isin("electricity_meter_power", "electricity_meter_energy",
      "electricity_meter_ext", "electricity_meter_energy_sampled") ||
      m.contains("sensor_")) &&
      !m.contains("sensor_presence") && !m.contains("sensor_contact")

  /** Column form of resolveWriteTier — measurement → tier name. The
   *  profile is a plan-build-time constant, so the optimized-profile
   *  branch is resolved in Scala rather than planted as a
   *  literal-vs-literal predicate (which Spark warns is trivially true). */
  def writeTierCol(m: org.apache.spark.sql.Column, profile: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.when
    val base = when(isHighFrequencyCol(m), Tier.GenRaw.name)
      .otherwise(Tier.GenDefault.name)
    if (profile == Tier.ProfileOptimized)
      when(m === "electricity_meter_energy_sampled", Tier.GenYear.name)
        .otherwise(base)
    else base
  }

  /**
   * Full query-time tier choice (influxdb_v1.go:115-139):
   * low-frequency → gen_default; absolute range → by elapsed-from;
   * relative → by elapsed, refined to the bucket-matched tier when the
   * user bucket is at least as coarse as the tier's native resolution and
   * the function is mean.
   */
  def resolveQueryTier(measurement: String, profile: String,
      fromTime: Option[Instant], relativeTime: String,
      groupByTime: String, dataFunction: String, now: Instant): Tier = {
    if (!isHighFrequency(measurement)) return Tier.GenDefault
    fromTime match {
      case Some(from) =>
        val mins = Duration.between(from, now).toMinutes
        resolveByElapsedMinutes(mins, profile)
      case None =>
        val mins = relativeToMinutes(relativeTime)
        var tier = resolveByElapsedMinutes(mins, profile)
        val userBucket = relativeToMinutes(groupByTime)
        val native = tierResolutionMinutes(tier, profile)
        if (userBucket >= native && dataFunction == "mean")
          tier = resolveByTimeGroup(groupByTime, profile)
        tier
    }
  }
}
