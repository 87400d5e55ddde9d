package graft.query

import java.time.Instant

import graft.model.{DataPointsRequest, DataPointsFilter, Tier}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The data-point query planner — full `GetDataPoints` semantics
 * (reference: src/integration/tsdb/storage/influxdb_v1.go:97-198),
 * compiled to a declarative DataFrame plan instead of an InfluxQL string.
 *
 * Pipeline (mirroring the reference's steps):
 *  defaults → tier selection (TierPolicy) → time predicate → tag filters →
 *  one of four grouping shapes → aggregation function → gap fill →
 *  transform-function wrap.
 *
 * Scale notes:
 *  - measurement + time predicates are plain `filter`s on the scan —
 *    Catalyst pushes them into parquet (partition pruning on the
 *    measurement/date partitions of the tier tables, row-group skipping on
 *    time), so a 1-hour query over 100 TB touches only its own partitions.
 *  - the gap-fill spine is generated PER GROUP KEY via `explode(sequence)`
 *    on the (small) distinct-groups side and joined back — never a
 *    crossJoin of full ranges (SURVEY.md §7 risk (c)).
 *  - time buckets are epoch-aligned longs, matching the reference's
 *    epoch-seconds response precision (`influx.NewQuery(..., "s")`,
 *    influxdb_v1.go:191).
 *
 * Intentional divergence: the reference's devices/locations/devTypes
 * filters iterate Go slice INDICES, not values (bug, influxdb_v1.go:148-156);
 * we implement the evident intent (`isin(values)`).
 */
object Planner {

  /** Aggregation-function whitelist (open InfluxQL namespace in the
   *  reference, influxdb_v1.go:167; docs exercise mean/count/last/sum). */
  def aggColumn(fn: String, value: Column, time: Column): Column = fn match {
    case "mean" => avg(value)
    case "count" => count(value)
    case "sum" => sum(value)
    case "min" => min(value)
    case "max" => max(value)
    case "median" => median(value)
    case "first" => min_by(value, time)
    case "last" => max_by(value, time)
    case "spread" => max(value) - min(value)
    case "stddev" => stddev_samp(value) // InfluxQL STDDEV = sample stddev
    case PercentileFn(p) => // InfluxQL PERCENTILE(n) — "percentile_95" form
      percentile(value, lit(p / 100.0))
    case other => throw new IllegalArgumentException(s"unsupported data_function: $other")
  }

  /** `percentile_<n>` (n in (0,100], decimals allowed) → interpolated
   *  percentile — the engine-side spelling of InfluxQL's PERCENTILE(n),
   *  which the reference forwards through its open function namespace. */
  private object PercentileFn {
    private val Re = "^percentile_(\\d{1,3}(?:\\.\\d+)?)$".r
    def unapply(fn: String): Option[Double] = fn match {
      case Re(n) =>
        val p = n.toDouble
        if (p > 0 && p <= 100) Some(p) else None
      case _ => None
    }
  }

  /** Rows per time block for the blocked prefix-scan fallback (below). */
  private val BlockFactor = 4096L

  /**
   * Sequential-over-time operators (lag / carry-forward) on an UNTAGGED
   * series have no natural partition key — a naive global window funnels
   * the whole result through one task. Instead we run a two-pass
   * distributed prefix scan: partition by a coarse time block (bucketSec ×
   * 4096, parallel), then fix up block boundaries by joining a per-block
   * summary whose own ordering window runs over ≤ rows/4096 entries —
   * that summary side is deliberately pinned to a single partition
   * (`partitionBy(lit(0))`), which is bounded and explicit, not accidental.
   */
  private def blockSpanSec(bucketSec: Long): Long =
    math.max(bucketSec, 1L) * BlockFactor

  /**
   * Running carry over the per-block summary (rows/4096 of the result),
   * computed as a streaming fold in one post-shuffle task instead of an
   * unpartitioned window: `repartition(1)` is a shuffle boundary so the
   * upstream aggregation stays parallel, and the fold streams the sorted
   * iterator — no WindowExec funnel anywhere in the plan. For each block
   * this emits the summary value of the closest EARLIER block
   * (`updateOnNonNullOnly` selects fill-previous vs plain-lag update).
   */
  private def blockCarry(summary: DataFrame, updateOnNonNullOnly: Boolean,
      outName: String, ascending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val blastIdx = summary.schema.fieldIndex("_blast")
    val outSchema = org.apache.spark.sql.types.StructType(
      summary.schema.fields :+
        org.apache.spark.sql.types.StructField(outName, summary.schema("_blast").dataType))
    val sorted = summary.repartition(1)
      .sortWithinPartitions(if (ascending) col("_blk") else col("_blk").desc)
    sorted
      .mapPartitions { it =>
        var carry: Any = null
        it.map { r =>
          val out = Row.fromSeq(r.toSeq :+ carry)
          val v = r.get(blastIdx)
          if (!updateOnNonNullOnly || v != null) carry = v
          out
        }
      }(Encoders.row(outSchema))
      .select(col("_blk"), col(outName))
  }

  /** Linear interpolation between the bracketing non-null points, given
   *  `_p`/`_n` structs of (value, time); null outside the bracketed range
   *  (InfluxQL FILL(linear) edge behavior). */
  private def interpolated: Column = {
    val pv = col("_p").getField("value")
    val pt = col("_p").getField("time")
    val nv = col("_n").getField("value")
    val nt = col("_n").getField("time")
    when(col("value").isNotNull, col("value"))
      .when(col("_p").isNotNull && col("_n").isNotNull,
        pv + (nv - pv) * (col("time") - pt) / (nt - pt))
  }

  /** FILL(linear) with no group key: the same blocked prefix scan as
   *  blockedDifference, run in both directions — a forward carry of the
   *  last non-null (value, time) and a backward carry of the next one —
   *  so no unpartitioned window appears in the plan. */
  private def blockedLinear(joined: DataFrame, bucketSec: Long): DataFrame = {
    val span = blockSpanSec(bucketSec)
    val withBlk = joined.withColumn("_blk", floor(col("time") / span))
    val mark = when(col("value").isNotNull, struct(col("value"), col("time")))
    val wP = Window.partitionBy(col("_blk")).orderBy(col("time"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy(col("_blk")).orderBy(col("time"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val inBlk = withBlk
      .withColumn("_pin", last(mark, ignoreNulls = true).over(wP))
      .withColumn("_nin", first(mark, ignoreNulls = true).over(wN))
    // cross-block carries over the tiny per-block summaries
    val prev = blockCarry(
      withBlk.groupBy(col("_blk"))
        .agg(max_by(mark, when(col("value").isNotNull, col("time"))).as("_blast")),
      updateOnNonNullOnly = true, "_pout")
    val nxt = blockCarry(
      withBlk.groupBy(col("_blk"))
        .agg(min_by(mark, when(col("value").isNotNull, col("time"))).as("_blast")),
      updateOnNonNullOnly = true, "_nout", ascending = false)
    inBlk
      .join(broadcast(prev), Seq("_blk"), "left")
      .join(broadcast(nxt), Seq("_blk"), "left")
      .withColumn("_p", coalesce(col("_pin"), col("_pout")))
      .withColumn("_n", coalesce(col("_nin"), col("_nout")))
      .withColumn("value", interpolated)
      .drop("_blk", "_pin", "_nin", "_pout", "_nout", "_p", "_n")
  }

  /** Blocked `value - lag(value) OVER (ORDER BY time)` with no group key. */
  private def blockedDifference(df: DataFrame, bucketSec: Long): DataFrame = {
    val span = blockSpanSec(bucketSec)
    val withBlk = df.withColumn("_blk", floor(col("time") / span))
    val wIn = Window.partitionBy(col("_blk")).orderBy(col("time"))
    val inBlk = withBlk.withColumn("_lag", lag(col("value"), 1).over(wIn))
    // last value of each block, shifted to the next non-empty block
    val prev = blockCarry(
      withBlk.groupBy(col("_blk")).agg(max_by(col("value"), col("time")).as("_blast")),
      updateOnNonNullOnly = false, "_prev_last")
    inBlk.join(broadcast(prev), Seq("_blk"), "left")
      .withColumn("value", col("value") - coalesce(col("_lag"), col("_prev_last")))
      .drop("_blk", "_lag", "_prev_last")
  }

  /** Scalar transform-function wrap (influxdb_v1.go:184-186; `abs` in docs,
   *  `difference` per the commented energy query influxdb_v1.go:229-231).
   *  A comma-chain applies inner-to-outer — "difference,abs" is the
   *  dashboard's `abs(difference(agg(value)))` (influxdb_v1.go:229). */
  private def transformWrap(fn: String, df: DataFrame, partCols: Seq[String],
      bucketSec: Long): DataFrame =
    fn.split(",").map(_.trim).filter(_.nonEmpty)
      .foldLeft(df)((d, f) => transformOne(f, d, partCols, bucketSec))

  private def transformOne(fn: String, df: DataFrame, partCols: Seq[String],
      bucketSec: Long): DataFrame =
    fn match {
      case "abs" => df.withColumn("value", abs(col("value")))
      case "difference" if partCols.isEmpty => blockedDifference(df, bucketSec)
      case "difference" =>
        val w = Window.partitionBy(partCols.map(col): _*).orderBy(col("time"))
        df.withColumn("value", col("value") - lag(col("value"), 1).over(w))
      case other => throw new IllegalArgumentException(s"unsupported transform_function: $other")
    }

  /** The reference's absolute time-range convention as ONE shared
   *  predicate — `fromSec <= time < toSec+1`, expressed natively on the
   *  timestamp column so parquet row-group skipping applies. Shared by
   *  the read path and the erasure command: "delete what a query
   *  returns" only holds while both use the identical boundary rule. */
  def absoluteTimePredicate(fromSec: Long, toSec: Long): Column =
    col("time") >= timestamp_seconds(lit(fromSec)) &&
      col("time") < timestamp_seconds(lit(toSec + 1))

  /** Compile the tag/device/location/type filters (influxdb_v1.go:145-156). */
  def filterColumn(f: DataPointsFilter): Column = {
    var c: Column = lit(true)
    f.tags.foreach { case (k, v) => c = c && (col(k) === v) }
    if (f.devices.nonEmpty) c = c && col("dev_id").isin(f.devices: _*)
    if (f.locations.nonEmpty) c = c && col("location_id").isin(f.locations: _*)
    if (f.devTypes.nonEmpty) c = c && col("dev_type").isin(f.devTypes: _*)
    c
  }

  /**
   * Plan a data-points request over the tier tables.
   *
   * @param resolve tier → its points DataFrame (columns: measurement,
   *                time: timestamp, value: double, plus tag columns)
   * @param now     query-time "now" for relative windows (injected for
   *                determinism; the reference uses wall clock)
   * @return columns: `time` (epoch seconds, when time-visible), `value`,
   *         plus the group-by tag column when requested.
   */
  def dataPoints(req: DataPointsRequest, resolve: Tier => DataFrame, now: Instant): DataFrame = {
    // defaults (influxdb_v1.go:102-114)
    val groupByTime = if (req.groupByTime == "auto") "" else req.groupByTime
    val fieldName = if (req.fieldName.isEmpty) "value" else req.fieldName
    val dataFunction =
      if ((req.groupByTag.nonEmpty || groupByTime.nonEmpty) && req.dataFunction.isEmpty) "mean"
      else req.dataFunction
    val fillType = if (req.fillType.isEmpty) "null" else req.fillType

    val fromInstant: Option[Instant] =
      if (req.fromTime.nonEmpty && req.toTime.nonEmpty) Some(Instant.parse(req.fromTime)) else None
    val tier = TierPolicy.resolveQueryTier(req.measurement, Tier.ProfileOptimized,
      fromInstant, req.relativeTime, groupByTime, dataFunction, now)

    val base = resolve(tier)
    val valueCol = col(fieldName).as("value")

    // time predicate (influxdb_v1.go:119-139). The reference compares
    // floor-to-second epoch values; the exact native equivalent is
    //   absolute:  fromSec <= time < toSec+1
    //   relative:  time >= fromSec+1        (strict `> fromSec` on floors)
    // expressed directly on the timestamp column (NOT wrapped in
    // unix_timestamp) so parquet row-group min/max skipping applies.
    val (fromSec, toSec): (Long, Long) = fromInstant match {
      case Some(from) => (from.getEpochSecond, Instant.parse(req.toTime).getEpochSecond)
      case None =>
        val mins = TierPolicy.relativeToMinutes(req.relativeTime)
        (now.getEpochSecond - mins * 60, now.getEpochSecond)
    }
    val timePred = fromInstant match {
      case Some(_) => absoluteTimePredicate(fromSec, toSec)
      case None => col("time") >= timestamp_seconds(lit(fromSec + 1))
    }
    // Derived `date` partition filter: tier tables are partitioned by
    // measurement+date (TierStore.write), so bounding `date` turns the
    // time range into partition pruning — a 1-hour query over a year of
    // history scans one or two date directories, not the full table.
    // Bounds are computed in the session timezone (the zone to_date used
    // at write time) and widened by the sub-second end slack.
    val datePred: Option[Column] =
      if (!base.columns.contains("date")) None
      else {
        val zone = java.time.ZoneId.of(
          base.sparkSession.sessionState.conf.sessionLocalTimeZone)
        def d(sec: Long) = java.sql.Date.valueOf(
          java.time.LocalDate.ofInstant(Instant.ofEpochSecond(sec), zone))
        Some(col("date").between(d(fromSec), d(toSec + 1)))
      }

    val filtered = datePred.foldLeft(base)(_ filter _)
      .filter(col("measurement") === req.measurement)
      .filter(timePred)
      .filter(filterColumn(req.filters))
      .withColumn("value", col(fieldName))

    val bucketSec = TierPolicy.relativeToMinutes(groupByTime) * 60
    val tag = req.groupByTag

    val shaped: DataFrame =
      if (groupByTime.isEmpty && tag.nonEmpty) {
        // GROUP BY tag only: raw points echoed per tag (influxdb_v1.go:160-162)
        filtered.select(unix_timestamp(col("time")).as("time"), col("value"), col(tag))
      } else if (groupByTime.nonEmpty) {
        // GROUP BY time(X) [, tag] (influxdb_v1.go:163-171)
        val bucket = (floor(unix_timestamp(col("time")) / bucketSec) * bucketSec).as("time")
        val keys = if (tag.nonEmpty) Seq(col(tag)) else Nil
        val agged = filtered
          .groupBy(bucket +: keys: _*)
          .agg(aggColumn(dataFunction, col("value"), col("time")).as("value"))
        gapFill(agged, if (tag.nonEmpty) Seq(tag) else Nil, bucketSec, fromSec, toSec, fillType)
      } else if (dataFunction.nonEmpty) {
        // plain aggregate over the range (influxdb_v1.go:173-177)
        filtered.agg(aggColumn(dataFunction, col("value"), col("time")).as("value"))
      } else {
        // raw points (influxdb_v1.go:178-183)
        filtered.select(unix_timestamp(col("time")).as("time"), col("value"))
      }

    transformWrap(req.transformFunction, shaped,
      if (tag.nonEmpty) Seq(tag) else Nil, bucketSec)
  }

  /**
   * Gap fill over epoch-aligned buckets (InfluxQL FILL; influxdb_v1.go
   * query templates; SURVEY.md A8). The spine is exploded per distinct
   * group key — the expensive (fact) side is already aggregated down to
   * one row per (bucket, key) before the join.
   */
  def gapFill(agged: DataFrame, tagCols: Seq[String], bucketSec: Long,
      fromSec: Long, toSec: Long, fillType: String): DataFrame = {
    if (fillType == "none") return agged.orderBy((tagCols :+ "time").map(col): _*)
    val lo = Math.floorDiv(fromSec, bucketSec) * bucketSec
    val hi = Math.floorDiv(toSec, bucketSec) * bucketSec
    val spineCol = explode(sequence(lit(lo), lit(hi), lit(bucketSec))).as("time")
    val spine =
      if (tagCols.nonEmpty)
        agged.select(tagCols.map(col): _*).distinct().select(col("*"), spineCol)
      else
        agged.sparkSession.range(1).select(spineCol)
    val joined = spine.join(agged, tagCols :+ "time", "left")
    val filled = fillType match {
      case "null" => joined
      case "previous" if tagCols.isEmpty =>
        // untagged carry-forward: blocked two-pass prefix scan (see
        // blockedDifference) instead of a single global window
        val span = blockSpanSec(bucketSec)
        val withBlk = joined.withColumn("_blk", floor(col("time") / span))
        val wIn = Window.partitionBy(col("_blk")).orderBy(col("time"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inBlk = withBlk.withColumn("_fill",
          last(col("value"), ignoreNulls = true).over(wIn))
        // last non-null value of every STRICTLY EARLIER block (tiny table)
        val prev = blockCarry(
          withBlk.groupBy(col("_blk"))
            .agg(max_by(col("value"), when(col("value").isNotNull, col("time"))).as("_blast")),
          updateOnNonNullOnly = true, "_prev_fill")
        inBlk.join(broadcast(prev), Seq("_blk"), "left")
          .withColumn("value", coalesce(col("_fill"), col("_prev_fill")))
          .drop("_blk", "_fill", "_prev_fill")
      case "previous" =>
        val w = Window.partitionBy(tagCols.map(col): _*).orderBy(col("time"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("value", last(col("value"), ignoreNulls = true).over(w))
      case "linear" if tagCols.isEmpty => blockedLinear(joined, bucketSec)
      case "linear" =>
        // InfluxQL FILL(linear): interpolate between the neighboring
        // non-null points; rows before the first / after the last stay null
        val wP = Window.partitionBy(tagCols.map(col): _*).orderBy(col("time"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wN = Window.partitionBy(tagCols.map(col): _*).orderBy(col("time"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val mark = when(col("value").isNotNull, struct(col("value"), col("time")))
        joined
          .withColumn("_p", last(mark, ignoreNulls = true).over(wP))
          .withColumn("_n", first(mark, ignoreNulls = true).over(wN))
          .withColumn("value", interpolated)
          .drop("_p", "_n")
      case lit_ =>
        val v = try lit_.toDouble catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"unsupported fill type: $lit_")
        }
        joined.withColumn("value", coalesce(col("value"), lit(v)))
    }
    filled.select((tagCols :+ "time" :+ "value").map(col): _*)
  }

  /**
   * Energy preset (reference: influxdb_v1.go:203-264 GetEnergyDataPoints):
   * `sum(value)` over `gen_year.electricity_meter_energy_sampled`,
   * GROUP BY time(X), tag, FILL(null); group_by_time validated against
   * `^\d{1,2}[mhdw]$` else forced to 1h (regex at influxdb_v1.go:36).
   */
  def energyDataPoints(relativeTime: String, fromTime: String, toTime: String,
      groupByTime: String, groupByTag: String, filters: DataPointsFilter,
      resolve: Tier => DataFrame, now: Instant): DataFrame = {
    val gbt = if (groupByTime != null && groupByTime.matches("^\\d{1,2}[mhdw]$")) groupByTime else "1h"
    val req = DataPointsRequest(
      measurement = "electricity_meter_energy_sampled",
      dataFunction = "sum", relativeTime = relativeTime,
      fromTime = fromTime, toTime = toTime,
      groupByTime = gbt, groupByTag = groupByTag,
      fillType = "null", filters = filters)
    // tier is pinned to gen_year by the reference's SQL template
    dataPoints(req, _ => resolve(Tier.GenYear), now)
  }
}
