package graft

import java.time.Instant
import java.sql.Timestamp

import graft.model.DataPointsRequest
import graft.query.Planner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The widened InfluxQL function namespace (round 12): sequential
 *  transforms (derivative / elapsed / cumulative_sum / moving_average),
 *  multi-pass aggregates (mode, integral), multi-row selectors
 *  (top/bottom, distinct), and scalar math — semantics pinned on exact
 *  fixtures, the untagged BLOCKED paths checked against a driver-side
 *  sequential fold on multi-block data, and the no-global-window scale
 *  invariant asserted directly on the raw-points plan shape (the one
 *  shape PlanAuditSpec's driver-query sweep doesn't reach). */
class Round12FnSpec extends SparkSpec {

  private val now = Instant.parse("2024-01-02T00:00:00Z")
  private val base = 1704067200L // 2024-01-01T00:00:00Z

  private val schema = StructType(Seq(
    StructField("measurement", StringType), StructField("time", TimestampType),
    StructField("value", DoubleType), StructField("dev_id", StringType),
    StructField("location_id", StringType), StructField("dev_type", StringType)))

  private def pts(rows: (Long, Double)*): DataFrame = {
    val rs = rows.map { case (sec, v) =>
      Row("app_t", new Timestamp(sec * 1000), v, "d1", "1", "sensor") }
    spark.createDataFrame(spark.sparkContext.parallelize(rs), schema)
  }

  private def query(df: DataFrame, dataFunction: String = "",
      transformFunction: String = "", groupByTime: String = "",
      groupByTag: String = "", fill: String = "none"): DataFrame =
    Planner.dataPoints(DataPointsRequest("app_t",
      fromTime = "2024-01-01T00:00:00Z", toTime = "2024-01-01T23:59:59Z",
      dataFunction = dataFunction, transformFunction = transformFunction,
      groupByTime = groupByTime, groupByTag = groupByTag, fillType = fill),
      _ => df, now)

  private def timeValue(df: DataFrame): Seq[(Long, Option[Double])] =
    df.collect().toSeq.map(r =>
      (r.getLong(r.fieldIndex("time")),
        if (r.isNullAt(r.fieldIndex("value"))) None
        else Some(r.getDouble(r.fieldIndex("value"))))).sortBy(_._1)

  // --- sequential transforms: exact semantics ---

  test("derivative: rate per unit, null first row, unit suffix scales") {
    val in = pts((base, 10.0), (base + 30, 16.0), (base + 90, 13.0))
    // per-second: (16-10)/30 = 0.2 ; (13-16)/60 = -0.05
    assert(timeValue(query(in, transformFunction = "derivative")) ==
      Seq((base, None), (base + 30, Some(0.2)), (base + 90, Some(-0.05))))
    // per-minute: ×60
    assert(timeValue(query(in, transformFunction = "derivative_1m")) ==
      Seq((base, None), (base + 30, Some(12.0)), (base + 90, Some(-3.0))))
  }

  test("non_negative_derivative nulls negative rates; non_negative_difference likewise") {
    val in = pts((base, 10.0), (base + 30, 16.0), (base + 90, 13.0))
    assert(timeValue(query(in, transformFunction = "non_negative_derivative")) ==
      Seq((base, None), (base + 30, Some(0.2)), (base + 90, None)))
    assert(timeValue(query(in, transformFunction = "non_negative_difference")) ==
      Seq((base, None), (base + 30, Some(6.0)), (base + 90, None)))
  }

  test("elapsed: integer-truncated units since the previous point") {
    val in = pts((base, 1.0), (base + 90, 2.0), (base + 150, 3.0))
    // 90 s = 1 whole minute (truncated); 60 s = 1
    assert(timeValue(query(in, transformFunction = "elapsed_1m")) ==
      Seq((base, None), (base + 90, Some(1.0)), (base + 150, Some(1.0))))
    assert(timeValue(query(in, transformFunction = "elapsed")) ==
      Seq((base, None), (base + 90, Some(90.0)), (base + 150, Some(60.0))))
  }

  test("scalar math chain applies inner-to-outer and keeps the double column") {
    val in = pts((base, 4.0), (base + 60, 100.0))
    // sqrt then pow_2 is identity; ceil(log10(100)) = 2
    assert(timeValue(query(in, transformFunction = "sqrt,pow_2")) ==
      Seq((base, Some(4.0)), (base + 60, Some(100.0))))
    assert(timeValue(query(in, transformFunction = "log10,ceil")) ==
      Seq((base, Some(1.0)), (base + 60, Some(2.0))))
  }

  // --- the untagged BLOCKED paths vs a sequential fold, multi-block ---

  /** 120 points stepped 500 s apart: at raw-points bucketSec the block
   *  span is 4096 s, so the series crosses ~15 block boundaries — every
   *  carry in the blocked scan is exercised. Values are small integers
   *  so the expected fold is exact in doubles. */
  private val manyRows: Seq[(Long, Double)] =
    (0 until 120).map(i => (base + i * 500L, ((i * 7) % 13).toDouble))

  test("blocked cumulative_sum over multi-block data equals the sequential fold") {
    val got = timeValue(query(pts(manyRows: _*), transformFunction = "cumulative_sum"))
    var acc = 0.0
    val want = manyRows.map { case (t, v) => acc += v; (t, Some(acc)) }
    assert(got == want)
  }

  test("blocked moving_average over multi-block data equals the sequential window") {
    val n = 9
    val got = timeValue(query(pts(manyRows: _*), transformFunction = s"moving_average_$n"))
    val vals = manyRows.map(_._2)
    val want = manyRows.zipWithIndex.map { case ((t, _), i) =>
      if (i + 1 < n) (t, None)
      else (t, Some(vals.slice(i + 1 - n, i + 1).sum / n))
    }
    assert(got == want)
  }

  test("blocked derivative over multi-block data equals the sequential lag") {
    val got = timeValue(query(pts(manyRows: _*), transformFunction = "derivative"))
    val want = manyRows.zipWithIndex.map { case ((t, v), i) =>
      if (i == 0) (t, None)
      else (t, Some((v - manyRows(i - 1)._2) / 500.0))
    }
    assert(got == want)
  }

  test("exponential_moving_average: α = 2/(n+1), seeded with the first point") {
    // n = 3 → α = 0.5: [10, 20, 30] → [10, 15, 22.5] (exact dyadics)
    val in = pts((base, 10.0), (base + 60, 20.0), (base + 120, 30.0))
    assert(timeValue(query(in, transformFunction = "exponential_moving_average_3")) ==
      Seq((base, Some(10.0)), (base + 60, Some(15.0)), (base + 120, Some(22.5))))
  }

  test("blocked EMA over multi-block data equals the sequential recurrence") {
    val n = 3; val alpha = 2.0 / (n + 1)
    val got = timeValue(query(pts(manyRows: _*),
      transformFunction = s"exponential_moving_average_$n"))
    var s = 0.0; var seeded = false
    val want = manyRows.map { case (t, v) =>
      s = if (!seeded) { seeded = true; v } else alpha * v + (1 - alpha) * s
      (t, s)
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case ((gt, gv), (wt, wv)) =>
      assert(gt == wt)
      // the affine decomposition reassociates the float ops — identical
      // in exact arithmetic, a few ulps apart in doubles
      assert(math.abs(gv.get - wv) <= 1e-9 * math.max(1.0, math.abs(wv)),
        s"t=$gt got=${gv.get} want=$wv")
    }
  }

  test("keyed EMA folds per tag independently") {
    val rows = Seq(
      Row("app_t", new Timestamp(base * 1000), 10.0, "d1", "A", "sensor"),
      Row("app_t", new Timestamp((base + 60) * 1000), 20.0, "d1", "A", "sensor"),
      Row("app_t", new Timestamp(base * 1000), 100.0, "d2", "B", "sensor"),
      Row("app_t", new Timestamp((base + 60) * 1000), 200.0, "d2", "B", "sensor"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = query(df, dataFunction = "mean",
      transformFunction = "exponential_moving_average_3",
      groupByTime = "1m", groupByTag = "location_id")
      .collect().map(r => (r.getString(r.fieldIndex("location_id")),
        r.getLong(r.fieldIndex("time")), r.getDouble(r.fieldIndex("value")))).toSet
    assert(out == Set(("A", base, 10.0), ("A", base + 60, 15.0),
      ("B", base, 100.0), ("B", base + 60, 150.0)))
  }

  test("no global data window in any untagged sequential-transform plan") {
    for (tf <- Seq("derivative", "cumulative_sum", "moving_average_9", "elapsed",
        "exponential_moving_average_3")) {
      val plan = query(pts(manyRows: _*), transformFunction = tf)
        .queryExecution.optimizedPlan
      assert(PlanAudit.globalDataWindows(plan).isEmpty,
        s"transform $tf plans a global window over the data stream")
    }
  }

  // --- tagged sequential transforms partition by the tag ---

  test("tagged cumulative_sum runs per tag") {
    val rows = Seq(
      Row("app_t", new Timestamp(base * 1000), 1.0, "d1", "A", "sensor"),
      Row("app_t", new Timestamp((base + 60) * 1000), 2.0, "d1", "A", "sensor"),
      Row("app_t", new Timestamp(base * 1000), 10.0, "d2", "B", "sensor"),
      Row("app_t", new Timestamp((base + 60) * 1000), 20.0, "d2", "B", "sensor"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = query(df, dataFunction = "mean", transformFunction = "cumulative_sum",
      groupByTime = "1m", groupByTag = "location_id")
      .collect().map(r => (r.getString(r.fieldIndex("location_id")),
        r.getLong(r.fieldIndex("time")), r.getDouble(r.fieldIndex("value")))).toSet
    assert(out == Set(("A", base, 1.0), ("A", base + 60, 3.0),
      ("B", base, 10.0), ("B", base + 60, 30.0)))
  }

  // --- multi-pass aggregates ---

  test("mode: most frequent value; ties break to the LOWEST value") {
    // counts: 5.0→2, 3.0→2, 1.0→1 — tie between 5 and 3 → 3
    val in = pts((base, 5.0), (base + 1, 5.0), (base + 2, 3.0),
      (base + 3, 3.0), (base + 4, 1.0))
    val out = query(in, dataFunction = "mode", groupByTime = "1h")
    assert(timeValue(out) == Seq((base, Some(3.0))))
    // whole-range form: single value row
    val g = query(in, dataFunction = "mode").collect()
    assert(g.length == 1 && g(0).getDouble(g(0).fieldIndex("value")) == 3.0)
  }

  test("integral: trapezoid area in the requested unit, within-bucket pairs only") {
    // 0→10 over one hour: area = (0+10)/2 × 3600 s = 18000 value·s = 5 value·h
    val in = pts((base, 0.0), (base + 3600, 10.0))
    val perHour = query(in, dataFunction = "integral_1h", groupByTime = "1d")
    assert(timeValue(perHour) == Seq((base, Some(5.0))))
    val perSec = query(in, dataFunction = "integral", groupByTime = "1d")
    assert(timeValue(perSec) == Seq((base, Some(18000.0))))
    // single-point bucket has no trapezoid → null
    val single = query(pts((base, 7.0)), dataFunction = "integral", groupByTime = "1d")
    assert(timeValue(single) == Seq((base, None)))
    // whole-range form (blocked prev): same area, one row
    val g = query(in, dataFunction = "integral_1h").collect()
    assert(g.length == 1 && g(0).getDouble(g(0).fieldIndex("value")) == 5.0)
  }

  test("count_distinct counts distinct values per bucket") {
    val in = pts((base, 1.0), (base + 1, 1.0), (base + 2, 2.0), (base + 3, 3.0))
    val out = query(in, dataFunction = "count_distinct", groupByTime = "1h").collect()
    assert(out.length == 1 && out(0).getLong(out(0).fieldIndex("value")) == 3L)
  }

  // --- multi-row selectors ---

  test("top/bottom: n extreme points per bucket, deterministic under ties") {
    // bucket 1: 9@t0, 7@t1, 7@t2, 7@t3 → top_2 = 9@t0, 7@t1 (earliest 7)
    val in = pts((base, 9.0), (base + 1, 7.0), (base + 2, 7.0), (base + 3, 7.0),
      (base + 3600, 1.0), (base + 3601, 2.0))
    val top = query(in, dataFunction = "top_2", groupByTime = "1h")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(top == Set((base, 9.0), (base + 1, 7.0), (base + 3600, 1.0), (base + 3601, 2.0)))
    val bottom = query(in, dataFunction = "bottom_1", groupByTime = "1h")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(bottom == Set((base + 1, 7.0), (base + 3600, 1.0)))
    // whole-range form is a distributed top-k (sort+limit), not a window
    val g = query(in, dataFunction = "top_3")
    assert(g.collect().map(_.getDouble(1)).toSet == Set(9.0, 7.0))
    assert(PlanAudit.globalDataWindows(g.queryExecution.optimizedPlan).isEmpty)
  }

  test("distinct: the distinct values per bucket, multi-row") {
    val in = pts((base, 1.0), (base + 1, 1.0), (base + 2, 2.0),
      (base + 3600, 1.0))
    val out = query(in, dataFunction = "distinct", groupByTime = "1h")
      .collect().map(r => (r.getLong(r.fieldIndex("time")),
        r.getDouble(r.fieldIndex("value")))).toSet
    assert(out == Set((base, 1.0), (base, 2.0), (base + 3600, 1.0)))
  }

  // --- SELECT modifiers (ORDER BY time / LIMIT / OFFSET) ---

  test("limit/offset cut per series; desc picks the newest points") {
    val rows = Seq(("A", 0L, 1.0), ("A", 60L, 2.0), ("A", 120L, 3.0),
      ("B", 0L, 10.0), ("B", 60L, 20.0)).map { case (loc, off, v) =>
      Row("app_t", new Timestamp((base + off) * 1000), v, "d", loc, "sensor") }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    def run(req: DataPointsRequest) =
      Planner.dataPoints(req, _ => df, now).collect()
    val base0 = DataPointsRequest("app_t",
      fromTime = "2024-01-01T00:00:00Z", toTime = "2024-01-01T23:59:59Z",
      groupByTime = "1m", dataFunction = "mean", fillType = "none")
    // per-series desc limit 1 = each series' newest bucket
    val newest = run(base0.copy(groupByTag = "location_id",
      orderDesc = true, limit = 1))
      .map(r => (r.getString(r.fieldIndex("location_id")),
        r.getDouble(r.fieldIndex("value")))).toSet
    assert(newest == Set(("A", 3.0), ("B", 20.0)))
    // untagged desc limit 2 offset 1: skip the newest, keep the next two
    val mid = run(base0.copy(orderDesc = true, limit = 2, offset = 1))
      .map(r => (r.getLong(r.fieldIndex("time")),
        r.getDouble(r.fieldIndex("value")))).toSet
    assert(mid == Set((base + 60, 22.0 / 2), (base, 11.0 / 2)),
      s"got $mid") // per-minute means over both series: (2+20)/2, (1+10)/2
    // SLIMIT/SOFFSET: the series-count cut in key order
    val sl = run(base0.copy(groupByTag = "location_id", sLimit = 1))
      .map(_.getString(0)).toSet
    assert(sl == Set("A"), s"slimit 1 kept $sl")
    val so = run(base0.copy(groupByTag = "location_id", sLimit = 1, sOffset = 1))
      .map(_.getString(0)).toSet
    assert(so == Set("B"), s"slimit 1 soffset 1 kept $so")
    // series and point cuts compose: B's newest bucket only
    val both = run(base0.copy(groupByTag = "location_id",
      sLimit = 1, sOffset = 1, orderDesc = true, limit = 1))
      .map(r => (r.getString(r.fieldIndex("location_id")),
        r.getDouble(r.fieldIndex("value")))).toSet
    assert(both == Set(("B", 20.0)))
    // an untagged result is ONE series: SLIMIT keeps it, SOFFSET ≥ 1
    // skips past it (empty result — the InfluxDB behavior)
    assert(run(base0.copy(sLimit = 1)).length == 3)
    assert(run(base0.copy(sLimit = 1, sOffset = 1)).isEmpty)
    // OFFSET without LIMIT is refused (no unbounded global cut)
    intercept[IllegalArgumentException] {
      run(base0.copy(offset = 1)) }
    intercept[IllegalArgumentException] {
      run(base0.copy(groupByTag = "location_id", sOffset = 1)) }
    // the untagged offset plan's global window runs over the
    // limit-bounded frame — still no data-stream window
    val plan = Planner.dataPoints(base0.copy(orderDesc = true, limit = 2,
      offset = 1), _ => df, now).queryExecution.optimizedPlan
    assert(PlanAudit.globalDataWindows(plan).isEmpty)
  }

  // --- namespace edges ---

  test("unknown functions still refuse loudly") {
    val in = pts((base, 1.0))
    intercept[IllegalArgumentException] {
      query(in, dataFunction = "huffle", groupByTime = "1h").collect() }
    intercept[IllegalArgumentException] {
      query(in, transformFunction = "wiggle").collect() }
    // malformed parameterized spellings are unknown, not misparsed
    intercept[IllegalArgumentException] {
      query(in, dataFunction = "top_0", groupByTime = "1h").collect() }
    intercept[IllegalArgumentException] {
      query(in, transformFunction = "moving_average_1").collect() }
    intercept[IllegalArgumentException] {
      query(in, transformFunction = "exponential_moving_average_1").collect() }
  }
}
