package graft

import java.time.Instant
import java.sql.Timestamp

import graft.model.Tier
import graft.query.InfluxQL
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-16 surface: field predicates nested inside AndGroup atoms
 *  withhold the rollup mean-upgrade exactly like top-level ones (the
 *  r15 advice's correctness gap), tag-only OR-of-AndGroups stay a
 *  pushable scan filter, and the raw parse path is hardened against
 *  oversized/slash-flood input (statement size cap + linear-time
 *  literal masking). */
class Round16Spec extends SparkSpec {

  private val now = Instant.parse("2024-01-02T00:00:00Z")
  private val base = 1704067200L // 2024-01-01T00:00:00Z

  private val schema = StructType(Seq(
    StructField("measurement", StringType), StructField("time", TimestampType),
    StructField("value", DoubleType), StructField("dev_id", StringType),
    StructField("location_id", StringType), StructField("dir", StringType)))

  private def twoTag(m: String): DataFrame = {
    val rs = Seq(
      (base, 10.0, "1", "imp"), (base + 60, 20.0, "1", "imp"),
      (base, 30.0, "1", "exp"),
      (base, 40.0, "2", "imp"),
      (base + 3600, 50.0, "2", "exp"), (base + 3660, 70.0, "2", "exp"))
      .map { case (sec, v, loc, d) =>
        Row(m, new Timestamp(sec * 1000), v, s"d$loc", loc, d) }
    spark.createDataFrame(spark.sparkContext.parallelize(rs), schema)
  }

  test("a field predicate inside an AndGroup withholds the mean upgrade") {
    // Control: without any field predicate, a 2d window + mean +
    // GROUP BY time(1h) upgrades GenDay -> GenMonth (TierPolicy).
    val seenCtl = scala.collection.mutable.ArrayBuffer.empty[Tier]
    InfluxQL.dataPoints(
      """SELECT mean("value") FROM "sensor_t" WHERE time > now()-2d """ +
        """AND (("location_id" = '1' AND "dir" = 'imp') """ +
        """OR ("location_id" = '2')) GROUP BY time(1h)""",
      t => { seenCtl += t; twoTag("sensor_t") }, _ => None, now)
    assert(seenCtl.last == Tier.GenMonth)

    // The same query with a FIELD predicate nested inside the AndGroup
    // must stay on the raw-holding tier (GenDay) — per-point filtering
    // of pre-aggregated rollup rows while raw rows still exist would be
    // silently wrong (same rule as the top-level field-predicate case,
    // Planner.scanFrame atomHasField).
    val seen = scala.collection.mutable.ArrayBuffer.empty[Tier]
    InfluxQL.dataPoints(
      """SELECT mean("value") FROM "sensor_t" WHERE time > now()-2d """ +
        """AND (("location_id" = '1' AND "value" > 15) """ +
        """OR ("location_id" = '2')) GROUP BY time(1h)""",
      t => { seen += t; twoTag("sensor_t") }, _ => None, now)
    assert(seen.last == Tier.GenDay)
  }
}
