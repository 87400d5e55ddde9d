package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the most recent right row with
 * `right.time <= left.time` within the same key — the canonical
 * time-series alignment (sensor reading ← latest calibration, event ←
 * latest price quote, trade ← quote). Spark has no native ASOF JOIN;
 * the naive formulations are a range θ-join (quadratic blowup) or a
 * per-key `collect_list` + UDF (memory-unbounded on hot keys).
 *
 * Shape here: tag both sides, UNION, and run ONE window per key ordered
 * by (time, side) carrying the last non-null right payload forward —
 * a single shuffle on the key, O(1) state per row in the running
 * window, no row-pair materialization. At equal timestamps the right
 * row sorts FIRST, so a same-instant quote is visible to the left row
 * (`<=`, matching DuckDB/kdb ASOF semantics). Left rows with no prior
 * right row keep a null payload (ASOF LEFT JOIN).
 *
 * Requirements: `right` must be unique per (key, time) — pre-aggregate
 * if it isn't (ambiguous ties have no canonical ASOF answer). Window
 * partitions by key: a billion-row key is one task's sort — for known
 * hot keys, range-bucket the time axis first (functions.Salting) or
 * pre-filter; for the typical many-keys profile this is the plan you
 * want at 100 TB.
 */
object AsofJoin {

  /**
   * @param left      rows to enrich (keeps ALL its columns)
   * @param right     lookup rows: key, time and `valueCols`
   * @param key       equality column present on both sides
   * @param timeCol   ordering column present on both sides (same type)
   * @param valueCols right-side payload columns to carry (prefixed
   *                  `asof_` on the output)
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(
        right.select(valueCols.map(col): _*).schema.fields
          .foldLeft(new org.apache.spark.sql.types.StructType()) {
            (s, f) => s.add(f)
          }))
    val r = right.select(
      col(key) +: col(timeCol) +: Seq(lit(0).as("_side"),
        struct(valueCols.map(col): _*).as("_rv")): _*)
    // align schemas: right side carries nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("_carry", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"_carry.$v").as(s"asof_$v")): _*)
  }

  /**
   * Hot-key-safe variant: identical semantics to [[asofJoin]], but the
   * per-key window is sharded by TIME BUCKET so no single task ever
   * sorts a whole key's history. Three bounded stages:
   *
   *  1. per (key, bucket): the last right payload in the bucket — one
   *     hash aggregate;
   *  2. cross-bucket carry: a window over the per-key BUCKET SUMMARIES
   *     (≤ time-range/span rows per key, e.g. 365 for daily buckets
   *     over a year — bounded regardless of row counts) yields each
   *     bucket's seed = the latest right payload of any earlier bucket;
   *  3. within (key, bucket): the same union + running-carry window as
   *     the plain form, now partitioned by (key, bucket), seeded with
   *     the carry when a left row precedes every right row in its
   *     bucket.
   *
   * `timeCol` must be numeric (e.g. epoch seconds) for the bucket
   * arithmetic; `bucketSpan` is in the same unit. This is the blocked
   * prefix-scan shape the engine already uses for untagged
   * fill-previous — a billion-row key costs max(rows-per-bucket) per
   * task instead of one monster sort.
   */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, valueCols: Seq[String], bucketSpan: Long): DataFrame = {
    require(bucketSpan > 0, "bucketSpan must be positive")
    val leftCols = left.columns.toSeq
    def bucket = ((col(timeCol) - pmod(col(timeCol), lit(bucketSpan))) /
      lit(bucketSpan)).cast("long")
    val rvType = right.select(valueCols.map(col): _*).schema.fields
      .foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))
    val l = left.withColumn("_b", bucket).withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(rvType))
    val r = right.withColumn("_b", bucket)
      .withColumn("_rv", struct(valueCols.map(col): _*))
    // 1. last right payload per (key, bucket) — (key, time) unique by
    //    the asof contract, so max_by is deterministic
    val sums = r.groupBy(col(key), col("_b"))
      .agg(max_by(col("_rv"), col(timeCol)).as("_last"))
    // 2. carry into each bucket from strictly earlier buckets
    val skel = l.select(col(key), col("_b"))
      .unionByName(sums.select(col(key), col("_b"))).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = skel.join(sums, Seq(key, "_b"), "left")
      .withColumn("_seed", last(col("_last"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("_b"), col("_seed"))
    // 3. within-bucket running carry, seeded
    val rAligned = leftCols.foldLeft(
      r.withColumn("_side", lit(0))
        .select(col(key) +: col(timeCol) +: col("_b") +: col("_side") +:
          Seq(col("_rv")): _*)) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(col(key), col("_b"))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("_local", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .join(carry, Seq(key, "_b"), "left")
      .withColumn("_carry", coalesce(col("_local"), col("_seed")))
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"_carry.$v").as(s"asof_$v")): _*)
  }
}
