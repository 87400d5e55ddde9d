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
}
