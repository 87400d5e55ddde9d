package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed table storage — the shuffle-elimination layout for the joins
 * and aggregations the engine runs REPEATEDLY on the same keys: metadata
 * enrichment by device address, as-of alignment and counter-difference by
 * `series_id`, near-dup candidate verification by `doc_id`.
 *
 * A shuffle on a 100 TB fact table costs more than every downstream
 * operator combined; hash-bucketing the table ONCE at write time means
 * every later equi-join or groupBy on the bucket keys reads co-located
 * data and plans with ZERO `Exchange` nodes:
 *  - both sides bucketed with the same bucket count on the join keys →
 *    no shuffle on either side (`BucketingSpec` pins the plan);
 *  - `sortBy` the same keys → the sort-merge join's per-bucket sort is
 *    also free (files are read pre-sorted);
 *  - groupBy on a superset of the bucket keys → no exchange before the
 *    aggregate.
 *
 * Spark's bucketing rides the table catalog (`saveAsTable`), not the
 * bare path API: the bucket spec is catalog metadata. Tables here are
 * EXTERNAL (caller-controlled `path`), so data lives with the rest of
 * the store and survives the catalog; a production deployment keeps the
 * catalog in its metastore, local runs use the session's in-memory
 * catalog and re-register on startup (`register` is idempotent).
 *
 * The bucket count is fixed at write time — size it to the TARGET scale
 * (e.g. 4096 buckets ≈ 25 GB/bucket at 100 TB), not the test scale: a
 * too-small count caps join parallelism at 100×.
 */
object Bucketing {

  /**
   * Write `df` as an external bucketed parquet table. Buckets (and the
   * in-file sort when `sortCols` is set) are on the columns the table is
   * repeatedly joined/grouped on.
   */
  def writeBucketed(
      df: DataFrame,
      name: String,
      path: String,
      buckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      oneFilePerBucket: Boolean = false): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    // Sort-merge joins can skip their sort only when every bucket is a
    // single pre-sorted file AND the reader opts in via
    // `spark.sql.legacy.bucketedTableScan.outputOrdering=true`; a
    // repartition on the bucket keys (same murmur3 hash as the bucket
    // assignment) lands each bucket in exactly one writer task. Shuffle
    // elimination needs neither — it's the default win.
    val in =
      if (oneFilePerBucket)
        df.repartition(buckets, bucketCols.map(df.col): _*)
      else df
    val w = in.write.mode(mode).format("parquet").option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(name)
  }

  /** Read a bucketed table back (bucket-aware scan). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Drop the catalog entry; `purge` also deletes the files. */
  def drop(spark: SparkSession, name: String, purge: Boolean = false): Unit = {
    val location =
      if (purge && spark.catalog.tableExists(name))
        Some(spark.sql(s"DESCRIBE TABLE EXTENDED $name")
          .filter("col_name = 'Location'").collect().headOption.map(_.getString(1)))
      else None
    spark.sql(s"DROP TABLE IF EXISTS $name")
    location.flatten.foreach { loc =>
      val p = new org.apache.hadoop.fs.Path(loc)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Number of `ShuffleExchange`s in a DataFrame's physical plan — the
   *  invariant bucketing buys. Call with AQE disabled
   *  (`spark.sql.adaptive.enabled=false`): under AQE the pre-execution
   *  plan hides exchanges inside the adaptive root. */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeLike => s }.size
  }
}
