package graft.store

import java.time.Instant

import graft.model.Tier
import graft.query.TierPolicy
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Tiered columnar store — the engine's storage layer, replacing the
 * reference's InfluxDB databases + retention policies
 * (reference: src/integration/tsdb/storage/influxdb_v1.go:271-413,
 * storage/ds.go:11-29).
 *
 * Layout: `<root>/tier=<tier>/measurement=<m>/date=<d>/` parquet — one
 * partitioned dataset whose first partition column is the tier. At 100 TB
 * this gives:
 *  - partition pruning for measurement-equality + time-range queries
 *    (every reference query has both);
 *  - retention expiry = dropping whole date partitions, no rewrite;
 *  - append-only micro-batches (the reference's batched writes,
 *    process.go:366-428) land as new files without touching old ones;
 *  - tier-routed ingest is ONE `partitionBy("tier", ...)` write — the
 *    upstream micro-batch plan executes exactly once, mirroring the
 *    reference's single-pass batch writer (process.go:366-428), instead
 *    of once per tier.
 */
final class TierStore(spark: SparkSession, root: String) {

  private def path(tier: String) = s"$root/tier=$tier"

  /** Physical tier directory (used by the rollup maintenance job). */
  def tierPath(tier: String): String = path(tier)

  // All directory manipulation goes through the Hadoop FileSystem API so
  // the store works unchanged on HDFS/S3A/GCS — the 100 TB deployment
  // target — as well as file:// in tests. Partition-drop semantics are
  // identical to a local-FS walk.
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  private def fs: FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def exists(p: String): Boolean = fs.exists(new HPath(p))
  private def rmTree(p: String): Unit = {
    val hp = new HPath(p)
    if (fs.exists(hp)) fs.delete(hp, true)
  }
  private def subDirs(p: String): Seq[HPath] = {
    val hp = new HPath(p)
    if (!fs.exists(hp)) Nil
    else fs.listStatus(hp).filter(_.isDirectory).map(_.getPath).toSeq
  }

  /** Drop one date partition across every measurement of a tier (used by
   *  rollup maintenance to replace a recent window incrementally). */
  def dropDatePartition(tier: Tier, date: String): Unit =
    subDirs(path(tier.name))
      .filter(_.getName.startsWith("measurement="))
      .foreach(m => rmTree(s"$m/date=$date"))

  /** Test seam for the publish race spec: invoked between the bulk
   *  phases of a partition swap (after staging, before trash cleanup). */
  private[graft] var publishHook: String => Unit = _ => ()

  /**
   * Publish a staged partition over a live one with the smallest window
   * this FileSystem contract allows: ONE metadata rename moves the live
   * directory into a hidden trash sibling, a second moves the staged
   * replacement in. A true single-rename replace of a non-empty
   * directory does not exist in the Hadoop FS API (HDFS `rename` fails
   * on an existing destination; local FS emulates it) — that is exactly
   * why table formats (Delta, Iceberg) commit through a manifest. What
   * this buys at 100 TB: the OLD swap deleted the live partition's data
   * files first (seconds to minutes of recursive delete during which a
   * reader sees a partly-deleted partition) and only then renamed; now
   * the visibility window is two namenode-metadata operations, and the
   * bulk delete of trashed data happens entirely OUTSIDE it. Residual
   * caveats, documented as the deployment contract: (a) a reader whose
   * plan listed files before the swap may hit moved files — set
   * `spark.sql.files.ignoreMissingFiles` or retry, same as any
   * compacting store without snapshot isolation; (b) object stores
   * without atomic rename (S3A) emulate rename by copy+delete — there,
   * front this store with a manifest-committing table format.
   */
  private def swapPartition(live: HPath, fresh: Option[HPath], trash: HPath): Unit = {
    if (fs.exists(live)) {
      fs.mkdirs(trash.getParent)
      fs.rename(live, trash)
    }
    fresh.foreach { f =>
      fs.mkdirs(live.getParent)
      fs.rename(f, live)
    }
  }

  /** Append points into a tier (S3 batch write sink; process.go:290-337).
   *  Rows are sorted by time within each written file so parquet
   *  row-group min/max statistics are tight — the planner's pushed-down
   *  time predicates then skip whole row groups inside a date partition,
   *  not just whole partitions. */
  def write(tier: Tier, points: DataFrame): Unit =
    points
      .withColumn("date", to_date(col("time")))
      .repartition(col("measurement"), col("date"))
      .sortWithinPartitions(col("measurement"), col("date"), col("time"))
      .write.mode(SaveMode.Append)
      .partitionBy("measurement", "date")
      .parquet(path(tier.name))

  /** Route each point to its write tier (mapping.go:146-168) and append.
   *  The classifier runs as a plan column (TierPolicy.writeTierCol), and the
   *  routed append is a SINGLE write with `tier` as the leading partition
   *  column — the input plan (the whole filter→enrich→transform chain in
   *  the streaming path) executes exactly once per micro-batch, never once
   *  per tier. Tiers that receive no rows simply get no directories. */
  def writeRouted(points: DataFrame, profile: String = Tier.ProfileOptimized): Unit =
    points
      .withColumn("tier", TierPolicy.writeTierCol(col("measurement"), profile))
      .withColumn("date", to_date(col("time")))
      .repartition(col("tier"), col("measurement"), col("date"))
      .sortWithinPartitions(col("tier"), col("measurement"), col("date"), col("time"))
      .write.mode(SaveMode.Append)
      .partitionBy("tier", "measurement", "date")
      .parquet(root)

  /** Read a tier table (empty DataFrame with points schema if absent or
   *  fully expired — an empty partition tree has no schema to infer). */
  def read(tier: Tier): DataFrame = {
    val p = path(tier.name)
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.Schemas.points.add("date", org.apache.spark.sql.types.DateType))
    if (!exists(p)) empty
    else try spark.read.parquet(p)
    catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** SHOW MEASUREMENTS (S8; influxdb_v1.go:376-394) — partition listing,
   *  no data scan. */
  def measurements(tier: Tier): Seq[String] =
    subDirs(path(tier.name)).map(_.getName)
      .filter(_.startsWith("measurement=")).map(_.stripPrefix("measurement=")).sorted

  // user-defined retention policies (S9 add/update/delete RP,
  // influxdb_v1.go:300-331); the built-in gen_* hierarchy is fixed
  private val customTiers = scala.collection.mutable.LinkedHashMap.empty[String, Tier]

  /** SHOW RETENTION POLICIES (S8; influxdb_v1.go:396-413). */
  def retentionPolicies: Seq[Tier] = Tier.all ++ customTiers.values

  /** CREATE RETENTION POLICY (S9; influxdb_v1.go:300-309). */
  def addRetentionPolicy(tier: Tier): Unit = customTiers(tier.name) = tier

  /** ALTER RETENTION POLICY (S9; influxdb_v1.go:311-320). */
  def updateRetentionPolicy(tier: Tier): Unit = customTiers(tier.name) = tier

  /** DROP RETENTION POLICY (S9; influxdb_v1.go:322-331): unregister and
   *  delete the tier's data directory. */
  def deleteRetentionPolicy(name: String): Unit = {
    customTiers.remove(name)
    rmTree(path(name))
  }

  def tierByName(name: String): Option[Tier] = retentionPolicies.find(_.name == name)

  /** CREATE DATABASE (S9; influxdb_v1.go:271-283 InitDB): materialize the
   *  tier directory skeleton. */
  def init(): Unit =
    Tier.all.foreach(t => fs.mkdirs(new org.apache.hadoop.fs.Path(path(t.name))))

  /** DROP DATABASE (S9; influxdb_v1.go:285-298 DropDB): delete everything
   *  under the store root. */
  def drop(): Unit = rmTree(root)

  /**
   * Retention expiry (S9 / influxdb_v1.go:300-331 retention policies):
   * drop date partitions entirely outside the tier's retention window.
   * Partition-granular delete — no data rewrite, and only directory
   * listings (two levels) of the object store.
   */
  def expire(tier: Tier, now: Instant): Unit = {
    val days = Tier.retentionDays(tier.retention).getOrElse(return)
    val cutoff = java.time.LocalDate.ofInstant(now.minusSeconds(days * 86400), java.time.ZoneOffset.UTC)
    for {
      mDir <- subDirs(path(tier.name)) if mDir.getName.startsWith("measurement=")
      dDir <- subDirs(mDir.toString) if dDir.getName.startsWith("date=")
      dateStr = dDir.getName.stripPrefix("date=")
      if java.time.LocalDate.parse(dateStr).isBefore(cutoff)
    } rmTree(dDir.toString)
  }

  /** DROP MEASUREMENT (S9; influxdb_v1.go:363-373) — partition delete. */
  def dropMeasurement(tier: Tier, measurement: String): Unit =
    rmTree(s"${path(tier.name)}/measurement=$measurement")

  /**
   * Small-file compaction. Streaming ingest appends one parquet file per
   * micro-batch per (measurement, date) partition — at a 5 s trigger
   * that is ~17k files/partition/day, which kills scan planning and
   * object-store listing long before 100 TB.
   *
   * The compaction PLAN is computed from directory metadata only (no data
   * jobs); every qualifying partition (≥ `minFiles` files) is then
   * rewritten by ONE Spark job: a single scan of the qualifying
   * partitions, hash-bucketed so each partition comes out in
   * ⌈bytes/targetFileBytes⌉ time-sorted files, written to a hidden
   * staging dir and swapped in per partition via [[swapPartition]] —
   * two metadata renames per partition, bulk deletes outside the
   * visibility window, so a concurrent planner read sees the old files
   * or the new files, never a partly-deleted partition. Still intended
   * to run from the single-writer maintenance job (the same assumption
   * the reference's InfluxDB compactions make). Returns the number of
   * partitions rewritten.
   */
  def compact(tier: Tier, targetFileBytes: Long = 128L * 1024 * 1024,
      minFiles: Int = 4): Int = {
    // (measurement, date, partition dir, bytes) of qualifying partitions
    val parts = for {
      mDir <- subDirs(path(tier.name)) if mDir.getName.startsWith("measurement=")
      dDir <- subDirs(mDir.toString) if dDir.getName.startsWith("date=")
      files = fs.listStatus(dDir)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if files.length >= minFiles
    } yield (mDir.getName.stripPrefix("measurement="),
      dDir.getName.stripPrefix("date="), dDir, files.map(_.getLen).sum)
    if (parts.isEmpty) return 0

    val staging = new HPath(path(tier.name), "._compacting") // hidden from scans
    rmTree(staging.toString)
    val sparkL = spark
    import sparkL.implicits._
    val plan = broadcast(parts.map { case (m, d, _, bytes) =>
      (m, d, math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt))
    }.toDF("_m", "_d", "_n"))
    spark.read.option("basePath", path(tier.name))
      .parquet(parts.map(_._3.toString): _*)
      .join(plan, col("measurement") === col("_m") &&
        col("date").cast("string") === col("_d"))
      .withColumn("_fb", pmod(xxhash64(col("time")), col("_n")))
      .repartition(col("measurement"), col("date"), col("_fb"))
      .sortWithinPartitions(col("measurement"), col("date"), col("time"))
      .drop("_m", "_d", "_n", "_fb")
      .write.partitionBy("measurement", "date").parquet(staging.toString)

    publishHook("staged")
    val trash = new HPath(path(tier.name), "._trash")
    rmTree(trash.toString)
    var done = 0
    parts.foreach { case (m, d, dDir, _) =>
      val fresh = new HPath(staging, s"measurement=$m/date=$d")
      if (fs.exists(fresh)) {
        swapPartition(dDir, Some(fresh), new HPath(trash, s"measurement=$m/date=$d"))
        done += 1
      }
    }
    publishHook("swapped")
    rmTree(staging.toString)
    rmTree(trash.toString)
    done
  }

  /**
   * Replace the `dates` window of a tier with `fresh` rollup rows (the
   * incremental-maintenance commit; [[graft.rollup.Downsampler.maintain]]).
   * The fresh window is STAGED as a complete parquet dataset first, then
   * each affected (measurement, date) partition is published with the
   * two-rename [[swapPartition]]; live partitions inside the window that
   * got no staged replacement are retired the same way (they no longer
   * exist in the recomputed rollup). The previous behavior deleted every
   * overlapping partition BEFORE the aggregation job even ran — minutes
   * of missing data for concurrent readers; now the window per partition
   * is two metadata renames and bulk deletes happen after all swaps.
   */
  def replaceDatePartitions(tier: Tier, fresh: DataFrame, dates: Seq[String]): Unit = {
    val tierPathS = path(tier.name)
    val staging = new HPath(tierPathS, "._restaging")
    val trash = new HPath(tierPathS, "._trash")
    rmTree(staging.toString)
    rmTree(trash.toString)
    fresh
      .withColumn("date", to_date(col("time")))
      .repartition(col("measurement"), col("date"))
      .sortWithinPartitions(col("measurement"), col("date"), col("time"))
      .write.partitionBy("measurement", "date").parquet(staging.toString)
    publishHook("staged")
    // snapshot the staged partition set BEFORE swapping (a swap MOVES the
    // staged dir, so existence checks after it would lie)
    val staged = (for {
      mDir <- subDirs(staging.toString) if mDir.getName.startsWith("measurement=")
      dDir <- subDirs(mDir.toString) if dDir.getName.startsWith("date=")
    } yield (mDir.getName, dDir.getName)).toSet
    staged.foreach { case (m, d) =>
      swapPartition(new HPath(s"$tierPathS/$m/$d"),
        Some(new HPath(staging, s"$m/$d")), new HPath(trash, s"$m/$d"))
    }
    val dateSet = dates.toSet
    for {
      mDir <- subDirs(tierPathS) if mDir.getName.startsWith("measurement=")
      dDir <- subDirs(mDir.toString) if dDir.getName.startsWith("date=")
      if dateSet.contains(dDir.getName.stripPrefix("date="))
      if !staged((mDir.getName, dDir.getName))
    } swapPartition(dDir, None, new HPath(trash, s"${mDir.getName}/${dDir.getName}"))
    publishHook("swapped")
    rmTree(staging.toString)
    rmTree(trash.toString)
  }
}

object CsvSink {
  /** Fixed 11-column CSV header (reference: storage/csv.go:22). */
  val header: Seq[String] = Seq("name", "time", "dev_id", "dev_type", "dir",
    "location_id", "service", "src", "topic", "value", "unit")

  /** S5 CSV sink (storage/csv.go:26-113): append rows in the fixed shape. */
  def write(points: DataFrame, dir: String): Unit =
    points.select(
      col("measurement").as("name"), col("time"), col("dev_id"), col("dev_type"),
      col("dir"), col("location_id"), col("service"), col("src"), col("topic"),
      coalesce(col("value").cast("string"), col("value_str"),
        col("value_bool").cast("string")).as("value"),
      col("unit"))
      .write.mode(SaveMode.Append).option("header", true).csv(dir)
}
