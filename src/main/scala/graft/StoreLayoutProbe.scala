package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measures what [[graft.store.TierStore.compact]]'s `clusterBy` layout
 * buys a point-device query — the operational evidence behind the
 * "workload-aware file clustering" claim (README): the same store, the
 * same query, three physical layouts:
 *
 *   appends    one file per micro-batch append, every device in every
 *              file (what streaming ingest leaves behind)
 *   time       the default compaction (hash-of-time buckets, time-sorted
 *              row groups — tight for time ranges, nothing for devices)
 *   clustered  `clusterBy = dev_id` (device-bucketed files, (dev, time)
 *              sorted row groups, dev_id bloom filters)
 *
 * Reported per layout: rows MATERIALIZED by the scan for one device's
 * point query (`numOutputRows` of the FileSourceScan — rows parquet
 * could not prune at row-group level), files scanned, and the median
 * wall time of 3 runs. Run:
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StoreLayoutProbe"
 */
object StoreLayoutProbe {

  private def scanStats(df: DataFrame): (Long, Long, Long, Long) = {
    val t0 = System.nanoTime()
    val n = df.collect().length.toLong
    val wallMs = (System.nanoTime() - t0) / 1000000L
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    (n, scan.metrics("numOutputRows").value, scan.metrics("numFiles").value, wallMs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    val pts = raw.filter(col("event_type") === "click").select(
      lit("app_click").as("measurement"), ts.as("time"), col("value"),
      col("user_id").cast("string").as("dev_id"),
      (col("user_id") % 5).cast("string").as("location_id"),
      lit("sensor").as("dev_type"))
    val dev = pts.groupBy("dev_id").count()
      .orderBy(col("count").desc, col("dev_id")).head.getString(0)

    val root = graft.Fixtures.newDir("graft_layout")
      .toFile.getAbsolutePath
    val store = new graft.store.TierStore(spark, root)
    // 8 appends = 8 micro-batch files per partition, every device in each
    (0 until 8).foreach(b =>
      store.write(graft.model.Tier.GenRaw, pts.filter(pmod(xxhash64(col("value")), lit(8)) === b)))

    def measure(layout: String): String = {
      def q() = store.read(graft.model.Tier.GenRaw)
        .filter(col("measurement") === "app_click" && col("dev_id") === dev)
      val runs = (1 to 3).map(_ => scanStats(q()))
      val (rows, scanned, files, _) = runs.head
      val wall = runs.map(_._4).sorted.apply(1)
      s""""$layout":{"rows_out":$rows,"rows_scanned":$scanned,"files":$files,"wall_ms":$wall}"""
    }

    val total = pts.count()
    val a = measure("appends")
    // ~8 cluster buckets per date partition (the per-partition byte
    // budget drives the bucket count; 2 KB ≈ 1/8 of a date's bytes here)
    store.compact(graft.model.Tier.GenRaw, targetFileBytes = 2048, minFiles = 1)
    val b = measure("time_compacted")
    store.compact(graft.model.Tier.GenRaw,
      targetFileBytes = 2048, minFiles = 1, clusterBy = Seq("dev_id"))
    val c = measure("clustered")
    println(s"""{"probe":"store_layout","sf":"$sfDir","total_rows":$total,"device":"$dev",$a,$b,$c}""")
    spark.stop()
  }
}
