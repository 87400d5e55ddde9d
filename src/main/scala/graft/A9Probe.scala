package graft

import org.apache.spark.sql.functions._

/**
 * One-off decomposition probe for the `a9_streaming_hop` driver-bench
 * anomaly (VERDICT r8 "What's wrong" #1): times each harness stage
 * (routed batch write → streaming hop → read-back) separately, A/B'd
 * across filesystem roots (`/tmp` ext4 vs `/dev/shm` tmpfs), to
 * attribute the inflation between CPU work and storage-device speed.
 * Findings land in BENCH_NOTES.md "a9_streaming_hop root cause".
 */
object A9Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq("/tmp", "/dev/shm").foreach { base =>
      (1 to 3).foreach { run =>
        val root = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft_a9p").toFile.getAbsolutePath
        val store = new graft.store.TierStore(spark, root)
        // inline copy of SparkEntry.points (private there)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        val ts = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
          case _ => col("ts").cast("timestamp")
        }
        val src = raw.withColumn("ts", ts).select(
          concat(lit("sensor_"), col("event_type")).as("measurement"),
          col("ts").as("time"), col("value"),
          col("user_id").cast("string").as("dev_id"),
          (col("user_id") % 5).cast("string").as("location_id"),
          when(col("user_id") % 7 === 0, "meter.main_elec").otherwise("sensor").as("dev_type"),
          when(col("event_id") % 2 === 0, "import").otherwise("export").as("dir"),
          concat(lit("sensor_"), col("event_type"), lit(";"),
            col("user_id").cast("string")).as("series_id"))
          .filter(col("measurement") === "sensor_click")
        val tW = sec { store.writeRouted(src) }
        var tStream = 0.0
        val tHop = sec {
          val q = graft.rollup.Downsampler.streamingHop(store,
            graft.model.Tier.GenRaw, graft.model.Tier.GenDay,
            s"$root/_ckpt_hop", watermark = "30 minutes")
          tStream = sec { q.processAllAvailable() }
          q.stop()
        }
        val tRead = sec {
          store.read(graft.model.Tier.GenDay).count()
        }
        println(f"A9PROBE base=$base%-9s run=$run write=$tW%6.2f hop=$tHop%6.2f (paa=$tStream%6.2f) read=$tRead%5.2f total=${tW + tHop + tRead}%6.2f")
        // recursive temp cleanup
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator.asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    spark.stop()
  }
}
