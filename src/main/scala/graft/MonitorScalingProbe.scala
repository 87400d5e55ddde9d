package graft

import graft.functions.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-batch vs per-row cost decomposition for the two streaming
 * monitors (VERDICT r9 ask #5): `prof_streaming_psi` /
 * `prof_streaming_topk` are the bench's most expensive non-composite
 * entries, and the design claim is that their cost follows
 * MICRO-BATCH COUNT and open-window STATE, not row volume. This probe
 * measures exactly that: each monitor runs over the SAME input chunked
 * into 1 and 8 micro-batches at sf0.1 AND at sf1 (10× the rows), with
 * the run's max state rows recorded from the engine's own progress
 * events. If the claim holds, wall time moves with the chunk count and
 * barely with the scale factor — the 2×2 grid per monitor makes both
 * axes directly readable, and a least-squares-free two-point fit
 * (f = per-batch machinery, m = per-row work) falls out per scale.
 *
 * Usage: runMain graft.MonitorScalingProbe [sf01Dir] [sf1Dir] [workDir]
 * Prints one `monitor_scaling` JSON line for BENCH_SF1.md.
 */
object MonitorScalingProbe {

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.lift(1).getOrElse("tmp-sf1")
    val work0 = args.lift(2).getOrElse("tmp-monprobe")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path(work0)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work0), true)

    val stats = new java.util.concurrent.ConcurrentLinkedQueue[SoakUtil.BatchStat]()
    @volatile var phase = ""
    SoakUtil.addProgressListener(spark, () => phase, stats)
    val runs = new SoakUtil.RunRegistry

    /** One monitor run: stream `pts` from `chunks` files (one file per
     *  trigger), seal windows, finalize. Returns (wall s, batches,
     *  max state rows, input rows, result rows). */
    def run(tag: String, pts: DataFrame, chunks: Int, isPsi: Boolean)
        : (Double, Int, Long, Long, Long) = {
      val work = s"$work0/$tag"
      SoakUtil.writeChunks(spark, pts, "time", s"$work/in", chunks)
      val rows = pts.count()
      phase = tag
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
      val sealedQ =
        if (isPsi) Profile.streamingHistogram(src, "time", col("cents"),
          lo = 0.0, hi = 50000.0, nBuckets = 20,
          windowDur = "6 hours", watermarkDelay = "2 hours")
        else Profile.streamingKeyCounts(src, "time", col("user_id"),
          windowDur = "6 hours", watermarkDelay = "2 hours")
      val q = sealedQ.writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .format("parquet").option("path", s"$work/out").start()
      runs.add(tag, q)
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      val result =
        if (isPsi) {
          val ref = Profile.histogram(pts, col("cents"), lo = 0.0,
            hi = 50000.0, nBuckets = 20)
          Profile.finalizePsi(spark.read.parquet(s"$work/out"), ref).count()
        } else
          Profile.finalizeTopKeys(spark.read.parquet(s"$work/out"), k = 5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading the stats
      Thread.sleep(1500)
      val ids = runs.ids(tag)
      val ps = stats.toArray(Array.empty[SoakUtil.BatchStat]).filter(s => ids(s.runId))
      val maxState = if (ps.isEmpty) -1L else ps.map(_.stateRows).max
      (wall, ps.length, maxState, rows, result)
    }

    def psiInput(dir: String): DataFrame =
      SparkEntry.events(spark, dir).select(col("ts").as("time"),
        round(col("value") * 100).cast("long").cast("double").as("cents"))
    def topkInput(dir: String): DataFrame =
      SparkEntry.events(spark, dir).select(col("ts").as("time"), col("user_id"))

    val grid = for {
      (mon, isPsi) <- Seq(("psi", true), ("topk", false))
      (sfName, dir) <- Seq(("sf0.1", sf01), ("sf1", sf1))
      chunks <- Seq(1, 8)
    } yield {
      val (wall, batches, state, rows, res) =
        run(s"${mon}_${sfName}_c$chunks", if (isPsi) psiInput(dir) else topkInput(dir),
          chunks, isPsi)
      println(f"""{"monitor":"$mon","sf":"$sfName","chunks":$chunks,""" +
        f""""wall_sec":$wall%.2f,"batches":$batches,"max_state_rows":$state,""" +
        f""""input_rows":$rows,"result_rows":$res}""")
      (mon, sfName, chunks, wall, batches, state, rows)
    }

    // two-point fit per (monitor, sf): wall = f·batches + base
    val fits = grid.groupBy(g => (g._1, g._2)).toSeq.sortBy(_._1).map {
      case ((mon, sf), rs) =>
        val one = rs.find(_._3 == 1).get
        val eight = rs.find(_._3 == 8).get
        val perBatch = (eight._4 - one._4) / math.max(1, eight._5 - one._5)
        f"""{"monitor":"$mon","sf":"$sf","per_batch_sec":$perBatch%.2f,""" +
          f""""base_sec":${one._4 - perBatch * one._5}%.2f}"""
    }
    println(s"""{"monitor_scaling":{"grid":${grid.size},""" +
      s""""fits":[${fits.mkString(",")}]}}""")
    spark.stop()
  }
}
