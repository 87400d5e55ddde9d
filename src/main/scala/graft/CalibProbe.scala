package graft

import org.apache.spark.sql.SparkSession

/**
 * The load-calibration probe shared by [[Bench]] (in-run flagging) and
 * this standalone main (quiet-baseline measurement): a fixed CPU-bound
 * query — 2^27 xxhash64 rows bit_xor-folded across all threads,
 * data-independent — timed n× after one untimed warm run. Both sides
 * MUST time the identical workload or the calibration contract breaks:
 * the baseline `Bench.CalibQuietSec` comes from this main and the flag
 * compares Bench's in-run probe against it, so the probe body lives
 * here exactly once.
 *
 * Run the main in a quiet session to (re)establish the baseline for the
 * current hardware (export SPARK_GRAFT_CALIB_QUIET); `Bench` then flags
 * any run whose in-run probe exceeds the documented band (see
 * BENCH_NOTES.md "calibration").
 */
object CalibProbe {

  /** One warm run, then `n` timed runs, ASCENDING. Callers take the
   *  median (`runs(n / 2)`). */
  def probeRuns(spark: SparkSession, cpus: Int, n: Int): Seq[Double] = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 27, 1L, cpus)
        .select(bit_xor(xxhash64(col("id")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    Seq.fill(n)(once()).sorted
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(shufflePartitions = cpus)
      .master(s"local[$cpus]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = probeRuns(spark, cpus, 5)
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"calib_median_sec":${runs(2)}%.3f,""" +
      f""""all":[${runs.map(r => f"$r%.3f").mkString(",")}],"load_avg":$load%.2f}""")
    spark.stop()
  }
}
