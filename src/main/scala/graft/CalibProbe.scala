package graft

/**
 * Standalone runner for [[Bench]]'s load-calibration probe: the fixed
 * CPU-bound query (2^27 xxhash64 rows bit_xor-folded across all threads) timed
 * 5× after one warm run, median reported. Run this in a quiet session
 * to (re)establish `Bench.CalibQuietSec` for the current hardware;
 * `Bench` then flags any bench run whose in-run probe exceeds the
 * documented band (see BENCH_NOTES.md "calibration").
 */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(shufflePartitions = cpus)
      .master(s"local[$cpus]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 27, 1L, cpus)
        .select(bit_xor(xxhash64(col("id")))).head()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val runs = Seq.fill(5)(once()).sorted
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"calib_median_sec":${runs(2)}%.3f,""" +
      f""""all":[${runs.map(r => f"$r%.3f").mkString(",")}],"load_avg":$load%.2f}""")
    spark.stop()
  }
}
