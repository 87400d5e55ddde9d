package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: every `SparkEntry.queries` entry (plus the bench-only
 * xxhash64 twins of the portable-mode oracle queries) against
 * `SPARK_GRAFT_SF_DIR`. Each query gets one untimed warm run (Janino/
 * codegen compile, JIT, file-listing caches) and then `Runs` timed runs;
 * the reported figure is the MEDIAN, with max−min emitted per query as
 * `spread` — a single cold run mixes compile state into execution time
 * and cannot attribute its own noise.
 */
object Bench {
  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(shufflePartitions = cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = (SparkEntry.queries ++ SparkEntry.benchOnly).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up, untimed
      val runs = Seq.fill(Runs)(once()).sorted
      name -> (runs(Runs / 2), runs.last - runs.head)
    }
    // The stdout report must survive a harness that keeps only the last
    // ~2000 chars of output. Two lines: the detailed per-query medians
    // (centisecond precision keeps ~80 queries under the window), then a
    // ~90-char headline that still parses on its own if growth ever
    // pushes the detailed line's head past the tail boundary.
    def jmap(prec: String)(f: ((String, (Double, Double))) => Double) =
      results.map { case kv @ (k, _) =>
        "\"" + k + "\":" + String.format(prec, Double.box(f(kv)))
      }.mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val headline =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$Runs,"sf":"$sfDir"}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$Runs,""" +
      s""""queries":${jmap("%.2f")(_._2._1)},"sf":"$sfDir"}""")
    println(headline)
    // Full-precision copy on disk for post-hoc analysis (adds spread).
    val full = headline.stripSuffix("}") +
      s""","queries":${jmap("%.3f")(_._2._1)},"spread":${jmap("%.3f")(_._2._2)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    spark.stop()
  }
}
