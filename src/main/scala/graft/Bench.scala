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
    // ms precision keeps the line compact, and `spread` is emitted BEFORE
    // `queries` so that a log collector keeping only the TAIL of the
    // output still retains the medians (the part a reviewer needs most)
    // even if the line's head is truncated.
    def jmap(f: ((String, (Double, Double))) => Double) =
      results.map { case kv @ (k, _) => "\"" + k + "\":" + f"${f(kv)}%.3f" }
        .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$Runs,""" +
      s""""spread":${jmap(_._2._2)},"queries":${jmap(_._2._1)},"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces copy on disk for post-hoc analysis (stdout may be
    // interleaved with sbt/log4j noise by the harness).
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    spark.stop()
  }
}
