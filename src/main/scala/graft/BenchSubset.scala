package graft

/**
 * One-off benchmark of a named subset of `SparkEntry.queries` /
 * `SparkEntry.benchOnly` — the scaling-curve companion to [[Bench]]
 * (which always runs everything). Same methodology: one untimed warm
 * run, then `runs` timed runs, median reported.
 *
 * Usage: BenchSubset <sfDir> <query>[,<query>...] [runs]
 */
object BenchSubset {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchSubset <sfDir> <q1,q2,...> [runs]")
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    val unknown = names.filterNot(all.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false")
      // same status-store hygiene as Bench (see the comment there)
      .config("spark.appStatusStore.asyncTracking.enable", "false")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = names.map { name =>
      // a crashed query must never masquerade as a fast one: track any
      // throw and annotate the line + JSON instead of timing the failure
      var failed: Option[String] = None
      def once(): Double = {
        val t0 = System.nanoTime()
        try { all(name)(spark, sfDir).count() }
        catch { case e: Throwable => failed = Some(e.getClass.getSimpleName) }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      // adaptive warm-up to JIT steady state (Bench's rule, r13 ask #4)
      var wPrev = once(); var wCur = once(); var warmups = 2
      while (warmups < 4 && math.abs(wCur - wPrev) >
          0.2 * math.min(wCur, wPrev)) {
        wPrev = wCur; wCur = once(); warmups += 1
      }
      val ts = Seq.fill(runs)(once()).sorted
      val median = ts(runs / 2)
      val note = failed.map(e => s"  FAILED ($e)").getOrElse("")
      println(f"$name%-24s $median%8.3f s  (spread ${ts.last - ts.head}%.3f)$note")
      (name, median, failed)
    }
    println(out.map { case (n, t, f) =>
        if (f.isDefined) s""""$n":"FAILED"""" else f""""$n":$t%.3f""" }
      .mkString("{", ",", s"""}  # $sfDir"""))
    if (out.exists(_._3.isDefined)) {
      System.err.println("some queries FAILED; timings above are not comparable")
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
