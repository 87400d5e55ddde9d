package graft.store

/**
 * Run independent Spark-action thunks concurrently on the calling
 * session and return their results IN ORDER — the
 * [[graft.functions.Dedup]] `concurrentActions` idiom (independent
 * writes of one commit overlap instead of serializing on per-action
 * fixed overhead), generalized to value-returning thunks so the API
 * layer can fan a multi-index command (erase three indexes, audit
 * three indexes) across its independent targets.
 *
 * All thunks are awaited before any failure propagates — bailing on
 * the first would leave siblings in flight while the caller already
 * handles the error (a retry would then race a half-done commit).
 * Futures run on EC threads, OUTSIDE the caller's job group — a
 * `StreamingQuery.stop()` (which cancels by job group) would otherwise
 * leave the jobs running as zombies — so the caller thread's job-group
 * properties are copied onto each action thread, letting cancellation
 * reach them.
 */
object Concurrent {
  def eval[T](sc: org.apache.spark.SparkContext,
      thunks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val props = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel").map(p => p -> sc.getLocalProperty(p))
    def inGroup(body: () => T): T = {
      props.foreach { case (p, v) => sc.setLocalProperty(p, v) }
      try body() finally props.foreach { case (p, _) => sc.setLocalProperty(p, null) }
    }
    // the thunks BLOCK on Spark actions — mark them so the fixed-
    // parallelism global pool spawns replacement threads instead of
    // starving unrelated users (and nested eval calls: the Api-level
    // fan-out runs index-level fan-outs inside its own thunks)
    val fs = thunks.map(a => Future(scala.concurrent.blocking(inGroup(a))))
    val rs = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    rs.map(_.get)
  }
}
