package graft.functions

import org.apache.spark.sql.DataFrame

/**
 * Stage-boundary materialization for multi-stage pipelines and
 * iterative loops.
 *
 * `localCheckpoint` truncates lineage by storing blocks on EXECUTORS —
 * fast (no DFS round trip), but not fault-tolerant: one lost executor
 * in hour 6 of a 100 TB run kills the job, and because the lineage was
 * truncated nothing can be recomputed. Passing `dir = Some(path)` swaps
 * every boundary for a durable parquet round-trip under that path:
 * executor loss costs one task retry, the artifact survives the job,
 * and an operator can inspect (or resume from) any completed stage.
 *
 * Parquet rather than reliable RDD `checkpoint()`: no global
 * `setCheckpointDir` mutation, columnar bytes instead of
 * Java-serialized rows, and the boundary doubles as an inspectable
 * artifact. Both forms cut lineage identically, so plans downstream of
 * a boundary are the same either way — the spec pins output equality.
 */
object Stages {

  /** Materialize `df` as a stage boundary: executor-block
   *  localCheckpoint when `dir` is None, durable parquet under
   *  `dir/name` otherwise. Eager in both forms. */
  def boundary(df: DataFrame, dir: Option[String], name: String): DataFrame =
    dir match {
      case None => df.localCheckpoint()
      case Some(root) =>
        val path = s"$root/$name"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
    }
}
