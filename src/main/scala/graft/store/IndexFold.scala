package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/**
 * The shared FOLD CORE of the persisted indexes — the maintenance
 * counterpart of [[IndexErase]] (the round-11 factoring ask,
 * concluded): one implementation of "plan the small live files, rewrite
 * them shaped, publish each dir's rewrite through the [[SnapshotFold]]
 * manifest" that the IVF lists ([[graft.functions.Similarity
 * .compactIvfLists]]), the MinHash tables ([[graft.functions.Dedup
 * .compactMinhashIndex]]) and the BM25 postings/stats/zero-docs tables
 * ([[graft.functions.Retrieval.compactBm25Index]]) all drive with a
 * schema, a write shape, and an optional row transform (IVF dedups by
 * (list_id, vec_id); the BM25 stats deltas fold into their one-row
 * sum; everything else concatenates).
 *
 * Reader atomicity, crash safety, and the append-race contract are
 * [[SnapshotFold]]'s, unchanged: folds stage invisibly, commit by one
 * atomic marker, and never list an uncommitted batch's files as
 * candidates. Single maintainer per index, as everywhere.
 */
object IndexFold {

  /**
   * Selective fold of ONE unpartitioned table dir. Returns true when a
   * fold qualified and published. `shape` rewrites the candidate frame
   * (identity concat by default); `coalesceOne` writes a single file
   * (one-row delta ledgers), otherwise ~targetFileBytes files.
   */
  def foldDir(spark: SparkSession, fs: FileSystem, dir: HPath, staged: HPath,
      targetFileBytes: Long, minFiles: Int,
      committed: (String, Long) => Boolean,
      shape: DataFrame => DataFrame = identity,
      coalesceOne: Boolean = false): Boolean =
    SnapshotFold.plan(fs, dir, targetFileBytes, minFiles, committed) match {
      case None => false
      case Some(p) =>
        fs.delete(staged, true)
        val n = math.max(1, math.ceil(
          p.candidates.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
        val df = shape(SnapshotFold.dataFrame(spark, new StructType(),
          Seq((InternalRow.empty, p.candidates)), Seq(dir)).get)
        (if (coalesceOne) df.coalesce(1) else df.repartition(n))
          .write.parquet(staged.toString)
        SnapshotFold.publish(fs, dir, p.version, staged, p.foldedRels)
        true
    }

  /**
   * Selective fold of a PARTITIONED dir tree (`list_id=N` / `shard=N`)
   * in ONE Spark job over only the touched dirs' candidates — the
   * pinned file index supplies the partition column (hive inference
   * would misparse the `_v=N` segments). Publishes per dir; a planned
   * dir whose shaped rewrite produced no output (empty candidates) is
   * left unpublished, exactly as before. Returns the number of dirs
   * published (0 = nothing qualified).
   */
  def foldPartitioned(spark: SparkSession, fs: FileSystem, root: HPath,
      dirs: Seq[(InternalRow, HPath)], partitionSchema: StructType,
      partitionCol: String, staged: HPath, targetFileBytes: Long,
      minFiles: Int, committed: (String, Long) => Boolean,
      shape: DataFrame => DataFrame = identity,
      retainHistory: Boolean = false): Int = {
    val plans = dirs.flatMap { case (row, d) =>
      SnapshotFold.plan(fs, d, targetFileBytes, minFiles, committed)
        .map(p => (row, d.getName, p))
    }
    if (plans.isEmpty) return 0
    fs.delete(staged, true)
    val parts = plans.map { case (row, _, p) => (row, p.candidates) }
    val bytes = plans.flatMap(_._3.candidates).map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    shape(SnapshotFold.dataFrame(spark, partitionSchema, parts, Seq(root)).get)
      .repartition(n, col(partitionCol))
      .write.partitionBy(partitionCol).parquet(staged.toString)
    var published = 0
    plans.foreach { case (_, name, p) =>
      val fresh = new HPath(staged, name)
      if (fs.exists(fresh)) {
        SnapshotFold.publish(fs, p.dir, p.version, fresh, p.foldedRels)
        if (!retainHistory) SnapshotFold.vacuumDir(fs, p.dir)
        published += 1
      }
    }
    fs.delete(staged, true)
    published
  }
}
