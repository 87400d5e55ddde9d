package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Audit-grade PHYSICAL erasure verification — the proof a compliance
 * run hands the auditor: a resolver-BYPASSING scan of every parquet
 * file still on disk under a store root (committed, superseded,
 * staged, hidden — everything the recursive walk finds), counting
 * rows that match the erased ids. An erase's own return value says
 * what the pass removed; this says what is LEFT, measured against the
 * raw bytes rather than any read path that could be hiding rows
 * behind a manifest. `rows_scanned` doubles as the completeness
 * witness: it must equal the survivors' physical row count, so a walk
 * that silently skipped files is visible too.
 *
 * Cost: one full scan of the root's parquet (id column only — parquet
 * prunes the rest). That is the audit contract at 100 TB: run it per
 * compliance batch, not per query.
 */
object EraseAudit {

  /** (files walked, rows scanned, matching rows found). `skipDirs`
   *  excludes subtrees whose schema lacks `idCol` (e.g. IVF
   *  `centroids/`). */
  def scan(spark: SparkSession, root: String, idCol: String,
      ids: Seq[Long], skipDirs: Set[String] = Set.empty): (Long, Long, Long) = {
    require(ids.nonEmpty, "empty audit id set")
    val rootP = new HPath(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return (0L, 0L, 0L)
    def walk(p: HPath): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { e =>
        if (e.isDirectory) {
          if (skipDirs(e.getPath.getName)) Nil else walk(e.getPath)
        } else if (e.getPath.getName.endsWith(".parquet")) Seq(e.getPath.toString)
        else Nil
      }
    val files = walk(rootP)
    if (files.isEmpty) return (0L, 0L, 0L)
    // membership through IdFilter (one pass for both counts): a
    // literal IN-list for a bounded batch, a broadcast left join +
    // marker column for a mass purge
    val r = IdFilter.markIn(
        spark.read.parquet(files: _*).select(col(idCol)), idCol, ids, "_hit")
      .agg(count(lit(1)),
        count(when(col("_hit"), lit(1)))).collect()(0)
    (files.length.toLong, r.getLong(0), r.getLong(1))
  }
}
