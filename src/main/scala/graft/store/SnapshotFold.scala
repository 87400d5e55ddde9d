package graft.store

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * READER-ATOMIC selective fold of an append-mostly parquet directory —
 * the [[TierLayout]] manifest-publish idiom, generalized to the
 * streamed index tables ([[graft.functions.Similarity]] IVF lists,
 * [[graft.functions.Dedup]] MinHash buckets/shingles) so compaction can
 * run under LIVE probes without quiescing the index: the round-10
 * protocols (per-list rename swap, roll-forward move manifest) were
 * crash-safe for the single maintainer but let a concurrent reader
 * observe a list mid-swap (missing) or a table mid-fold (sources and
 * fold output both visible — rows double-counted).
 *
 * Layout of one folded directory (an index table dir, or one
 * `list_id=N` partition of the IVF index):
 *
 *   part-*.parquet / b-<writer>-<id>-*   raw appends (plain, or batch-
 *                                        tagged by [[StagedBatchAppend]])
 *   _v=N/part-*.parquet                  fold N's output
 *   _commit_N                            manifest: the relative paths
 *                                        fold N superseded (`folded:`
 *                                        lines + `ok` terminator —
 *                                        [[TierLayout.commit]])
 *   _floor                               newest RETIRED version (or
 *                                        generation, at an index root)
 *                                        — pins at or below it fail
 *                                        loudly (raised by marker
 *                                        vacuum)
 *
 * Unlike the tier store's latest-snapshot-wins resolution (a tier
 * compaction rewrites a whole partition), folds here are SELECTIVE —
 * a fold rewrites only the small files, so snapshot versions COMPOSE:
 * the live file set is the union of every committed version's members
 * plus the raw appends, minus everything any committed manifest lists
 * as folded (LSM-style: a later fold may fold an earlier version's
 * small output by its `_v=K/name` relpath). The invariants carried
 * over from [[TierLayout]] unchanged:
 *
 *  - `_`-prefixed entries are invisible to plain listings, so fold
 *    output is staged INTO the directory (one rename of an invisible
 *    target, or even a file-by-file copy) without readers observing it;
 *  - the commit is the atomic appearance of the small `_commit_N`
 *    manifest (staged hidden + renamed — one PUT on S3A);
 *  - a reader resolves against the commits visible at ITS plan time:
 *    before the marker it sees the complete pre-fold file set, after it
 *    the complete post-fold set, never a mixture — the same
 *    hammering-reader contract `StorePublishSpec` pins for the store;
 *  - vacuum runs only after the commit is visible, deletes only what
 *    some manifest folded, and never touches un-folded appends — so
 *    appends racing a fold survive untouched.
 *
 * AS-OF pins ([[AsOfPin]]) resolve through the same records,
 * LOGICALLY: a commit is admitted when its version ≤ the pin's
 * recorded position for this directory; raw ledgered appends resolve
 * through the pin's per-writer ledger positions; only a plain foreign
 * file falls back to the pin's capture-time mtime. Pins are LOUD past
 * reclaimed history: when a commit NEWER than the pin folded files the
 * pinned view needs and vacuum already deleted them, resolution throws
 * instead of silently serving a partial corpus (and the `_floor`
 * record makes pins at or below the newest retired version throw at
 * entry) — the [[TierFileIndex]]/[[BatchLedger]] contract, extended to
 * the indexes.
 *
 * Concurrency contract: any number of READERS at any time; ledgered
 * appends ([[StagedBatchAppend]]) may land DURING a fold (their files
 * are not fold candidates until their ledger marker exists, and the
 * manifest never lists them); folds themselves remain single-maintainer
 * (two concurrent folds of one dir could collide on a version number).
 */
object SnapshotFold {

  /** Test seam at the fold's phase boundaries ("staged" = version dir
   *  in place, no marker yet; "committed" = marker visible, vacuum not
   *  yet run) — the [[TierStore.batchHook]] idiom. */
  private[graft] var hook: String => Unit = _ => ()

  /** Like [[hook]] but with the PUBLISHED DIR — lets a crash test pick
   *  a specific table's publish inside a multi-table pass (e.g. "crash
   *  before the BM25 stats correction commits"). */
  private[graft] var dirHook: (String, HPath) => Unit = (_, _) => ()

  /** A planned fold of one directory: `version` is the commit number to
   *  publish, `candidates` the live files it will rewrite, `foldedRels`
   *  their dir-relative paths (the manifest content). */
  final case class Plan(dir: HPath, version: Long,
      candidates: Seq[FileStatus], foldedRels: Seq[String])

  private def versionOfDir(name: String): Option[Long] =
    if (name.startsWith("_v=")) name.stripPrefix("_v=").toLongOption else None

  private def floorFile(dir: HPath) = new HPath(dir, "_floor")

  /** Shared with the index-generation swap ([[graft.functions
   *  .Similarity.rebuildIvfIndex]]), which keeps the same loud-pin
   *  floor record at the index ROOT for vacuumed generations. */
  private[graft] def readFloor(fs: FileSystem, dir: HPath): Long = {
    val p = floorFile(dir)
    val text = try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: java.io.FileNotFoundException => return 0L }
    text.trim.toLongOption.getOrElse(0L)
  }

  private[graft] def raiseFloor(fs: FileSystem, dir: HPath, t: Long): Unit = {
    val cur = readFloor(fs, dir)
    if (t <= cur) return
    val staged = new HPath(dir, "._floor_staging")
    val out = fs.create(staged, true)
    try out.write(s"$t\n".getBytes("UTF-8")) finally out.close()
    fs.delete(floorFile(dir), false)
    require(fs.rename(staged, floorFile(dir)), s"floor publish failed: $dir")
  }

  /** Commits of `dir` whose manifests are completely visible:
   *  (version, marker status, folded relpaths), ascending. */
  private def commits(fs: FileSystem, dir: HPath,
      entries: Seq[FileStatus]): Seq[(Long, FileStatus, Set[String])] =
    entries.flatMap { e =>
      TierLayout.parseCommit(e.getPath.getName)
        .flatMap(v => TierLayout.readManifest(fs, dir, v).map(m => (v, e, m)))
    }.sortBy(_._1)

  /**
   * Resolve `dir` to the exact data files a reader must scan — the
   * committed versions' members plus admitted raw appends, minus
   * everything any admitted manifest folded. With `pin`, the set as it
   * was at the pin's capture — committed versions admitted by the pin's
   * LOGICAL position for this directory ([[AsOfPin.seqs]]), ledgered
   * appends by the pin's ledger positions, plain foreign files by the
   * pin's capture-time mtime — or IllegalStateException when vacuumed
   * history makes that set unrecoverable.
   */
  def resolve(fs: FileSystem, dir: HPath,
      batchCommitted: (String, Long) => Boolean = (_, _) => true,
      pin: Option[AsOfPin] = None): Seq[FileStatus] = {
    if (!fs.exists(dir)) return Nil
    val entries = fs.listStatus(dir).toSeq
    val pinV = pin.map(_.seqPos(AsOfPin.dirKey(fs, dir)))
    pinV.foreach { pv =>
      val fl = readFloor(fs, dir)
      // the floor is the newest RETIRED version: everything that commit
      // recorded is reclaimed, so any pin at or below it (including a
      // raw-only pin, -1, whose files version 1 may have folded) cannot
      // resolve exactly
      if (fl >= 1 && pv <= fl) throw new IllegalStateException(
        s"as-of pin (version $pv) predates the vacuumed history floor " +
          s"$fl of $dir — re-pin, or fold with retainHistory and vacuum " +
          "only after no live pin needs the old snapshots")
    }
    val all = commits(fs, dir, entries)
    val admitted = all.filter { case (v, _, _) => pinV.forall(v <= _) }
    val folded: Set[String] = admitted.flatMap(_._3).toSet
    // pin exactness: a commit NEWER than the pin superseded files the
    // pinned view still needs; if vacuum already deleted any of them the
    // pin cannot resolve — fail loudly, never partially
    pinV.foreach { _ =>
      all.filterNot { case (_, e, _) => admitted.exists(_._2 eq e) }
        .foreach { case (v, _, m) =>
          (m -- folded).foreach { rel =>
            if (!fs.exists(new HPath(dir, rel)))
              throw new IllegalStateException(
                s"as-of pin predates the vacuum of $dir/$rel (folded by " +
                  s"_commit_$v) — re-pin, or fold with retainHistory and " +
                  "vacuum only after no live pin needs the history")
          }
        }
    }
    val snap = admitted.flatMap { case (v, _, _) =>
      val vd = TierLayout.versionDir(dir, v)
      if (!fs.exists(vd)) Nil
      else fs.listStatus(vd).toSeq.filter(TierLayout.isDataFile)
        .filterNot(f => folded(s"${vd.getName}/${f.getPath.getName}"))
    }
    val raw = entries.filter { f =>
      TierLayout.isDataFile(f) && !folded(f.getPath.getName) &&
        (TierLayout.batchIdOf(f.getPath.getName) match {
          case Some((w, id)) => batchCommitted(w, id)
          case None => pin.forall(f.getModificationTime <= _.millis)
        })
    }
    snap ++ raw
  }

  /**
   * Plan a selective fold: the currently-live files under
   * `targetFileBytes`, when at least `minFiles` of them accumulated
   * (the [[TierStore.compact]] gate). MAINTAINER-ONLY — also discards
   * orphan version dirs (a fold that crashed before its commit marker;
   * invisible to readers, but their numbers must not be reused around
   * stale content).
   */
  def plan(fs: FileSystem, dir: HPath, targetFileBytes: Long,
      minFiles: Int,
      batchCommitted: (String, Long) => Boolean = (_, _) => true): Option[Plan] = {
    if (!fs.exists(dir)) return None
    // sweep crashed-fold orphans BEFORE the minFiles gate: a dir that
    // never re-qualifies for folding must still reclaim the garbage a
    // crashed pre-commit fold left (invisible to readers, but disk)
    sweepOrphanVersionDirs(fs, dir, fs.listStatus(dir).toSeq): Unit
    val live = resolve(fs, dir, batchCommitted)
    val smalls = live.filter(_.getLen < targetFileBytes)
    if (smalls.length < minFiles) None
    else planFiles(fs, dir, smalls)
  }

  /** Delete `_v=N` dirs with no `_commit_N` marker (a fold that crashed
   *  before its commit — invisible to readers, but their numbers must
   *  not be reused around stale content). Returns the committed version
   *  numbers and the surviving dir versions, for version allocation. */
  private def sweepOrphanVersionDirs(fs: FileSystem, dir: HPath,
      entries: Seq[FileStatus]): (Set[Long], Seq[Long]) = {
    val committedVs = entries
      .flatMap(e => TierLayout.parseCommit(e.getPath.getName)).toSet
    val dirVs = entries.filter(_.isDirectory)
      .flatMap(e => versionOfDir(e.getPath.getName).map(_ -> e.getPath))
    dirVs.filterNot { case (v, _) => committedVs(v) }
      .foreach { case (_, p) => fs.delete(p, true) } // crashed pre-commit
    (committedVs, dirVs.map(_._1))
  }

  /**
   * Plan a fold of an EXPLICIT candidate set — the erasure path: the
   * candidates are the files known to carry matching rows, regardless
   * of size or count. Same orphan-dir cleanup and version numbering as
   * [[plan]] (MAINTAINER-ONLY for the same reason). Candidates must be
   * currently-live files of `dir` (from [[resolve]]).
   */
  def planFiles(fs: FileSystem, dir: HPath,
      candidates: Seq[FileStatus]): Option[Plan] = {
    if (candidates.isEmpty || !fs.exists(dir)) return None
    val entries = fs.listStatus(dir).toSeq
    val (committedVs, dirVs) = sweepOrphanVersionDirs(fs, dir, entries)
    val dirQ = fs.makeQualified(dir).toString
    val rels = candidates.map { f =>
      val rel = fs.makeQualified(f.getPath).toString
        .stripPrefix(dirQ).stripPrefix("/")
      require(rel.nonEmpty && !rel.startsWith("/"), s"bad relpath for $f")
      rel
    }
    val v = (committedVs ++ dirVs).maxOption.getOrElse(0L) + 1
    Some(Plan(dir, v, candidates, rels))
  }

  /**
   * Publish one planned fold whose rewritten output sits in
   * `stagedDir`: move it to `_v=<version>` (invisible), then commit the
   * manifest. Readers racing this see the pre-fold set until the
   * marker's atomic appearance, the post-fold set after.
   */
  def publish(fs: FileSystem, dir: HPath, version: Long, stagedDir: HPath,
      foldedRels: Seq[String]): Unit = {
    val vd = TierLayout.versionDir(dir, version)
    fs.delete(vd, true)
    require(fs.rename(stagedDir, vd), s"fold publish: $stagedDir -> $vd failed")
    hook("staged"); dirHook("staged", dir)
    TierLayout.commit(fs, dir, version, foldedRels)
    hook("committed"); dirHook("committed", dir)
  }

  /**
   * Reclaim superseded history: every file some committed manifest
   * folded, version dirs left with no live members, and commit markers
   * whose whole fold has been reclaimed (raising `_floor` so as-of pins
   * older than the reclaimed record fail loudly instead of resolving
   * partially). Safe after any commit; DESTROYS as-of history — a
   * deployment that pins indexes runs folds with `retainHistory` and
   * calls this only once no live pin needs the old snapshots
   * (the [[TierStore.vacuumTier]] separation).
   */
  def vacuumDir(fs: FileSystem, dir: HPath): Unit = {
    if (!fs.exists(dir)) return
    val entries = fs.listStatus(dir).toSeq
    // orphan of a commit that crashed before its marker rename —
    // invisible to readers, reclaimed here (TierLayout.vacuum's rule)
    entries.filter(_.getPath.getName.startsWith("._commit_staging_"))
      .foreach(e => fs.delete(e.getPath, false): Unit)
    val all = commits(fs, dir, entries)
    if (all.isEmpty) return
    val foldedU: Set[String] = all.flatMap(_._3).toSet
    val maxV = all.map(_._1).max
    // folded raw files
    fs.listStatus(dir).foreach { f =>
      if (TierLayout.isDataFile(f) && foldedU(f.getPath.getName))
        fs.delete(f.getPath, false): Unit
    }
    // folded snapshot members; fully-superseded version dirs
    all.foreach { case (v, _, _) =>
      val vd = TierLayout.versionDir(dir, v)
      if (fs.exists(vd)) {
        val members = fs.listStatus(vd).toSeq
        members.foreach { f =>
          if (TierLayout.isDataFile(f) &&
            foldedU(s"${vd.getName}/${f.getPath.getName}"))
            fs.delete(f.getPath, false): Unit
        }
        if (v < maxV &&
          fs.listStatus(vd).forall(e => !TierLayout.isDataFile(e)))
          fs.delete(vd, true): Unit
      }
    }
    // marker retirement: everything commit v recorded is reclaimed —
    // raise the floor FIRST (crash between the two leaves a loud floor
    // and a harmless surviving marker, never a silent partial pin)
    all.filter(_._1 < maxV).foreach { case (v, e, m) =>
      val vdGone = !fs.exists(TierLayout.versionDir(dir, v))
      val foldGone = m.forall(rel => !fs.exists(new HPath(dir, rel)))
      if (vdGone && foldGone) {
        raiseFloor(fs, dir, v) // floor is the newest RETIRED version
        fs.delete(e.getPath, false): Unit
      }
    }
  }

  // ---------------------------------------------------------------- //

  /** A [[FileIndex]] serving an ALREADY-RESOLVED file set — the
   *  reader-side half of the protocol: resolution happened at plan
   *  time on the driver (snapshot isolation for free), Spark gets one
   *  FileSourceScan over exactly the pinned files, and no hive-style
   *  path inference ever sees the `_v=N` segments (which it would
   *  misparse as a partition column). Partition pruning, when the
   *  caller has partition values, happens at RESOLUTION time — pruned
   *  directories are never even listed. */
  final class PinnedFileIndex(spark: SparkSession,
      override val partitionSchema: StructType,
      parts: Seq[(InternalRow, Seq[FileStatus])],
      roots: Seq[HPath]) extends FileIndex {
    override def rootPaths: Seq[HPath] = roots
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      parts.map { case (row, files) => PartitionDirectory(row, files.toArray) }
    override def inputFiles: Array[String] =
      parts.flatMap(_._2).map(_.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = parts.flatMap(_._2).map(_.getLen).sum
  }

  /** DataFrame over pre-resolved files (the [[TierStore]] indexedRead
   *  construction): data schema from one footer, partition columns
   *  appended last. None when no files resolved — the caller supplies
   *  its schema-correct empty frame. */
  def dataFrame(spark: SparkSession, partitionSchema: StructType,
      parts: Seq[(InternalRow, Seq[FileStatus])],
      roots: Seq[HPath]): Option[DataFrame] =
    parts.iterator.flatMap(_._2).map(_.getPath).nextOption().map { first =>
      val dataSchema = spark.read.parquet(first.toString).schema
      val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        new PinnedFileIndex(spark, partitionSchema, parts, roots),
        partitionSchema, dataSchema, None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty[String, String])(spark)
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .baseRelationToDataFrame(relation)
    }
}
