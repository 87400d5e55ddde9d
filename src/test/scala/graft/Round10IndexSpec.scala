package graft

import graft.functions.{Dedup, Similarity}
import graft.store.{BatchLedger, StagedBatchAppend}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-10 streaming-index maintenance: the two persisted indexes
 * (IVF lists, MinHash buckets/shingles) get the tier store's two
 * idioms — per-batch ledger markers so a crash replay SKIPS a
 * committed append (zero duplicates WITHOUT compaction), and
 * compaction that folds only lists/files that actually grew (the
 * `TierStore.compact` minFiles idiom) instead of rewriting the whole
 * index per call.
 */
class Round10IndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = graft.Fixtures
    .newDir("graft_r10idx").toFile.getAbsolutePath

  private def fsOf(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Two well-separated 4-D clusters around e1 and e2 (array<float> —
   *  the fixture must match what appended batches write, or the mixed
   *  list files fail to scan). */
  private def clustered(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id").as("vec_id"),
      array(
        when(col("id") % 2 === 0, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        when(col("id") % 2 === 1, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        lit(0.02f), lit(0.03f)).as("embedding"))

  private def listRows(idx: String): DataFrame =
    Similarity.readIvfLists(spark, idx)

  /** Live files of one folded dir, via the snapshot resolver (after a
   *  manifest-publish fold the live members sit in `_v=` snapshots a
   *  plain walk cannot see). */
  private def liveFiles(dir: String): Set[String] = {
    val fs = fsOf(dir)
    graft.store.SnapshotFold.resolve(fs, new HPath(dir))
      .map(_.getPath.toString).toSet
  }

  private def dataFileNames(dir: String): Set[String] = {
    val fs = fsOf(dir)
    def walk(p: HPath): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { e =>
        val n = e.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (e.isDirectory) walk(e.getPath)
        else Seq(e.getPath.toString)
      }
    walk(new HPath(dir)).toSet
  }

  test("IVF append replays exactly-once through the index ledger: a " +
    "crash at every phase leaves zero duplicates WITHOUT compaction") {
    val work = tmpDir()
    val emb = clustered(20)
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 10), s"$work/idx",
      nLists = 2, trainIters = 2)
    val batch = emb.filter(col("vec_id") >= 10 && col("vec_id") < 15)

    def assertOnce(): Unit = {
      val rows = listRows(s"$work/idx")
      assert(rows.count() == 15L, "total rows")
      assert(rows.select("vec_id").distinct().count() == 15L,
        "duplicate vec_ids in the index")
    }
    // plain replay: second call with the same batch id is a skip
    assert(Similarity.appendIvfBatch(batch, s"$work/idx", 0L))
    assert(!Similarity.appendIvfBatch(batch, s"$work/idx", 0L))
    assertOnce()

    // crash at each phase boundary of the NEXT batch, then replay: the
    // manifest-led cleanup + deterministic names land the batch once
    val batch2 = emb.filter(col("vec_id") >= 15)
    Seq("staged", "manifested", "moved").foreach { phase =>
      StagedBatchAppend.hook = p =>
        if (p == phase) throw new RuntimeException(s"crash at $p")
      intercept[RuntimeException] {
        Similarity.appendIvfBatch(batch2, s"$work/idx", 1L)
      }
      StagedBatchAppend.hook = _ => ()
      // crashed attempt is uncommitted; a replay must land it once
      assert(Similarity.appendIvfBatch(batch2, s"$work/idx", 1L),
        s"replay after crash at $phase must commit")
      val rows = listRows(s"$work/idx")
      assert(rows.count() == 20L, s"after crash at $phase")
      assert(rows.select("vec_id").distinct().count() == 20L,
        s"duplicates after crash at $phase")
      // reset for the next phase: drop batch 1's marker + files so the
      // loop re-runs the same batch from scratch
      val fs = fsOf(work)
      fs.delete(BatchLedger.markerFile(new HPath(s"$work/idx"), "ivf", 1L), false)
      dataFileNames(s"$work/idx/lists").filter(_.contains("b-ivf-1-"))
        .foreach(f => fs.delete(new HPath(f), false))
    }
    // leave batch 1 committed for the final probe check
    Similarity.appendIvfBatch(batch2, s"$work/idx", 1L)
    val got = Similarity.queryIvfIndex(spark, s"$work/idx",
      emb.filter(col("vec_id") === 0), k = 3, nProbes = 2)
      .select("vec_id").as[Long].collect().toSet
    val want = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
      k = 3).select("vec_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("IVF compaction is selective: only lists past minFiles are " +
    "rewritten; untouched lists keep their files byte-for-byte") {
    val work = tmpDir()
    val emb = clustered(20)
    Similarity.buildIvfIndex(emb, s"$work/idx", nLists = 2, trainIters = 2)
    // craft appends that assign to ONE list only: scaled copies of one
    // centroid (cosine is scale-invariant, so assignment is exact)
    val cRow = spark.read.parquet(s"$work/idx/centroids")
      .orderBy("list_id").limit(1).collect()(0)
    val targetList = cRow.getLong(cRow.fieldIndex("list_id"))
    val cVec = cRow.getSeq[Double](cRow.fieldIndex("centroid"))
    (0 until 4).foreach { b =>
      val batch = Seq((1000L + b, cVec.map(x => (x * (b + 2)).toFloat)))
        .toDF("vec_id", "embedding")
      assert(Similarity.appendIvfBatch(batch, s"$work/idx", b.toLong))
    }
    val grown = s"$work/idx/lists/list_id=$targetList"
    val others = dataFileNames(s"$work/idx/lists") -- dataFileNames(grown)
    assert(dataFileNames(grown).size >= 5, "fixture: target list must grow")

    val (before, after) = Similarity.compactIvfLists(spark, s"$work/idx",
      minFiles = 4)
    assert(after < before, s"no fold: $before -> $after")
    // the untouched lists' files are EXACTLY the ones from before — the
    // selective pass never read or rewrote them
    assert(dataFileNames(s"$work/idx/lists") -- dataFileNames(grown) == others,
      "compaction touched lists that had not grown")
    assert(liveFiles(grown).size == 1, "grown list should fold to one live file")
    val rows = listRows(s"$work/idx")
    assert(rows.count() == 24L && rows.select("vec_id").distinct().count() == 24L)
    // a second call with nothing grown is a no-op
    val (b2, a2) = Similarity.compactIvfLists(spark, s"$work/idx", minFiles = 4)
    assert(b2 == a2, "idle compaction must not rewrite anything")
  }

  test("MinHash fold is selective and roll-forward crash-safe; ledgered " +
    "append replays exactly-once") {
    val root = tmpDir()
    val docs = (0 until 40).map(i =>
      (i.toLong, s"document number $i about graft spark shuffles and " +
        s"bucketed joins variant ${i % 7} with trailing entropy $i"))
      .toDF("doc_id", "text")
    def shOf(df: DataFrame) = Dedup.shingledDocs(df, 3, 16, "doc_id", "text")
    // three ledgered micro-batch appends
    (0 until 3).foreach { b =>
      val part = docs.filter($"doc_id" % 4 === b)
      if (b == 0) Dedup.buildMinhashIndex(part, root, n = 3, k = 16, bands = 4)
      else assert(Dedup.appendShingledToIndexBatch(shOf(part), root,
        3, 16, 4, b.toLong))
    }
    // replay skip: the same batch id again must not append
    val shinglesCount = () =>
      Dedup.readIndexTable(spark, root, "shingles").count()
    val n0 = shinglesCount()
    assert(!Dedup.appendShingledToIndexBatch(
      shOf(docs.filter($"doc_id" % 4 === 2)), root, 3, 16, 4, 2L))
    assert(shinglesCount() == n0, "replayed append duplicated index rows")

    val query = docs.filter($"doc_id" % 4 === 3)
      .withColumn("doc_id", col("doc_id") + 1000)
    val hits = () => Dedup.queryMinhashIndex(spark, query, root,
      n = 3, k = 16, bands = 4, threshold = 0.5)
      .select("id_new", "id_idx").as[(Long, Long)].collect().toSet
    assert(hits().nonEmpty, "fixture: the query must hit the index")

    // SIZE gate: every file is >= 10 bytes, so nothing is "small" —
    // the fold is a no-op and every file survives untouched
    val namesBefore = dataFileNames(s"$root/buckets") ++ dataFileNames(s"$root/shingles")
    val (nb1, na1) = Dedup.compactMinhashIndex(spark, root, targetFileBytes = 10L)
    assert(nb1 == na1 &&
      dataFileNames(s"$root/buckets") ++ dataFileNames(s"$root/shingles") == namesBefore,
      "size gate: files at/over target must never fold")
    // COUNT gate: 3 files per table < minFiles = 8 — also a no-op
    val (nb2, na2) = Dedup.compactMinhashIndex(spark, root, minFiles = 8)
    assert(nb2 == na2, "count gate: under-minFiles tables must not fold")

    // crash at BOTH manifest-publish phases ("staged" = _v dir in place,
    // no marker yet; "committed" = marker visible, vacuum not yet run);
    // readers are unaffected at every instant and the next maintainer
    // call converges the layout, with no duplicate index rows
    Seq("staged", "committed").foreach { phase =>
      // the fold must never change query results: pin them just before
      // the crash attempt
      val expect = hits()
      graft.store.SnapshotFold.hook = p =>
        if (p == phase) throw new RuntimeException(s"crash at $p")
      intercept[RuntimeException] {
        Dedup.compactMinhashIndex(spark, root, minFiles = 2)
      }
      graft.store.SnapshotFold.hook = _ => ()
      assert(hits() == expect, s"queries changed by the CRASHED fold at $phase")
      val (_, after) = Dedup.compactMinhashIndex(spark, root, minFiles = 2)
      assert(after == 2, s"fold after crash at $phase should leave one " +
        s"live file per table, got $after")
      assert(hits() == expect, s"queries changed after crash at $phase")
      val sh = Dedup.readIndexTable(spark, root, "shingles")
      assert(sh.count() == sh.select("id").distinct().count(),
        s"duplicate shingle rows after crash at $phase")
      // regrow for the next phase (fresh batch ids)
      (0 until 2).foreach { b =>
        Dedup.buildMinhashIndex(
          docs.filter($"doc_id" % 4 === b).withColumn("doc_id",
            col("doc_id") + 100 * (phase.length + b)), root,
          n = 3, k = 16, bands = 4, append = true)
      }
    }
  }

  test("StagedBatchAppend marker fold keeps the ledger bounded and " +
    "still attests committed batches") {
    val root = tmpDir()
    val df = Seq((1L, "a")).toDF("id", "v")
    (0 to 2).foreach { b =>
      assert(StagedBatchAppend.append(spark, root, "w", b.toLong) { staging =>
        df.write.parquet(s"$staging/t")
      })
    }
    StagedBatchAppend.foldMarkers(spark, root, "w")
    val names = fsOf(root).listStatus(BatchLedger.dir(new HPath(root)))
      .map(_.getPath.getName).toSet
    assert(names == Set("_bwm_w_2"), names.toString)
    // a folded batch is still committed: the replay must skip
    assert(!StagedBatchAppend.append(spark, root, "w", 1L) { staging =>
      df.write.parquet(s"$staging/t")
    })
    assert(spark.read.parquet(s"$root/t").count() == 3L)
  }
}
