package graft

import graft.functions.Similarity
import graft.store.IdFilter
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-12 contracts: (1) the erase/audit id sets scale past the
 * literal IN-list bound — above [[IdFilter.InListMax]] membership is a
 * broadcast semi/anti hash join (plan guard), with results identical
 * to the literal path, and a ≥100k-id mass purge through
 * [[Similarity.eraseFromIvfIndex]] leaves exactly the complement;
 * (2) the small-set path is unchanged (still a literal predicate, no
 * join operator in the plan).
 */
class Round12IndexSpec extends SparkSpec {

  private def tmpDir(): String = graft.Fixtures
    .newDir("graft_r12").toFile.getAbsolutePath

  private def idsFrame(n: Long): DataFrame =
    spark.range(n).select(col("id"), (col("id") % 7).as("v"))

  private val bigIds: Seq[Long] = (0L until 120000L).map(_ * 2 + 1)
  private val smallIds: Seq[Long] = Seq(1L, 3L, 5L)

  test("IdFilter: large sets go through a broadcast join (plan guard)") {
    val df = idsFrame(100)
    val semi = IdFilter.keepIn(df, "id", bigIds)
      .queryExecution.executedPlan.toString
    assert(semi.contains("BroadcastHashJoin") && semi.contains("LeftSemi"),
      s"keepIn(large) must plan a broadcast semi join:\n$semi")
    val anti = IdFilter.dropIn(df, "id", bigIds)
      .queryExecution.executedPlan.toString
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"),
      s"dropIn(large) must plan a broadcast anti join:\n$anti")
    val mark = IdFilter.markIn(df, "id", bigIds, "_hit")
      .queryExecution.executedPlan.toString
    assert(mark.contains("BroadcastHashJoin"),
      s"markIn(large) must plan a broadcast join:\n$mark")
  }

  test("IdFilter: small sets stay a literal predicate (no join)") {
    Seq(
      IdFilter.keepIn(idsFrame(100), "id", smallIds),
      IdFilter.dropIn(idsFrame(100), "id", smallIds),
      IdFilter.markIn(idsFrame(100), "id", smallIds, "_hit")
    ).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"small-set path must not plan a join:\n$p")
    }
  }

  test("IdFilter: join path ≡ literal path, row for row") {
    val df = idsFrame(50000)
    def rows(q: DataFrame): Set[(Long, Long)] =
      q.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantIn = rows(df.filter(col("id").isin(bigIds: _*)))
    val wantOut = rows(df.filter(!col("id").isin(bigIds: _*)))
    assert(rows(IdFilter.keepIn(df, "id", bigIds)) == wantIn)
    assert(rows(IdFilter.dropIn(df, "id", bigIds)) == wantOut)
    val marked = IdFilter.markIn(df, "id", bigIds, "_hit")
    assert(rows(marked.filter(col("_hit"))) == wantIn)
    assert(rows(marked.filter(!col("_hit"))) == wantOut)
    // markIn never duplicates rows (left join against a DISTINCT set)
    assert(marked.count() == 50000L)
  }

  test("IdFilter: a NULL id survives dropIn on BOTH paths (the erase-set " +
    "semantics must not flip at the InListMax boundary)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L), Row(null))), schema)
    def ids(q: DataFrame): Set[Option[Long]] =
      q.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    // literal path: null is not in the erase set → kept
    assert(ids(IdFilter.dropIn(df, "id", Seq(1L))) == Set(Some(2L), None))
    // join path: left_anti keeps null-key rows → identical outcome
    assert(ids(IdFilter.dropIn(df, "id", bigIds.filterNot(_ == 2L) :+ 1L)) ==
      Set(Some(2L), None))
    // keepIn drops nulls on both paths (null is never a hit)
    assert(ids(IdFilter.keepIn(df, "id", Seq(1L))) == Set(Some(1L)))
    assert(ids(IdFilter.keepIn(df, "id", bigIds :+ 1L)) == Set(Some(1L)))
  }

  test("IndexErase refuses an unpartitioned multi-dir target (no routing " +
    "key - the first dir would absorb every survivor)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StructType
    val root = new HPath(tmpDir())
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = graft.store.IndexErase.Target(root, new StructType(),
      Seq((InternalRow.empty, new HPath(s"$root/a"), Nil),
        (InternalRow.empty, new HPath(s"$root/b"), Nil)))
    val err = intercept[IllegalArgumentException] {
      graft.store.IndexErase.eraseRows(spark, fs, target, "id", Seq(1L),
        new HPath(s"$root/.staged"), 1L << 20)
    }
    assert(err.getMessage.contains("unpartitioned multi-dir"))
  }

  test("IdFilter: inListColumn refuses sets past the bound") {
    intercept[IllegalArgumentException] {
      IdFilter.inListColumn("id", bigIds)
    }
    // and stays a plain predicate below it
    assert(idsFrame(10).filter(IdFilter.inListColumn("id", smallIds))
      .count() == 3L)
  }

  test("mass purge: 120k-id erase leaves exactly the complement") {
    val root = tmpDir()
    val emb = spark.range(500).select(col("id").as("vec_id"),
      array(
        (lit(1.0f) + col("id").cast("float") / 1000f),
        (col("id") % 3).cast("float"),
        lit(0.02f), lit(0.03f)).as("embedding"))
    Similarity.buildIvfIndex(emb, s"$root/idx", nLists = 4, trainIters = 1)
    val erased = Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds)
    assert(erased == 250L, s"expected the 250 present odd ids, got $erased")
    val survivors = emb.filter(col("vec_id") % 2 === 0)
    val queries = survivors.filter(col("vec_id") < 10)
    val want = Similarity.bruteForceTopK(survivors, queries, k = 5)
    val got = Similarity.queryIvfIndex(spark, s"$root/idx", queries, k = 5,
      nProbes = 4)
    val diff = want.select("query_id", "vec_id", "score")
      .unionAll(got.select("query_id", "vec_id", "score"))
      .groupBy("query_id", "vec_id", "score").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    assert(diff == 0L, "full probe over the purged index must equal " +
      "brute force over the complement")
    // physically purged, verified through the (join-path) audit too
    val (_, scanned, found) = graft.store.EraseAudit.scan(spark,
      s"$root/idx", "vec_id", bigIds, skipDirs = Set("centroids"))
    assert(found == 0L, s"$found erased rows physically present")
    assert(scanned == 250L, s"audit scanned $scanned rows, want 250 survivors")
  }

  test("idempotent re-run: mass purge converges (second pass erases 0)") {
    val root = tmpDir()
    val emb = spark.range(100).select(col("id").as("vec_id"),
      array((lit(1.0f) + col("id").cast("float") / 100f), lit(0.5f),
        lit(0.02f), lit(0.03f)).as("embedding"))
    Similarity.buildIvfIndex(emb, s"$root/idx", nLists = 2, trainIters = 1)
    assert(Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds) == 50L)
    assert(Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds) == 0L)
  }

  private def fsOf(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- BM25 index ingest lifecycle (round-12 ask #2): exactly-once
  // streamed appends (postings + stats delta + zero docs under one
  // ledger marker), reader-atomic selective folds under hammering
  // queries, crash-converging erase stats, zero-token doc handling ----

  import graft.functions.Retrieval
  import spark.implicits._

  private val vocabulary =
    Seq("table", "hash", "merge", "scan", "spill", "sort", "probe", "fold")
  private val queryTerms = Seq("table", "hash", "merge", "scan")

  private def docs(from: Int, until: Int): org.apache.spark.sql.DataFrame =
    (from until until).map { i =>
      val text = (0 until 8)
        .map(j => vocabulary((i + j * (1 + i % 3)) % vocabulary.length))
        .mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")

  private def ranking(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("BM25 exactly-once append: a replayed batch is skipped — " +
    "postings AND stats commit under one marker") {
    val idx = s"${tmpDir()}/idx"
    Retrieval.buildBm25Index(docs(0, 20), idx)
    assert(Retrieval.appendBm25Batch(docs(20, 30), idx, 0L))
    val once = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(once.getLong(0) == 30L, s"n_docs after append: ${once.getLong(0)}")
    // the replay must be skipped entirely (no double postings, no
    // double stats delta)
    assert(!Retrieval.appendBm25Batch(docs(20, 30), idx, 0L))
    val twice = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(twice.getLong(0) == once.getLong(0) &&
      twice.getLong(1) == once.getLong(1), "replay changed the stats")
    assert(ranking(Retrieval.queryBm25Index(spark, idx, queryTerms, k = 50)) ==
      ranking(Retrieval.bm25TopK(docs(0, 30), queryTerms, k = 50)),
      "streamed index must score identically to the direct path")
  }

  test("BM25 fold under hammering readers: every concurrent query is a " +
    "complete batch-boundary snapshot — no quiesce") {
    val idx = s"${tmpDir()}/idx"
    Retrieval.buildBm25Index(docs(0, 20), idx)
    val batches = (0 until 5).map(b => docs(20 + 10 * b, 30 + 10 * b))
    // the rankings a reader may legitimately observe: any committed-
    // batch prefix (each batch's postings + stats land atomically)
    val valid = (0 to 5).map(n =>
      ranking(Retrieval.bm25TopK(docs(0, 20 + 10 * n), queryTerms, k = 100)))
      .toSet
    def observed[A](body: => A): Option[A] =
      try Some(body)
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        // a read straddling the inline vacuum may fail and retry (its
        // planned files were reclaimed) — never return a partial result
        case _: Exception => None
      }
    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    var reads = 0
    val t = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          observed(ranking(
            Retrieval.queryBm25Index(spark, idx, queryTerms, k = 100)))
            .foreach { got =>
              assert(valid(got), s"torn BM25 read: ${got.size} rows matching " +
                "no batch-boundary ranking")
              reads += 1
            }
        } catch { case e: Throwable => failure = Some(e) }
      }
    }, "bm25-hammer")
    t.start()
    try
      batches.zipWithIndex.foreach { case (b, i) =>
        assert(Retrieval.appendBm25Batch(b, idx, i.toLong))
        // fold EVERY batch — the reader hammers straight through each
        Retrieval.compactBm25Index(spark, idx, minFiles = 2)
      }
    finally { stop = true; t.join(60000) }
    failure.foreach(e => fail(s"reader observed a torn state: $e", e))
    assert(reads > 0)
    info(s"BM25 hammering reader made $reads clean observations across 5 folds")
    assert(ranking(Retrieval.queryBm25Index(spark, idx, queryTerms, k = 100)) ==
      ranking(Retrieval.bm25TopK(docs(0, 70), queryTerms, k = 100)))
  }

  test("BM25 erase: crash after the postings publish, before the stats " +
    "correction — a re-run converges (r11 advice #1)") {
    val idx = s"${tmpDir()}/idx"
    Retrieval.buildBm25Index(docs(0, 30), idx)
    val ids = Seq(3L, 7L)
    graft.store.SnapshotFold.dirHook = (phase, dir) =>
      if (phase == "staged" && dir.getName == "stats")
        throw new RuntimeException("crash before the stats correction commits")
    try intercept[RuntimeException] {
      Retrieval.eraseFromBm25Index(spark, idx, ids)
    } finally graft.store.SnapshotFold.dirHook = (_, _) => ()
    // mid-crash: the postings rewrites published, the correction didn't
    val mid = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(mid.getLong(0) == 30L,
      s"fixture: stats must still be pre-erase after the crash (${mid.getLong(0)})")
    assert(Retrieval.readPostings(spark, idx)
      .filter(col("doc_id").isin(ids: _*)).count() == 0L,
      "fixture: the crash must land after the postings publish")
    // the re-run finds no remaining postings hits — the r11-advice
    // failure mode was skipping the correction forever here
    Retrieval.eraseFromBm25Index(spark, idx, ids): Unit
    val fin = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(fin.getLong(0) == 28L, s"stats not corrected: n_docs=${fin.getLong(0)}")
    val survivors = docs(0, 30).filter(!col("doc_id").isin(ids: _*))
    assert(ranking(Retrieval.queryBm25Index(spark, idx, queryTerms, k = 50)) ==
      ranking(Retrieval.bm25TopK(survivors, queryTerms, k = 50)),
      "post-convergence scores must equal a fresh build over the survivors")
  }

  test("BM25 zero-token documents: counted in n_docs, individually erasable") {
    val idx = s"${tmpDir()}/idx"
    val corpus = docs(0, 10)
      .unionAll(Seq((100L, ""), (101L, "!!! ???")).toDF("doc_id", "text"))
    Retrieval.buildBm25Index(corpus, idx)
    val st = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(st.getLong(0) == 12L, s"n_docs must count zero-token docs: ${st.getLong(0)}")
    assert(ranking(Retrieval.queryBm25Index(spark, idx, queryTerms, k = 50)) ==
      ranking(Retrieval.bm25TopK(corpus, queryTerms, k = 50)))
    // a zero-token doc has no postings to witness it — the zero_docs
    // table is what makes it individually erasable
    assert(Retrieval.eraseFromBm25Index(spark, idx, Seq(100L)) == 1L)
    val st2 = Retrieval.readBm25Stats(spark, idx).collect()(0)
    assert(st2.getLong(0) == 11L, s"erased zero-token doc still counted: ${st2.getLong(0)}")
    val survivors = corpus.filter(col("doc_id") =!= 100L)
    assert(ranking(Retrieval.queryBm25Index(spark, idx, queryTerms, k = 50)) ==
      ranking(Retrieval.bm25TopK(survivors, queryTerms, k = 50)))
  }

  test("SnapshotFold.plan sweeps crashed-fold orphans below the minFiles gate") {
    val root = tmpDir()
    val dir = new HPath(s"$root/t")
    val fs = fsOf(root)
    spark.range(3).write.parquet(dir.toString)
    // a fold that crashed pre-commit: version dir, no marker
    val orphan = new HPath(dir, "_v=7")
    fs.mkdirs(orphan)
    spark.range(1).write.mode("overwrite").parquet(s"$orphan/part")
    // minFiles too high to qualify — the orphan must be swept anyway
    val planned = graft.store.SnapshotFold.plan(fs, dir,
      targetFileBytes = 1L << 30, minFiles = 100)
    assert(planned.isEmpty)
    assert(!fs.exists(orphan),
      "plan() must reclaim crashed-fold version dirs even when no fold qualifies")
  }
}
