package graft

import graft.functions.{Dedup, Similarity}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-11 streaming-index maintenance: folds are READER-ATOMIC
 * (manifest-publish — a probe racing a fold sees the complete pre- or
 * post-fold file set, never a mixture, with NO quiesce), and the
 * ledgered indexes carry AS-OF PINS (reproducible ANN/dedup runs across
 * later appends and folds, loud failure past vacuumed history) — the
 * tier store's two remaining contracts, extended to the indexes.
 */
class Round11IndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = graft.Fixtures
    .newDir("graft_r11idx").toFile.getAbsolutePath

  private def fsOf(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Two well-separated 4-D clusters (array<float>, the appended-batch
   *  element type). */
  private def clustered(from: Int, until: Int): DataFrame =
    spark.range(from.toLong, until.toLong).select(col("id").as("vec_id"),
      array(
        when(col("id") % 2 === 0, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        when(col("id") % 2 === 1, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        lit(0.02f), lit(0.03f)).as("embedding"))

  /** Run `read` continuously on a background thread until `body`
   *  finishes; every observation must satisfy `check` (failures are
   *  collected, first one reported). Readers use their own Spark jobs
   *  concurrently with the maintainer's — the real race, not a staged
   *  one. Returns the number of observations made. */
  private def hammer(read: () => Unit)(body: => Unit): Int = {
    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    var reads = 0
    val t = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try { read(); reads += 1 }
        catch { case e: Throwable => failure = Some(e) }
      }
    }, "hammer-reader")
    t.start()
    try body finally { stop = true; t.join(60000) }
    failure.foreach(e => fail(s"hammering reader observed a torn state: $e", e))
    assert(reads > 0, "fixture: the reader must get at least one observation in")
    reads
  }

  test("IVF fold under hammering readers: every concurrent read resolves " +
    "a complete batch-boundary snapshot — no quiesce (r10 ask #1)") {
    val work = tmpDir()
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(clustered(0, 20), idx, nLists = 4, trainIters = 1)
    val batches = (0 until 6).map(b => clustered(100 + 10 * b, 110 + 10 * b))
    // counts a reader may legitimately observe: any committed-batch prefix
    val validCounts = (0 to batches.length).map(20L + 10L * _).toSet
    val probe = clustered(0, 2)
    // the store's hammering contract (StorePublishSpec): a read that
    // straddles the inline vacuum may FAIL AND RETRY (its planned files
    // were reclaimed under it) — it must never return a partial result.
    // Only Spark's scan failure is retried; assertion failures propagate.
    def observed[A](body: => A): Option[A] =
      try Some(body)
      // any scan/broadcast failure = the read straddled the inline
      // vacuum (its planned files were reclaimed): retry, per the
      // store's hammering contract. Assertion failures propagate.
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case _: Exception => None
      }
    val reads = hammer(() => {
      observed(Similarity.readIvfLists(spark, idx)
        .agg(count(lit(1)), countDistinct(col("vec_id")))
        .collect()(0)).foreach { rows =>
        val (n, d) = (rows.getLong(0), rows.getLong(1))
        assert(n == d, s"torn read: $n rows but $d distinct vec_ids (duplicates)")
        assert(validCounts(n), s"torn read: $n rows is not a batch boundary")
      }
      // a probe planned mid-fold must also be internally consistent:
      // k results from ONE snapshot (never short, never duplicated)
      observed(Similarity.queryIvfIndex(spark, idx, probe, k = 3, nProbes = 4)
        .groupBy("query_id").count().collect()).foreach { per =>
        assert(per.forall(_.getLong(1) == 3L), "probe lost candidates mid-fold")
      }
    }) {
      batches.zipWithIndex.foreach { case (b, i) =>
        assert(Similarity.appendIvfBatch(b, idx, i.toLong))
        // fold EVERY batch — the reader hammers straight through each
        Similarity.compactIvfLists(spark, idx, minFiles = 2)
      }
    }
    info(s"IVF hammering reader made $reads clean observations across 6 folds")
    // final exactness: the folded index at full probe ≡ brute force
    val corpus = clustered(0, 20).unionAll(batches.reduce(_ unionAll _))
    val got = Similarity.queryIvfIndex(spark, idx, probe, k = 5, nProbes = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(corpus, probe, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("MinHash fold under hammering readers: concurrent index queries " +
    "never double-count or lose rows (r10 ask #1)") {
    val root = tmpDir()
    def docs(from: Int, until: Int): DataFrame =
      (from until until).map(i =>
        (i.toLong, s"alpha beta gamma delta epsilon zeta token$i run$i"))
        .toDF("doc_id", "text")
    Dedup.buildMinhashIndex(docs(0, 10), root, n = 3, k = 16, bands = 4)
    val validCounts = (0 to 5).map(10L + 5L * _).toSet
    def observed[A](body: => A): Option[A] =
      try Some(body)
      // any scan/broadcast failure = the read straddled the inline
      // vacuum (its planned files were reclaimed): retry, per the
      // store's hammering contract. Assertion failures propagate.
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case _: Exception => None
      } // vacuum straddle: retry
    val reads = hammer(() => {
      observed(Dedup.readIndexTable(spark, root, "shingles")
        .agg(count(lit(1)), countDistinct(col("id"))).collect()(0)).foreach { sh =>
        assert(sh.getLong(0) == sh.getLong(1),
          s"torn read: duplicate shingle rows (${sh.getLong(0)} vs ${sh.getLong(1)})")
        assert(validCounts(sh.getLong(0)),
          s"torn read: ${sh.getLong(0)} shingle rows is not a batch boundary")
      }
      // a live query through both tables stays well-formed
      observed(Dedup.queryMinhashIndex(spark,
        docs(0, 3).withColumn("doc_id", col("doc_id") + 5000), root,
        n = 3, k = 16, bands = 4, threshold = 0.5).count()): Unit
    }) {
      (0 until 5).foreach { b =>
        assert(Dedup.appendShingledToIndexBatch(
          Dedup.shingledDocs(docs(100 + 5 * b, 105 + 5 * b), 3, 16, "doc_id", "text"),
          root, 3, 16, 4, b.toLong))
        Dedup.compactMinhashIndex(spark, root, minFiles = 2)
      }
    }
    info(s"MinHash hammering reader made $reads clean observations across 5 folds")
  }

  test("IVF as-of pin: reproducible across later appends AND a fold; " +
    "vacuumed history fails loudly (r10 ask #2)") {
    val work = tmpDir()
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(clustered(0, 20), idx, nLists = 4, trainIters = 1)
    assert(Similarity.appendIvfBatch(clustered(100, 110), idx, 0L))
    val pin = Similarity.pinIvfIndex(spark, idx)
    val probe = clustered(0, 2)
    val pinnedView = Similarity.queryIvfIndex(spark, idx, probe, k = 5,
      nProbes = 4).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(Similarity.appendIvfBatch(clustered(200, 210), idx, 1L))
    // history-retaining fold: ledger markers + superseded files survive
    val (b, a) = Similarity.compactIvfLists(spark, idx, minFiles = 2,
      retainHistory = true)
    assert(a < b, s"fixture: the fold must fold ($b -> $a)")
    // current read sees all 40; the pin still resolves EXACTLY its 30
    assert(Similarity.readIvfLists(spark, idx).count() == 40L)
    val pinnedIds = Similarity.readIvfLists(spark, idx, asOf = Some(pin))
      .select("vec_id").as[Long].collect().toSet
    assert(pinnedIds == (0L until 20L).toSet ++ (100L until 110L).toSet,
      s"pin resolved ${pinnedIds.size} ids")
    val rePinned = Similarity.queryIvfIndex(spark, idx, probe, k = 5,
      nProbes = 4, asOf = Some(pin)).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(rePinned == pinnedView,
      "pinned probe diverged from the pre-append result")
    // reclaim history → the pin must fail LOUDLY, never resolve partially
    Similarity.vacuumIvfIndex(spark, idx)
    val e = intercept[IllegalStateException] {
      Similarity.readIvfLists(spark, idx, asOf = Some(pin)).count()
    }
    assert(e.getMessage.contains("pin"), e.getMessage)
    // the CURRENT read is untouched by the vacuum
    assert(Similarity.readIvfLists(spark, idx).count() == 40L)
  }

  test("MinHash as-of pin: a pinned dedup query answers against the " +
    "pinned corpus only; vacuum makes older pins loud (r10 ask #2)") {
    val root = tmpDir()
    def doc(i: Int) = (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta token$i")
    Dedup.buildMinhashIndex((0 until 8).map(doc).toDF("doc_id", "text"),
      root, n = 3, k = 16, bands = 4)
    val pin = Dedup.pinMinhashIndex(spark, root)
    assert(Dedup.appendShingledToIndexBatch(
      Dedup.shingledDocs((100 until 108).map(doc).toDF("doc_id", "text"),
        3, 16, "doc_id", "text"), root, 3, 16, 4, 0L))
    Dedup.compactMinhashIndex(spark, root, minFiles = 2, retainHistory = true)
    // probes near-duplicate BOTH halves; the pinned query must only see
    // the pre-pin half of the index
    val probes = Seq((9000L, doc(3)._2), (9001L, doc(103)._2)).toDF("doc_id", "text")
    val now = Dedup.queryMinhashIndex(spark, probes, root, n = 3, k = 16,
      bands = 4, threshold = 0.5).select("id_idx").as[Long].collect().toSet
    assert(now.exists(_ >= 100L), "fixture: current query must hit the appended half")
    val pinned = Dedup.queryMinhashIndex(spark, probes, root, n = 3, k = 16,
      bands = 4, threshold = 0.5, asOf = Some(pin))
      .select("id_idx").as[Long].collect().toSet
    assert(pinned.nonEmpty && pinned.forall(_ < 100L),
      s"pinned query leaked post-pin docs: $pinned")
    Dedup.vacuumMinhashIndex(spark, root)
    intercept[IllegalStateException] {
      Dedup.readIndexTable(spark, root, "shingles", asOf = Some(pin)).count()
    }
    // current queries survive the vacuum
    assert(Dedup.queryMinhashIndex(spark, probes, root, n = 3, k = 16,
      bands = 4, threshold = 0.5).select("id_idx").as[Long].collect().toSet == now)
  }

  test("atomic IVF rebuild: generation swap under hammering readers — " +
    "every read serves one complete generation; crash pre-commit is invisible") {
    val work = tmpDir()
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(clustered(0, 30), idx, nLists = 4, trainIters = 1)
    assert(Similarity.appendIvfBatch(clustered(100, 120), idx, 0L))
    val corpusN = 50L
    def observed[A](body: => A): Option[A] =
      try Some(body)
      // any scan/broadcast failure = the read straddled the inline
      // vacuum (its planned files were reclaimed): retry, per the
      // store's hammering contract. Assertion failures propagate.
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case _: Exception => None
      }
    val probe = clustered(0, 2)
    val reads = hammer(() => {
      // a rebuild changes nLists and every list assignment — but the
      // CORPUS is invariant, so any read not equal to it is a torn
      // cross-generation mixture
      observed(Similarity.readIvfLists(spark, idx)
        .agg(count(lit(1)), countDistinct(col("vec_id"))).collect()(0))
        .foreach { r =>
          assert(r.getLong(0) == corpusN && r.getLong(1) == corpusN,
            s"torn generation read: ${r.getLong(0)} rows, ${r.getLong(1)} distinct")
        }
      observed(Similarity.queryIvfIndex(spark, idx, probe, k = 3, nProbes = 2)
        .groupBy("query_id").count().collect()).foreach { per =>
        assert(per.forall(_.getLong(1) == 3L), "probe lost candidates mid-swap")
      }
    }) {
      // crash BEFORE the commit marker: readers must never notice, and
      // the next attempt reclaims the orphan generation dir
      graft.store.IndexGenerations.hook = p =>
        if (p == "gen_staged") throw new RuntimeException("crash pre-commit")
      intercept[RuntimeException] {
        Similarity.rebuildIvfIndex(spark, idx, nLists = 8, trainIters = 1)
      }
      graft.store.IndexGenerations.hook = _ => ()
      Similarity.rebuildIvfIndex(spark, idx, nLists = 8, trainIters = 1)
      Similarity.rebuildIvfIndex(spark, idx, nLists = 2, trainIters = 1)
    }
    info(s"rebuild hammering reader made $reads clean observations across 2 swaps")
    // the final generation at full probe ≡ brute force over the corpus
    val corpus = clustered(0, 30).unionAll(clustered(100, 120))
    val got = Similarity.queryIvfIndex(spark, idx, probe, k = 5, nProbes = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(corpus, probe, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    // the ledger is SHARED across generations: a crash replay of the
    // pre-rebuild batch must skip, not re-append into the new generation
    assert(!Similarity.appendIvfBatch(clustered(100, 120), idx, 0L),
      "pre-rebuild batch replayed into the new generation")
    assert(Similarity.readIvfLists(spark, idx).count() == corpusN)
    // and a NEW append lands in the current generation (gen 2: the
    // crashed attempt's number was reclaimed, then two commits)
    assert(Similarity.appendIvfBatch(clustered(200, 210), idx, 1L))
    assert(Similarity.readIvfLists(spark, idx).count() == corpusN + 10)
    val fs = fsOf(idx)
    def hasBatchFile(dir: String): Boolean = {
      val p = new HPath(dir)
      fs.exists(p) && fs.listStatus(p).exists(d =>
        d.isDirectory && fs.listStatus(d.getPath)
          .exists(_.getPath.getName.contains("b-ivf-1-")))
    }
    assert(hasBatchFile(s"$idx/_gen_2/lists"),
      "append after rebuild must land in the live generation")
  }

  test("IVF rebuild as-of: a pre-rebuild pin serves the OLD generation " +
    "when retained; vacuum makes it loud (the gen _floor record)") {
    val work = tmpDir()
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(clustered(0, 20), idx, nLists = 4, trainIters = 1)
    assert(Similarity.appendIvfBatch(clustered(100, 110), idx, 0L))
    val pin = Similarity.pinIvfIndex(spark, idx)
    val probe = clustered(0, 2)
    val oldView = Similarity.queryIvfIndex(spark, idx, probe, k = 5,
      nProbes = 4).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    Similarity.rebuildIvfIndex(spark, idx, nLists = 8, trainIters = 1,
      retainOld = true)
    // current read serves generation 1; the pin still serves gen 0 and
    // answers IDENTICALLY to the pre-rebuild probe
    assert(Similarity.readIvfLists(spark, idx).count() == 30L)
    val pinnedView = Similarity.queryIvfIndex(spark, idx, probe, k = 5,
      nProbes = 4, asOf = Some(pin)).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(pinnedView == oldView, "pinned probe diverged across the rebuild")
    // a pin taken NOW admits the new generation
    val pin2 = Similarity.pinIvfIndex(spark, idx)
    assert(Similarity.readIvfLists(spark, idx, asOf = Some(pin2)).count() == 30L)
    // reclaim the old generation: the pre-rebuild pin must fail LOUDLY
    Similarity.vacuumIvfIndex(spark, idx)
    val e = intercept[IllegalStateException] {
      Similarity.readIvfLists(spark, idx, asOf = Some(pin)).count()
    }
    assert(e.getMessage.contains("pin"), e.getMessage)
    // the current read and the post-rebuild pin are untouched
    assert(Similarity.readIvfLists(spark, idx).count() == 30L)
  }

  test("atomic MinHash rebuild: banding migration from stored shingles — " +
    "old-parameter queries refuse after the swap; pins serve the old " +
    "generation when retained") {
    val root = tmpDir()
    def doc(i: Int) = (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta token$i")
    Dedup.buildMinhashIndex((0 until 8).map(doc).toDF("doc_id", "text"),
      root, n = 3, k = 64, bands = 16)
    assert(Dedup.appendShingledToIndexBatch(
      Dedup.shingledDocs((100 until 104).map(doc).toDF("doc_id", "text"),
        3, 64, "doc_id", "text"), root, 3, 64, 16, 0L))
    val probes = Seq((9000L, doc(3)._2)).toDF("doc_id", "text")
    def hits(k: Int, bands: Int, asOf: Option[graft.store.AsOfPin] = None) =
      Dedup.queryMinhashIndex(spark, probes, root, n = 3, k = k,
        bands = bands, threshold = 0.5, asOf = asOf)
        .select("id_idx").as[Long].collect().toSet
    val before = hits(64, 16)
    assert(before.nonEmpty, "fixture: the probe must hit the index")
    val pin = Dedup.pinMinhashIndex(spark, root)
    // migrate banding to (k=32, bands=16): narrower signatures, r=2
    // rows per band — HIGHER banding recall, so exact-verified hits
    // are identical on this fixture
    Dedup.rebuildMinhashIndex(spark, root, n = 3, k = 32, bands = 16,
      retainOld = true)
    assert(hits(32, 16) == before, "hits changed across the banding migration")
    // the old parameters now refuse LOUDLY (generation-scoped meta)
    val e = intercept[IllegalArgumentException] { hits(64, 16) }
    assert(e.getMessage.contains("built with"), e.getMessage)
    // a pre-rebuild pin still validates and answers with the OLD params
    assert(hits(64, 16, asOf = Some(pin)) == before,
      "pinned old-parameter query diverged")
    // a ledgered append lands in the NEW generation and a pre-rebuild
    // batch replay skips (generation-shared ledger)
    assert(!Dedup.appendShingledToIndexBatch(
      Dedup.shingledDocs((100 until 104).map(doc).toDF("doc_id", "text"),
        3, 32, "doc_id", "text"), root, 3, 32, 16, 0L))
    assert(Dedup.appendShingledToIndexBatch(
      Dedup.shingledDocs((200 until 204).map(doc).toDF("doc_id", "text"),
        3, 32, "doc_id", "text"), root, 3, 32, 16, 1L))
    assert(Dedup.readIndexTable(spark, root, "shingles").count() == 16L)
    // changing the shingle size n NEEDS the original documents
    val g = intercept[IllegalArgumentException] {
      Dedup.rebuildMinhashIndex(spark, root, n = 4, k = 32, bands = 16)
    }
    assert(g.getMessage.contains("original documents"), g.getMessage)
    Dedup.rebuildMinhashIndex(spark, root, n = 4, k = 32, bands = 16,
      docs = Some(((0 until 8) ++ (100 until 104) ++ (200 until 204))
        .map(doc).toDF("doc_id", "text")))
    assert(Dedup.readIndexTable(spark, root, "shingles").count() == 16L)
    // n changed → the n=3 query now refuses too
    intercept[IllegalArgumentException] { hits(32, 16) }
    // after the default (reclaiming) rebuild above, the old pin is loud
    intercept[IllegalStateException] {
      Dedup.readIndexTable(spark, root, "shingles", asOf = Some(pin)).count()
    }
  }

  test("resolver read path keeps the scan lean: probed-list file pruning " +
    "at resolution time and parquet column pruning through the pinned index") {
    val work = tmpDir()
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(clustered(0, 40), idx, nLists = 4, trainIters = 2)
    // file pruning happens at RESOLUTION (pruned list dirs are never
    // even listed): the scan's input files all belong to the asked lists
    val fs = fsOf(idx)
    val allLists = fs.listStatus(new HPath(s"$idx/lists"))
      .filter(_.getPath.getName.startsWith("list_id="))
      .map(_.getPath.getName.stripPrefix("list_id=").toLong).sorted
    assert(allLists.length == 4, s"fixture: want 4 lists, got ${allLists.toSeq}")
    val some = allLists.take(2).toSeq
    val pruned = Similarity.readIvfLists(spark, idx, Some(some))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDDs(); f.relation.location.inputFiles
    }.get
    assert(scanned.nonEmpty &&
      scanned.forall(p => some.exists(l => p.contains(s"list_id=$l/"))),
      s"scan leaked non-probed list files: ${scanned.mkString(",")}")
    // column pruning: the quantized probe's approximate phase must read
    // ONLY the int8 columns through the resolver-built relation — the
    // 4×-narrower probe I/O the layout exists for
    val approx = Similarity.readIvfLists(spark, idx)
      .select(col("list_id"), col("vec_id"), col("q8"), col("nq8"))
    assert(approx.collect().length == 40)
    val scanLine = approx.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(scanLine.contains("q8") && !scanLine.contains("cv"), scanLine)
  }

  test("rename-by-copy store: the fold's commit manifest appears with " +
    "complete content or not at all (slowcopy FS)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.slowcopy.impl", classOf[SlowCopyFileSystem].getName)
    val local = tmpDir()
    val dir = new HPath(s"slowcopy://$local/t")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // two raw files, then a fold staged + published on the copy-FS
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write
      .mode("append").parquet(s"$local/t")
    Seq((2L, "b")).toDF("id", "v").coalesce(1).write
      .mode("append").parquet(s"$local/t")
    val plan = graft.store.SnapshotFold.plan(fs, dir, 1L << 20, 2).get
    val staging = new HPath(s"slowcopy://$local/staging")
    spark.read.parquet(s"$local/t").coalesce(1).write.parquet(s"$local/staging")
    // during the publish's copy-renames, a reader must resolve either the
    // complete pre-fold set (2 files) or the complete post-fold one (1)
    @volatile var torn: Option[String] = None
    SlowCopyFileSystem.betweenCopyAndDelete = () => {
      val n = graft.store.SnapshotFold.resolve(fs, dir).length
      if (n != 1 && n != 2) torn = Some(s"resolved $n files mid-publish")
    }
    try graft.store.SnapshotFold.publish(fs, dir, plan.version, staging,
      plan.foldedRels)
    finally SlowCopyFileSystem.betweenCopyAndDelete = () => ()
    assert(torn.isEmpty, torn.toString)
    assert(graft.store.SnapshotFold.resolve(fs, dir).length == 1)
    assert(spark.read.parquet(
      graft.store.SnapshotFold.resolve(fs, dir).map(_.getPath.toString): _*)
      .count() == 2L)
  }
}
