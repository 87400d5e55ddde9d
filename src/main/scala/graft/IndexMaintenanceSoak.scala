package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.functions.Similarity
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

/**
 * ANN MAINTENANCE-UNDER-PROBES soak (round-10 ask #5): the
 * [[graft.functions.Similarity.streamingIvfAppend]] deployment shape —
 * ledgered exactly-once appends with `compactEvery` in-stream folds —
 * run for hundreds of micro-batches at sf1 scale WHILE a concurrent
 * prober hammers the live index. The measured proof for the round-11
 * reader-atomic fold (ask #1) and index as-of pins (ask #2) at soak
 * scale, extending the [[OpsSoak]] pattern to the ANN path.
 *
 * The run now includes the FULL index lifecycle: after wave A of the
 * stream, the appender stops at its safe point and
 * [[Similarity.rebuildIvfIndex]] retrains the index to a DIFFERENT
 * list count (32 → 48) as an atomic generation swap — with the prober
 * still hammering, uncoordinated, throughout. The default (no
 * retainOld) vacuum reclaims the superseded generation immediately, so
 * probes pinned before the swap fail loudly and retry (the documented
 * retention contract), while every completed probe on either side of
 * the marker must be EXACT against brute force over its own pinned
 * corpus. The stream then RESTARTS from the same checkpoint and
 * appends wave B into the new generation (the per-batch generation
 * resolution + stable-root ledger of `appendIvfBatch`), with in-stream
 * folds resuming against the rebuilt lists.
 *
 * Per probe (concurrent with stream, rebuild, and folds — no
 * coordination):
 *  1. take a logical [[Similarity.pinIvfIndex]] pin;
 *  2. full-probe [[Similarity.queryIvfIndex]] AT THE PIN and compare
 *     EXACTLY (query_id, vec_id, score sets) against
 *     [[Similarity.bruteForceTopK]] over the same pinned corpus — full
 *     probe ≡ brute force, so any lost, duplicated, or half-visible
 *     batch/fold/generation state is a hard mismatch;
 *  3. assert the pinned corpus is duplicate-free and sits on a
 *     COMMITTED BATCH BOUNDARY (ledger-gated resolution: a probe never
 *     sees a half-moved append, a mid-publish fold, or a half-built
 *     generation).
 * A probe whose pin is invalidated by the in-stream fold's inline
 * vacuum or the rebuild's generation vacuum retries — counted, not
 * failed.
 *
 * After wave B the lifecycle's LAST maintenance op runs — a
 * right-to-be-forgotten [[Similarity.eraseFromIvfIndex]] over a ~3 %
 * id slice, with the prober still hammering: mid-erase pins resolve a
 * per-list pre/post mixture by design, and every probe stays EXACT
 * because the gate compares the probe against brute force over the
 * probe's OWN pinned corpus; counts stay duplicate-free and inside
 * the [survivors, corpus] envelope.
 *
 * Hard gates (the soak FAILS on any):
 *  1. zero probe mismatches and zero torn observations across the run;
 *  2. at least one in-stream fold committed while probes ran, in EACH
 *     generation (folds resume against the rebuilt lists);
 *  3. the rebuild actually swapped generations (marker present, reads
 *     resolve `_gen_1`) and clean probes completed both before and
 *     after the swap;
 *  4. final index at full probe ≡ brute force over the SURVIVING
 *     corpus (erase removed exactly the requested ids, nothing else);
 *  5. final index row count == survivor count with zero duplicate ids
 *     (wave B appended into the rebuilt generation exactly once);
 *  6. clean probes completed during-or-after the erase, and a raw
 *     file-by-file scan of everything left on disk under the index
 *     root finds ZERO erased rows (the physical purge at soak scale).
 *
 * Usage: runMain graft.IndexMaintenanceSoak [sfDir] [workDir] [batches]
 * Prints one `ann_soak` JSON line for BENCH_SF1.md.
 */
object IndexMaintenanceSoak {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp-sf1")
    val work = args.lift(1).getOrElse("tmp-annsoak")
    val batches = args.lift(2).map(_.toInt).getOrElse(500)
    val compactEvery = 25
    val nLists = 32
    val nListsRebuilt = 48
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t0 = System.nanoTime()
    val fs = new HPath(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new HPath(work), true)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 2 === 0)
    val waveA = emb.filter(col("vec_id") % 4 === 1)
    val waveB = emb.filter(col("vec_id") % 4 === 3)
    val batchesA = batches / 2
    val batchesB = batches - batchesA
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(base, idx, nLists = nLists, trainIters = 1)
    SoakUtil.writeChunks(spark, waveA, "vec_id", s"$work/in", batchesA)

    // committed-batch boundaries a probe may observe: base + each wave-A
    // prefix (extended with the wave-B prefixes once those files exist)
    def chunkCounts() = spark.read.parquet(s"$work/in")
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val baseN = base.count()
    val countsA = chunkCounts()
    @volatile var validCounts = countsA.scanLeft(baseN)(_ + _).toSet
    val corpusN = baseN + waveA.count() + waveB.count()

    // fold commits observed through the publish seam (IVF is the only
    // SnapshotFold user in this process); the generation marker flips
    // genSwapped when the rebuild commits
    val foldCommits = new AtomicInteger(0)
    val foldsPostSwap = new AtomicInteger(0)
    @volatile var genSwapped = false
    graft.store.SnapshotFold.hook = p => if (p == "committed") {
      foldCommits.incrementAndGet(): Unit
      if (genSwapped) foldsPostSwap.incrementAndGet(): Unit
    }

    val eraseIds = emb.filter(col("vec_id") % 31 === 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val queries = emb.filter(col("vec_id") < 3 && col("vec_id") % 31 =!= 2)
      .persist()
    queries.count(): Unit
    val stop = new AtomicBoolean(false)
    val probes = new AtomicInteger(0)
    val probesPostSwap = new AtomicInteger(0)
    val probesPostErase = new AtomicInteger(0)
    val pinRetries = new AtomicInteger(0)
    @volatile var eraseStarted = false
    @volatile var torn: Option[String] = None
    val prober = new Thread(() => {
      while (!stop.get() && torn.isEmpty) {
        try {
          val pin = Similarity.pinIvfIndex(spark, idx)
          val pinned = Similarity.readIvfLists(spark, idx, asOf = Some(pin))
            .select(col("vec_id"), col("cv").as("embedding")).persist()
          try {
            val stats = pinned.agg(count(lit(1)), countDistinct(col("vec_id")))
              .collect()(0)
            val (n, d) = (stats.getLong(0), stats.getLong(1))
            if (n != d) torn = Some(s"pin $pin: $n rows, $d distinct")
            else if (!validCounts(n) &&
              // erase window: per-list commits walk the count from the
              // full corpus down to the survivors — any point inside
              // the envelope is a legitimate complete snapshot
              !(eraseStarted && n >= corpusN - eraseIds.length && n <= corpusN))
              torn = Some(s"pin $pin: $n rows is not a batch boundary")
            else {
              // nProbes covers the larger post-rebuild list count — a
              // full probe in either generation
              val got = Similarity.queryIvfIndex(spark, idx, queries, k = 10,
                nProbes = nListsRebuilt, asOf = Some(pin))
                .select("query_id", "vec_id", "score")
                .as[(Long, Long, Double)].collect().toSet
              val want = Similarity.bruteForceTopK(pinned, queries, k = 10)
                .select("query_id", "vec_id", "score")
                .as[(Long, Long, Double)].collect().toSet
              if (got != want)
                torn = Some(s"pin $pin: probe != brute force " +
                  s"(${(got -- want).size} extra, ${(want -- got).size} missing)")
              else {
                probes.incrementAndGet(): Unit
                if (genSwapped) probesPostSwap.incrementAndGet(): Unit
                if (eraseStarted) probesPostErase.incrementAndGet(): Unit
              }
            }
          } finally pinned.unpersist(): Unit
        } catch {
          // the in-stream fold's inline vacuum, the rebuild's
          // generation vacuum, or the erase's unconditional vacuum
          // reclaimed this pin's history — the documented retention
          // contract: retry. Straddles surface as
          // IllegalStateException (loud pin), SparkException (scan),
          // or AnalysisException (PATH_NOT_FOUND at plan time);
          // torn-state findings are recorded via `torn`, never thrown,
          // so a broad catch cannot mask one.
          case _: Exception => pinRetries.incrementAndGet(): Unit
        }
      }
    }, "ann-prober")

    def appendStream() = Similarity.streamingIvfAppend(
      spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in"),
      idx, s"$work/ckpt", compactEvery = compactEvery)

    prober.start()
    var rebuildWall = 0.0
    var eraseWall = 0.0
    try {
      // ---- wave A: append + in-stream folds under probes ----
      val q1 = appendStream()
      try q1.processAllAvailable()
      finally graft.stream.StreamOps.stopAndUnload(q1)
      val probesPreSwap = probes.get()

      // ---- atomic generation rebuild UNDER LIVE PROBES (appender at
      // its safe point — the stream is stopped; the prober is not) ----
      val tR = System.nanoTime()
      Similarity.rebuildIvfIndex(spark, idx, nLists = nListsRebuilt,
        trainIters = 1)
      rebuildWall = (System.nanoTime() - tR) / 1e9
      genSwapped = true
      val idxFs = new HPath(idx).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      require(idxFs.exists(new HPath(s"$idx/_commit_gen_1")) &&
        Similarity.currentGenRoot(idxFs, idx) == s"$idx/_gen_1",
        "rebuild did not commit generation 1")
      require(probesPreSwap > 0, "no clean probes before the rebuild")

      // ---- wave B: restart from the SAME checkpoint, appends land in
      // the rebuilt generation, folds resume against its lists ----
      SoakUtil.writeChunks(spark, waveB, "vec_id", s"$work/in", batchesB,
        offset = batchesA)
      val sumA = countsA.sum
      validCounts = validCounts ++
        chunkCounts().drop(batchesA).scanLeft(baseN + sumA)(_ + _).toSet
      val q2 = appendStream()
      try q2.processAllAvailable()
      finally graft.stream.StreamOps.stopAndUnload(q2)

      // ---- right-to-be-forgotten UNDER LIVE PROBES (appender at its
      // safe point; the prober is not coordinated) ----
      val tE = System.nanoTime()
      eraseStarted = true
      val erased = Similarity.eraseFromIvfIndex(spark, idx, eraseIds)
      eraseWall = (System.nanoTime() - tE) / 1e9
      require(erased == eraseIds.length.toLong,
        s"erase removed $erased rows, want ${eraseIds.length}")
      // keep probing until at least one clean observation lands during
      // or after the erase (the prober loop is still running)
      val tWait = System.nanoTime()
      while (probesPostErase.get() == 0 && torn.isEmpty &&
        (System.nanoTime() - tWait) < 120e9) Thread.sleep(200)
    } finally {
      stop.set(true)
      prober.join(120000)
      graft.store.SnapshotFold.hook = _ => ()
    }
    torn.foreach(t => sys.error(s"ANN soak: torn probe observation: $t"))
    require(probes.get() > 0, "ANN soak: prober made no clean observations")
    require(probesPostSwap.get() > 0,
      "ANN soak: no clean probe against the rebuilt generation")
    require(foldCommits.get() > foldsPostSwap.get(),
      "ANN soak: no in-stream fold committed before the rebuild")
    require(foldsPostSwap.get() > 0,
      "ANN soak: no in-stream fold committed in the rebuilt generation")

    require(probesPostErase.get() > 0,
      "ANN soak: no clean probe during-or-after the erase")

    // final exactness over the SURVIVING corpus, in the rebuilt generation
    val survivorsN = corpusN - eraseIds.length
    val survivors = emb.filter(!col("vec_id").isin(eraseIds: _*))
    val finalRows = Similarity.readIvfLists(spark, idx)
    val fin = finalRows.agg(count(lit(1)), countDistinct(col("vec_id"))).collect()(0)
    require(fin.getLong(0) == survivorsN && fin.getLong(1) == survivorsN,
      s"final index ${fin.getLong(0)} rows / ${fin.getLong(1)} distinct, want $survivorsN")
    val got = Similarity.queryIvfIndex(spark, idx, queries, k = 10,
      nProbes = nListsRebuilt).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(survivors, queries, k = 10)
      .select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    require(got == want, s"final probe != brute force " +
      s"(${(got -- want).size} extra, ${(want -- got).size} missing)")

    // PHYSICAL purge at soak scale: every parquet file still on disk
    // under the index root, read raw (no resolver), zero erased rows
    val idxRoot = new HPath(idx)
    val rawFs = idxRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: HPath): Seq[String] =
      rawFs.listStatus(p).toSeq.flatMap { e =>
        if (e.isDirectory) {
          if (e.getPath.getName == "centroids") Nil else walk(e.getPath)
        } else if (e.getPath.getName.endsWith(".parquet")) Seq(e.getPath.toString)
        else Nil
      }
    val leaked = spark.read.parquet(walk(idxRoot): _*)
      .filter(col("vec_id").isin(eraseIds: _*)).count()
    require(leaked == 0L, s"$leaked erased rows physically on disk post-erase")

    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"ann_soak","batches":$batches,"corpus":$corpusN,""" +
      f""""probes_exact":${probes.get()},"probes_post_rebuild":${probesPostSwap.get()},""" +
      f""""probes_post_erase":${probesPostErase.get()},""" +
      f""""pin_retries":${pinRetries.get()},"fold_commits":${foldCommits.get()},""" +
      f""""folds_post_rebuild":${foldsPostSwap.get()},"rebuild_sec":$rebuildWall%.1f,""" +
      f""""erased":${eraseIds.length},"erase_sec":$eraseWall%.1f,""" +
      f""""rebuilt_lists":$nListsRebuilt,"gates":"all-green",""" +
      f""""wall_sec":$wall%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
