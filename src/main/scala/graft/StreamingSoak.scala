package graft

import graft.model.{ProcessConfig, Tier}
import graft.store.TierStore
import graft.stream.Aggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sustained streaming soak over the sf1 fixture (round-6 VERDICT ask
 * #4): drives the three stateful streaming paths from a real FILE
 * source in micro-batches (maxFilesPerTrigger=1 over pre-split chunk
 * files), records per-batch throughput and state-store size, and
 * closes each phase with an end-state check:
 *
 *  1. INGEST — `IngestPipeline.runStream` (FIMP decode → filter →
 *     transform → tier-routed append) over chunked raw envelopes;
 *     end state must EQUAL the batch `runBatch` of the same events,
 *     row-multiset-exact (the stateless pipeline's strongest claim).
 *  2. STATEFUL AGG — `Aggregator.streaming` (flatMapGroupsWithState)
 *     over time-ordered chunks; state rows and memory per micro-batch
 *     recorded; end-state check is REPLAY DETERMINISM (fresh
 *     checkpoint, same chunks → byte-identical output), the property
 *     the operator's scaladoc claims over the reference's wall-clock
 *     divergence. (Batch≡streaming value equivalence is pinned at
 *     micro-batch granularity in StoreStreamSpec — emission ticks are
 *     per-batch by design, so cross-granularity equality is not a
 *     defined comparison at arbitrary chunking.) The phase then runs a
 *     third time under the RocksDB state-store provider (the bounded-
 *     memory backend a 100 TB deployment needs) and asserts the output
 *     is row-identical to the default provider's.
 *  3. INDEXED DEDUP — `Pipeline.streamingIndexedDedup` over chunked
 *     documents; end state (survivor set + persisted index) must EQUAL
 *     a hand-driven sequential batch loop over the same chunks in the
 *     same order.
 *
 * Usage: runMain graft.StreamingSoak [sfDir] [workDir] [chunks]
 *          [dedupChunks] [phases]
 * `dedupChunks` sets phase 3's chunking alone (default 10 — ~5k docs
 * per micro-batch at sf1; 2 gives the ~25k-doc production micro-batch
 * the round-8 fixed-cost model priced). `phases` is a comma set
 * (default all; `hop` needs `ingest`'s store). Prints one JSON line
 * per phase plus a `soak_summary` line; full per-batch progress lands
 * in <workDir>/soak_progress.jsonl.
 *
 * RUN UNDER SBT (or with build.sbt's full jdk17AddOpens list): state
 * memory is estimated with Spark's SizeEstimator, which silently
 * degrades to a shallow per-partition constant (~48 B/partition) when
 * the JVM lacks the `--add-opens java.base/java.lang …` set — a bare
 * `java -cp` run reports `max_state_mb` as ~0 against tens of
 * thousands of state rows (the round-6 soak's 0.0 figure). The phase
 * report detects that degenerate estimate (bytes ≤ rows — under one
 * byte per state row is impossible) and flags it as
 * `"state_mb_degenerate":true` instead of publishing a bogus number.
 */
object StreamingSoak {

  import SoakUtil.BatchStat

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp-sf1")
    val work = args.lift(1).getOrElse("tmp-soak")
    val chunks = args.lift(2).map(_.toInt).getOrElse(20)
    val dedupChunks = args.lift(3).map(_.toInt).getOrElse(10)
    val phases = args.lift(4).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("ingest", "agg", "dedup", "hop"))
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    val stats = new java.util.concurrent.ConcurrentLinkedQueue[BatchStat]()
    @volatile var phase = ""
    SoakUtil.addProgressListener(spark, () => phase, stats)
    // Stats are attributed per phase by the started queries' runIds,
    // not by the delivery-time phase label — a finished query's last
    // listener events can be delivered after the driver thread has
    // moved `phase` on (async bus) and would pollute the next phase's
    // batch counts / state maxima (see SoakUtil.addProgressListener).
    val runs = new SoakUtil.RunRegistry

    def writeChunks(df: DataFrame, orderCol: String, dir: String, n: Int): Unit =
      SoakUtil.writeChunks(spark, df, orderCol, dir, n)

    def streamDir(dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
      SoakUtil.streamDir(spark, dir, schema)

    def phaseJson(name: String, wallSec: Double, rows: Long, extra: String): String = {
      val ids = runs.ids(name)
      val ps = stats.toArray(Array.empty[BatchStat]).filter(s => ids(s.runId))
      val batches = ps.length
      val maxState = if (ps.isEmpty) 0L else ps.map(_.stateRows).max
      val maxBytes = if (ps.isEmpty) 0L else ps.map(_.stateBytes).max
      // SizeEstimator without the add-opens set degrades to a shallow
      // ~48 B/partition constant; under a byte per state row cannot be
      // a real estimate, so flag it rather than publish ~0 MB
      val degenerate = maxState > 0 && maxBytes <= maxState
      val mbField =
        if (degenerate) s""""max_state_mb":null,"state_mb_degenerate":true"""
        else f""""max_state_mb":${maxBytes / 1e6}%.1f"""
      f"""{"phase":"$name","rows":$rows,"batches":$batches,"wall_sec":$wallSec%.1f,""" +
        f""""rows_per_sec":${rows / math.max(0.001, wallSec)}%.0f,""" +
        s""""max_state_rows":$maxState,$mbField$extra}"""
    }

    val report = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---------------- phase 1: ingest pipeline ----------------
    if (phases("ingest")) {
      phase = "ingest"
      val raw = SparkEntry.fimp(spark, sfDir)
      writeChunks(raw, "event_id", s"$work/in_events", chunks)
      // interval 0 → as-fast-as-possible triggers (the soak measures
      // pipeline throughput, not trigger idle time); one allow-all
      // filter — an EMPTY chain drops everything by the reference's
      // filter-entry contract (FilterCompiler.compileEntry → false)
      val config = ProcessConfig(id = 1, saveIntervalMs = 0,
        filters = Seq(graft.model.Filter(id = 1)))
      val storeStream = new TierStore(spark, s"$work/store_stream")
      val storeBatch = new TierStore(spark, s"$work/store_batch")
      val t0 = System.nanoTime()
      // KILL + RESTART mid-run: stop the query once roughly half the
      // chunks are through (aborting any in-flight batch before its
      // offset commit), then resume from the same checkpoint. The
      // resumed query replays the uncommitted batch; writeRoutedBatch's
      // ledger gate must make that replay idempotent — the end-state
      // equality below is therefore asserting EXACTLY-ONCE across a
      // real restart, not just a clean single run.
      val q1 = graft.ingest.IngestPipeline.runStream(
        streamDir(s"$work/in_events", raw.schema), config, None,
        storeStream, s"$work/ckpt_ingest")
      runs.add("ingest", q1)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q1.recentProgress.length < chunks / 2 && System.nanoTime() < deadline)
        Thread.sleep(100)
      q1.stop()
      val q = graft.ingest.IngestPipeline.runStream(
        streamDir(s"$work/in_events", raw.schema), config, None,
        storeStream, s"$work/ckpt_ingest")
      runs.add("ingest", q)
      q.processAllAvailable(); q.stop()
      storeStream.vacuumBatchMarkers() // ledger stays O(recent) over the run
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ingest.IngestPipeline.runBatch(raw, config, None, storeBatch)
      // per-tier multiset equality via per-row md5 over all columns
      var sCount = 0L
      Tier.all.foreach { t =>
        val s = storeStream.read(t); val b = storeBatch.read(t)
        val sc = s.count(); val bc = b.count()
        require(sc == bc, s"ingest stream≠batch tier ${t.name}: $sc vs $bc rows")
        sCount += sc
        if (sc > 0) {
          val cols = s.columns.sorted
          def sig(df: DataFrame) = df
            .select(md5(to_json(struct(cols.map(col): _*))).as("h"))
            .groupBy("h").count()
          val diff = sig(s).withColumnRenamed("count", "a")
            .join(sig(b).withColumnRenamed("count", "b"), Seq("h"), "full_outer")
            .filter(coalesce(col("a"), lit(-1)) =!= coalesce(col("b"), lit(-1))).count()
          require(diff == 0, s"ingest stream≠batch tier ${t.name}: $diff signature groups differ")
        }
      }
      require(sCount > 0, "ingest soak wrote no rows — equality would be vacuous")
      report += phaseJson("ingest", wall, sCount,
        s""","restarted_mid_run":true,"equal_to_batch":true""")
    }

    // phase isolation: drop the previous phase's dead state-store
    // providers now instead of at the 60 s maintenance tick (they tax
    // the next phase's micro-batches — BENCH_NOTES "a9 root cause")
    org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()

    // ---------------- phase 2: stateful aggregation ----------------
    if (phases("agg")) {
      phase = "agg"
      import spark.implicits._
      val pts = SparkEntry.soakPoints(spark, sfDir)
      writeChunks(pts.toDF(), "time", s"$work/in_points", chunks)
      def runOnce(tag: String): DataFrame = {
        val src = streamDir(s"$work/in_points", pts.schema).as[Aggregator.StreamIn]
        val out = s"$work/agg_out_$tag"
        val q = Aggregator.streaming(src, samplingMinutes = 10)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$work/ckpt_agg_$tag")
          .format("parquet").option("path", out).start()
        runs.add(phase, q) // main thread set `phase` before calling runOnce
        q.processAllAvailable(); q.stop()
        spark.read.parquet(out)
      }
      val t0 = System.nanoTime()
      val out1 = runOnce("a")
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = out1.count()
      val out2 = runOnce("b") // fresh checkpoint, same chunk sequence
      val d1 = out1.exceptAll(out2).count(); val d2 = out2.exceptAll(out1).count()
      require(d1 == 0 && d2 == 0, s"agg replay diverged: $d1/$d2 rows differ")
      val series = pts.toDF().select("series_id").distinct().count()
      report += phaseJson("agg", wall, rows,
        s""","replay_deterministic":true,"series":$series""")

      // Same phase under the RocksDB state store — the provider a
      // 100 TB deployment runs: HDFSBackedStateStoreProvider keeps every
      // state row on the executor HEAP (fine at 75k series, fatal at
      // hundreds of millions), RocksDB spills to local disk with bounded
      // memory. The provider must be a pure swap: identical output rows,
      // same O(series) state bound. rocksdbjni ships with Spark.
      phase = "agg_rocksdb"
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val t1 = System.nanoTime()
        val out3 = runOnce("rocks")
        val wallR = (System.nanoTime() - t1) / 1e9
        val e1 = out1.exceptAll(out3).count(); val e2 = out3.exceptAll(out1).count()
        require(e1 == 0 && e2 == 0,
          s"rocksdb provider output diverged from hdfs-backed: $e1/$e2 rows differ")
        report += phaseJson("agg_rocksdb", wallR, rows,
          s""","provider":"rocksdb","equal_to_hdfs_provider":true,"series":$series""")
      } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // phase isolation: drop the previous phase's dead state-store
    // providers now instead of at the 60 s maintenance tick (they tax
    // the next phase's micro-batches — BENCH_NOTES "a9 root cause")
    org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()

    // ---------------- phase 3: indexed near-dup dedup ----------------
    if (phases("dedup")) {
      phase = "dedup"
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nChunks = dedupChunks
      writeChunks(docs, "doc_id", s"$work/in_docs", nChunks)
      val t0 = System.nanoTime()
      // compactEvery=4: the stream periodically folds its own index
      // (Dedup.compactMinhashIndex) mid-run — maintenance exercised
      // under the real corpus; measured a net win even at 10 batches
      // (fewer files for every later query) and a no-op for semantics
      val q = graft.functions.Pipeline.streamingIndexedDedup(
        streamDir(s"$work/in_docs", docs.schema),
        s"$work/idx_stream", s"$work/ckpt_dedup",
        clean => clean.write.mode("append").parquet(s"$work/survivors_stream"),
        compactEvery = 4)
      runs.add("dedup", q)
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val streamed = spark.read.parquet(s"$work/survivors_stream")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      // reference: the same per-chunk logic driven by hand over the
      // EXACT chunk files the stream consumed, in the same mtime order.
      // Survivors are MATERIALIZED per chunk (collect) — a lazy union
      // re-evaluates each chunk's anti-join against a later index state
      // and silently changes the sequential semantics (measured: 492 vs
      // the true 476 on the sf0.01 smoke fixture).
      val refSurvivors = scala.collection.mutable.Set.empty[Long]
      (1 to nChunks).foreach { i =>
        val chunk = spark.read.schema(docs.schema)
          .parquet(f"$work/in_docs/chunk_$i%04d_*.parquet")
        val intra = graft.functions.Pipeline.intraBatchNearDedup(chunk)
        refSurvivors ++= graft.functions.Dedup.dedupAgainstIndex(spark, intra,
          s"$work/idx_ref", indexSurvivors = true)
          .select("doc_id").collect().map(_.getLong(0))
      }
      val sSet = streamed.size.toLong
      val missing = refSurvivors.diff(streamed).size // ref has, stream dropped
      val extra = streamed.diff(refSurvivors).size   // stream has, ref dropped
      require(missing == 0 && extra == 0,
        s"dedup stream≠sequential-batch: $missing missing, $extra extra")
      report += phaseJson("dedup", wall, sSet,
        s""","survivors":$sSet,"chunks":$nChunks,""" +
          s""""equal_to_sequential_batch":true""")
    }

    // phase isolation: drop the previous phase's dead state-store
    // providers now instead of at the 60 s maintenance tick (they tax
    // the next phase's micro-batches — BENCH_NOTES "a9 root cause")
    org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()

    // ---------------- phase 4: continuous rollup hop ----------------
    if (phases("hop")) {
      phase = "hop"
      // tails the gen_raw appends phase 1's streaming ingest produced —
      // the CQ-analog path (Downsampler.streamingHop) at sf1. The
      // windows land in a FRESH target store: the ingest ROUTER already
      // placed low-freq points in store_stream's own gen_day, and the
      // end-state check wants the hop's output alone
      val store = new TierStore(spark, s"$work/store_stream")
      val hopOut = new TierStore(spark, s"$work/store_hop")
      val t0 = System.nanoTime()
      val q = graft.rollup.Downsampler.streamingHop(store,
        graft.model.Tier.GenRaw, graft.model.Tier.GenDay,
        s"$work/ckpt_hop", watermark = "30 minutes", target = Some(hopOut))
      runs.add("hop", q)
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val out = hopOut.read(graft.model.Tier.GenDay)
      val rows = out.count()
      // reference: the batch downsample of the same gen_raw, restricted
      // to the windows the final watermark sealed. Streaming and batch
      // sum partials in different orders, so values are compared with a
      // 1e-6 tolerance join, not by hash
      val raw = store.read(graft.model.Tier.GenRaw)
      val maxSec = raw.agg(max(unix_timestamp(col("time")))).head.getLong(0)
      val ref = graft.rollup.Downsampler.downsample(raw.drop("date"), 1)
        .filter(unix_timestamp(col("time")) + 60 <= maxSec - 1800)
      val keys = out.columns.filter(c => c != "value" && c != "date").toSeq
      // join keys include NULLABLE tag columns — a name-list join is
      // null-UNsafe and would mark every null-tagged series as differing;
      // normalize nulls to a sentinel so the key equality is null-safe
      def keyed(df: org.apache.spark.sql.DataFrame, vAlias: String) =
        keys.foldLeft(df)((d, k) =>
            d.withColumn(k, coalesce(col(k).cast("string"), lit("\u0000"))))
          .select((keys.map(col) :+ col("value").as(vAlias)): _*)
      val joined = keyed(out, "v_stream").join(keyed(ref, "v_batch"), keys, "full_outer")
      val bad = joined.filter(col("v_stream").isNull || col("v_batch").isNull ||
        abs(col("v_stream") - col("v_batch")) > 1e-6).count()
      require(rows > 0 && bad == 0,
        s"hop stream≠batch-sealed: $bad of $rows window rows differ")
      report += phaseJson("hop", wall, rows, s""","equal_to_batch_sealed":true""")
    }

    val progress = stats.toArray(Array.empty[BatchStat]).map(s =>
      s"""{"phase":"${runs.phaseOf(s.runId).getOrElse(s.phase)}","batch":${s.batchId},"rows":${s.inputRows},""" +
        s""""ms":${s.procMs},"state_rows":${s.stateRows},"state_bytes":${s.stateBytes}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$work/soak_progress.jsonl"),
      progress.mkString("", "\n", "\n").getBytes("UTF-8"))
    report.foreach(println)
    println(s"""{"soak_summary":[${report.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
