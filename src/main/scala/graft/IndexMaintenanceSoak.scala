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
 * Per probe (concurrent with the stream, no coordination):
 *  1. take a skew-proof [[Similarity.pinIvfIndex]] pin;
 *  2. full-probe [[Similarity.queryIvfIndex]] AT THE PIN and compare
 *     EXACTLY (query_id, vec_id, score sets) against
 *     [[Similarity.bruteForceTopK]] over the same pinned corpus — full
 *     probe ≡ brute force, so any lost, duplicated, or half-visible
 *     batch/fold state is a hard mismatch;
 *  3. assert the pinned corpus is duplicate-free and sits on a
 *     COMMITTED BATCH BOUNDARY (ledger-gated resolution: a probe never
 *     sees a half-moved append or a mid-publish fold).
 * A probe whose pin is invalidated by the in-stream fold's inline
 * vacuum (compactEvery runs with the default reclaim) retries — the
 * documented retention contract — and is counted, not failed.
 *
 * Hard gates (the soak FAILS on any):
 *  1. zero probe mismatches and zero torn observations across the run;
 *  2. at least one in-stream fold actually committed while probes ran;
 *  3. final index at full probe ≡ brute force over the FULL corpus;
 *  4. final index row count == corpus count with zero duplicate ids.
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
    val incoming = emb.filter(col("vec_id") % 2 === 1)
    val idx = s"$work/idx"
    Similarity.buildIvfIndex(base, idx, nLists = nLists, trainIters = 1)
    SoakUtil.writeChunks(spark, incoming, "vec_id", s"$work/in", batches)

    // committed-batch boundaries a probe may observe: base + each prefix
    val chunkCounts = spark.read.parquet(s"$work/in")
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val baseN = base.count()
    val validCounts = chunkCounts.scanLeft(baseN)(_ + _).toSet
    val corpusN = baseN + chunkCounts.sum

    // fold commits observed through the publish seam (IVF is the only
    // SnapshotFold user in this process)
    val foldCommits = new AtomicInteger(0)
    graft.store.SnapshotFold.hook =
      p => if (p == "committed") foldCommits.incrementAndGet(): Unit

    val queries = emb.filter(col("vec_id") < 3).persist()
    queries.count(): Unit
    val stop = new AtomicBoolean(false)
    val probes = new AtomicInteger(0)
    val pinRetries = new AtomicInteger(0)
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
            else if (!validCounts(n))
              torn = Some(s"pin $pin: $n rows is not a batch boundary")
            else {
              val got = Similarity.queryIvfIndex(spark, idx, queries, k = 10,
                nProbes = nLists, asOf = Some(pin))
                .select("query_id", "vec_id", "score")
                .as[(Long, Long, Double)].collect().toSet
              val want = Similarity.bruteForceTopK(pinned, queries, k = 10)
                .select("query_id", "vec_id", "score")
                .as[(Long, Long, Double)].collect().toSet
              if (got != want)
                torn = Some(s"pin $pin: probe != brute force " +
                  s"(${(got -- want).size} extra, ${(want -- got).size} missing)")
              else probes.incrementAndGet(): Unit
            }
          } finally pinned.unpersist(): Unit
        } catch {
          // the in-stream fold vacuumed this pin's history (default
          // reclaim) — the documented retention contract: retry
          case _: IllegalStateException => pinRetries.incrementAndGet(): Unit
          case _: org.apache.spark.SparkException =>
            pinRetries.incrementAndGet(): Unit
        }
      }
    }, "ann-prober")

    val q = Similarity.streamingIvfAppend(
      spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$work/in"),
      idx, s"$work/ckpt", compactEvery = compactEvery)
    prober.start()
    try {
      q.processAllAvailable()
    } finally {
      graft.stream.StreamOps.stopAndUnload(q)
      stop.set(true)
      prober.join(120000)
      graft.store.SnapshotFold.hook = _ => ()
    }
    torn.foreach(t => sys.error(s"ANN soak: torn probe observation: $t"))
    require(probes.get() > 0, "ANN soak: prober made no clean observations")
    require(foldCommits.get() > 0, "ANN soak: no in-stream fold committed")

    // final exactness over the full corpus
    val finalRows = Similarity.readIvfLists(spark, idx)
    val fin = finalRows.agg(count(lit(1)), countDistinct(col("vec_id"))).collect()(0)
    require(fin.getLong(0) == corpusN && fin.getLong(1) == corpusN,
      s"final index ${fin.getLong(0)} rows / ${fin.getLong(1)} distinct, want $corpusN")
    val got = Similarity.queryIvfIndex(spark, idx, queries, k = 10,
      nProbes = nLists).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    require(got == want, s"final probe != brute force " +
      s"(${(got -- want).size} extra, ${(want -- got).size} missing)")

    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"ann_soak","batches":$batches,"corpus":$corpusN,""" +
      f""""probes_exact":${probes.get()},"pin_retries":${pinRetries.get()},""" +
      f""""fold_commits":${foldCommits.get()},"gates":"all-green",""" +
      f""""wall_sec":$wall%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
