package graft

import graft.functions.{Decontaminate, Dedup, Vocab}
import org.apache.spark.sql.functions._

/** Round-5 hardening: bounded BPE training, type-gated cluster fast
 *  path, bloom-decontamination edge cases. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // --- bounded trainBpe (VERDICT r4 "What's wrong" #1) ---

  test("trainBpe: floor-pruned training reproduces the unbounded merges " +
    "when hapax words carry no repeated pairs") {
    // hapax words ("zq", "xv") contribute no pair with freq >= 2, so
    // pruning them at minCount=2 cannot change the learned merges
    val d = (Seq.fill(5)("table scan") ++ Seq("zq", "xv"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val unbounded = Vocab.trainBpe(d, nMerges = 6)
      .orderBy("rank").as[(Long, String, String)].collect().toSeq
    val pruned = Vocab.trainBpe(d, nMerges = 6, minCount = 2L)
      .orderBy("rank").as[(Long, String, String)].collect().toSeq
    assert(unbounded == pruned)
    assert(pruned.nonEmpty)
  }

  test("trainBpe: fails fast with the measured size when the floored " +
    "table exceeds maxWords") {
    val d = Seq((1L, "aa bb cc dd ee ff aa bb cc dd ee ff")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Vocab.trainBpe(d, nMerges = 2, maxWords = 3)
    }
    assert(e.getMessage.contains("maxWords=3"))
    // under the cap it trains fine
    assert(Vocab.trainBpe(d, nMerges = 2, maxWords = 100).count() > 0)
  }

  test("wordFreqs: minCount floors the table without changing surviving counts") {
    val d = Seq((1L, "table table scan zq")).toDF("doc_id", "text")
    val all = Vocab.wordFreqs(d).as[(String, Long)].collect().toMap
    val floored = Vocab.wordFreqs(d, minCount = 2L).as[(String, Long)].collect().toMap
    assert(all == Map("table" -> 2L, "scan" -> 1L, "zq" -> 1L))
    assert(floored == Map("table" -> 2L))
  }

  // --- clusters fast-path type gate (ADVICE r4 #1) ---

  test("clusters: string ids route to the iterative path and keep their type") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, driverMaxEdges = 1000000L)
    assert(out.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val comp = out.as[(String, String)].collect().toMap
    assert(comp("a") == comp("b") && comp("b") == comp("c"))
    assert(comp("x") == comp("y") && comp("x") != comp("a"))
    assert(comp("a") == "a" && comp("x") == "x") // min-label semantics
  }

  test("clusters: integer ids take the fast path and come back as integers") {
    val pairs = Seq((1, 2), (2, 3), (10, 11)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, driverMaxEdges = 1000000L)
    assert(out.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    val comp = out.as[(Int, Int)].collect().toMap
    assert(comp == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("clusters: fast path and iterative path agree on long ids") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (9L, 9L))
      .toDF("id_a", "id_b")
    val fast = Dedup.clusters(pairs, driverMaxEdges = 1000000L)
      .as[(Long, Long)].collect().toMap
    val iter = Dedup.clusters(pairs, driverMaxEdges = 1L)
      .as[(Long, Long)].collect().toMap
    assert(fast == iter)
  }

  // --- selectTop histogram guard (VERDICT r4 "What's wrong" #3) ---

  test("selectTop: wide score range trips the guard into the " +
    "approx-percentile fallback; exact path unchanged") {
    import graft.functions.Importance
    // 200 docs, all-distinct scores — "wide range" relative to a tiny cap
    val weighted = (1 to 200)
      .map(i => (i.toLong, 3L, i.toLong * 17L)).toDF("doc_id", "n_feat", "iw_q4")
    val exact = Importance.selectTop(weighted, 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == (181 to 200).map(_.toLong).toSet) // exact top-20
    val approx = Importance.selectTop(weighted, 0.1, maxHistogramRows = 2L)
      .select("doc_id").as[Long].collect().toSet
    // fallback keeps a clean top slice (every kept score > every dropped
    // score) of approximately k documents
    assert(approx.nonEmpty && approx.size <= 25 && approx.size >= 15,
      s"fallback kept ${approx.size}")
    assert(approx.min > (1 to 200).filterNot(i => approx(i.toLong)).max)
  }

  // --- F9 staleness fixture actually exercises the guard ---

  test("f9 fixture: >120-min gaps exist and the wipe arm removes positive deltas") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("f9_staleness")(spark, sf)
    assert(out.count() > 0)
    // the fixture's per-series gaps: most pairs exceed the 2h cutoff,
    // and among wiped pairs some carry positive deltas — i.e. the guard
    // is load-bearing, not vacuous
    // Branch on the fixture's ts dtype exactly like SparkEntry.events:
    // older fixtures carry TIMESTAMP(NANOS) read as int64 via nanosAsLong,
    // regenerated ones carry a real timestamp[us] column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val tsec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
    }
    val e = raw.withColumn("tsec", tsec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsec")
    val pairs = e.select(col("user_id"), col("tsec"))
      .withColumn("pt", lag(col("tsec"), 1).over(w))
      .filter(col("pt").isNotNull)
      .withColumn("bkt", (col("tsec") / 600).cast("long") * 600)
    val wiped = pairs.filter(col("bkt") - col("pt") > 7200).count()
    val kept = pairs.filter(col("bkt") - col("pt") <= 7200).count()
    assert(wiped > 0 && kept > 0, s"wiped=$wiped kept=$kept")
  }

  // --- atomic partition publish (VERDICT r4 "What's missing" #3) ---

  test("compact: concurrent readers see old-or-new rows, never a " +
    "partly-deleted partition") {
    import graft.model.Tier
    val root = graft.Fixtures.newDir("graft_pub_race")
      .toFile.getAbsolutePath
    val store = new graft.store.TierStore(spark, root)
    val mk = (i: Int) => (s"m_race", java.sql.Timestamp.valueOf(
      f"2024-01-01 ${i % 24}%02d:00:00"), i.toDouble, "d1", "1", "sensor")
    // many small appends → many files per partition (the compaction bait)
    (0 until 6).foreach { k =>
      store.write(Tier.GenDefault,
        (0 until 50).map(i => mk(i + k * 50)).toDF(
          "measurement", "time", "value", "dev_id", "location_id", "dev_type"))
    }
    val expected = store.read(Tier.GenDefault).count()
    assert(expected == 300)
    // delay the bulk phases so readers land inside them; the residual
    // two-metadata-rename window is the documented contract, so a read
    // that straddles it retries once
    store.publishHook = _ => Thread.sleep(150)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val n = try store.read(Tier.GenDefault).count()
        catch { case _: Exception => -1L } // moved-file plan: retry
        if (n >= 0) seen.add(n)
      }
    })
    reader.start()
    try {
      val done = store.compact(Tier.GenDefault, targetFileBytes = 1L << 30, minFiles = 2)
      assert(done == 1)
    } finally { stop.set(true); reader.join(10000); store.publishHook = _ => () }
    val counts = seen.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
    assert(counts.nonEmpty)
    // every successful read saw the complete dataset — compaction
    // preserves rows, so old and new both count `expected`
    assert(counts.forall(_ == expected), s"partial reads: ${counts.distinct}")
    // rows and content survive the swap; staging/trash cleaned up
    assert(store.read(Tier.GenDefault).count() == expected)
    assert(!new java.io.File(s"$root/tier=gen_default/._trash").exists())
    assert(!new java.io.File(s"$root/tier=gen_default/._compacting").exists())
  }

  test("replaceDatePartitions: stages fully before any live partition moves, " +
    "retires window partitions with no replacement") {
    import graft.model.Tier
    val root = graft.Fixtures.newDir("graft_pub_repl")
      .toFile.getAbsolutePath
    val store = new graft.store.TierStore(spark, root)
    def rows(m: String, day: String, v: Double) = Seq(
      (m, java.sql.Timestamp.valueOf(s"2024-01-$day 10:00:00"), v, "d1", "1", "sensor"))
      .toDF("measurement", "time", "value", "dev_id", "location_id", "dev_type")
    store.write(Tier.GenDay, rows("m_a", "01", 1.0))
    store.write(Tier.GenDay, rows("m_a", "02", 2.0))
    store.write(Tier.GenDay, rows("m_b", "02", 3.0))
    // replacement covers dates 02: m_a gets fresh value, m_b vanishes
    store.replaceDatePartitions(Tier.GenDay, rows("m_a", "02", 20.0).drop("date"),
      Seq("2024-01-02"))
    val out = store.read(Tier.GenDay)
      .select("measurement", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("m_a", 1.0), ("m_a", 20.0)))
    assert(!new java.io.File(s"$root/tier=gen_day/._trash").exists())
    assert(!new java.io.File(s"$root/tier=gen_day/._restaging").exists())
  }

  // --- LSH hot-bucket guards (BENCH_SF1 follow-up) ---

  test("minhashLshPairs: over-cap buckets degrade to a linear min-id star, " +
    "so a clone cluster still connects into one component") {
    // 6 identical docs -> one signature -> every band bucket has size 6;
    // a separate identical PAIR has bucket size 2 everywhere
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pair = "one two three four five six seven eight nine ten eleven"
    val d = ((0 until 6).map(i => (i.toLong, clone)) ++
      Seq((100L, pair), (101L, pair)))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(d, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15 + 1) // C(6,2) clone pairs + the pair
    val capped = Dedup.minhashLshPairs(d, threshold = 0.8, maxBucketSize = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // clone buckets (size 6) are over the cap -> the quadratic all-pairs
    // collapses to the 5-edge star around min-id 0 (exactly verified);
    // the size-2 buckets of the pair are untouched
    assert(capped == (1 to 5).map(i => (0L, i.toLong)).toSet + ((100L, 101L)))
    // the star keeps the whole clone cluster in ONE component, so a
    // keep-min dedup pass drops the same 5 documents the exact pass does
    val comps = Dedup.clusters(Dedup.minhashLshPairs(d, threshold = 0.8,
        maxBucketSize = 4))
      .as[(Long, Long)].collect().toMap
    assert((0 to 5).map(i => comps(i.toLong)).toSet == Set(0L))
    // default cap is exact behavior
    val default = Dedup.minhashLshPairs(d, threshold = 0.8,
      maxBucketSize = Int.MaxValue).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(default == uncapped)
  }

  test("simhashPairs: over-cap chunk blocks degrade to a min-id star") {
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pair = "one two three four five six seven eight nine ten eleven"
    val d = ((0 until 6).map(i => (i.toLong, clone)) ++
      Seq((100L, pair), (101L, pair)))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(d, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15 + 1)
    val capped = Dedup.simhashPairs(d, maxDist = 3, maxChunkFreq = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == (1 to 5).map(i => (0L, i.toLong)).toSet + ((100L, 101L)))
  }

  test("cosineNearDupPairs: over-cap signature buckets degrade to a min-id star") {
    import graft.functions.Similarity
    // 6 identical embeddings share one signature bucket (size 6); a
    // separate identical pair (orthogonal direction) has bucket size 2
    val e1 = Array(1.0f, 0.0f, 0.5f, 0.25f)
    val e2 = Array(-0.5f, 1.0f, -0.25f, 0.75f)
    val d = ((0 until 6).map(i => (i.toLong, e1)) ++
      Seq((100L, e2), (101L, e2))).toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDupPairs(d, threshold = 0.99, nPlanes = 6,
      maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15 + 1)
    val capped = Similarity.cosineNearDupPairs(d, threshold = 0.99, nPlanes = 6,
      maxBucketSize = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == (1 to 5).map(i => (0L, i.toLong)).toSet + ((100L, 101L)))
    // the hot bucket shows up in the observability report
    val stats = Similarity.signatureBucketStats(d, nPlanes = 6, minSize = 4)
      .as[(Long, Long, Long)].collect()
    assert(stats.map(s => (s._2, s._3)).toSet == Set((6L, 0L)))
  }

  // --- bloom decontamination edge cases (ADVICE r4 #4) ---

  test("flagContaminatedBloom: empty benchmark yields an empty report, no crash") {
    val corpus = docs.limit(20)
    val bench = docs.filter(lit(false))
    val out = Decontaminate.flagContaminatedBloom(corpus, bench, n = 3)
    assert(out.columns.toSeq == Seq("doc_id", "hits"))
    assert(out.isEmpty)
  }

  // --- durable stage boundaries (VERDICT r4 "What's wrong" #2) ---

  test("prepareTrainingData: durable checkpointDir reproduces the " +
    "localCheckpoint path byte-for-byte and leaves stage artifacts") {
    val d = docs.limit(120)
    val root = graft.Fixtures.newDir("graft_ckpt_spec")
      .toFile.getAbsolutePath
    val local = graft.functions.Pipeline.prepareTrainingData(d, packBudget = 0)
      .orderBy("doc_id").collect().toSeq
    val durable = graft.functions.Pipeline.prepareTrainingData(d, packBudget = 0,
      checkpointDir = Some(root))
      .orderBy("doc_id").collect().toSeq
    assert(local == durable)
    // every stage landed as a durable, re-readable parquet artifact
    for (stage <- Seq("01_scrubbed", "02_clean", "03_lm_banded",
        "04_near_deduped", "05_span_cut")) {
      assert(spark.read.parquet(s"$root/$stage").count() > 0, stage)
    }
  }

  test("clusters: durable checkpointDir on the iterative path matches the fast path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val root = graft.Fixtures.newDir("graft_ckpt_clu")
      .toFile.getAbsolutePath
    val fast = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val durable = Dedup.clusters(pairs, driverMaxEdges = 1L,
      checkpointDir = Some(root)).as[(Long, Long)].collect().toMap
    assert(fast == durable)
    assert(spark.read.parquet(s"$root/edges").count() > 0)
  }

  test("trainCentroids: durable checkpointDir reproduces the executor-block path") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val local = graft.functions.Similarity.trainCentroids(vecs, k = 4, iters = 2)
      .orderBy("list_id").collect().toSeq
    val root = graft.Fixtures.newDir("graft_ckpt_km")
      .toFile.getAbsolutePath
    val durable = graft.functions.Similarity.trainCentroids(vecs, k = 4, iters = 2,
      checkpointDir = Some(root)).orderBy("list_id").collect().toSeq
    assert(local == durable)
  }

  test("flagContaminatedBloom: no forced broadcast by default; opt-in hint works") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0).limit(50)
    val bench = docs.filter($"doc_id" % 10 === 0).limit(10)
    val default = Decontaminate.flagContaminatedBloom(corpus, bench, n = 3)
    val hinted = Decontaminate.flagContaminatedBloom(corpus, bench, n = 3,
      broadcastBenchmark = true)
    assert(default.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      hinted.collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
  }
}
