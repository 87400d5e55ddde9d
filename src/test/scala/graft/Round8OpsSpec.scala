package graft

import graft.functions.{Profile, Similarity}
import org.apache.spark.sql.functions._

/** Input row for the streaming-PSI monitor test. */
case class PsiIn(t: java.sql.Timestamp, x: Double)

/**
 * Round-8 additions: PSI distribution drift, hard-negative mining, and
 * the portable-mode k-means trainer. The oracles (`prof_psi_drift`,
 * `sim_hard_negatives`, `sim_kmeans_train`) pin cross-engine exactness
 * on the fixture tables; these specs pin the hand-checkable semantics —
 * known-drift term values, the empty-bucket probability floor,
 * same-label exclusion, tie determinism, and layout invariance.
 */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("psiDrift: known two-bucket drift produces the hand-computed terms") {
    // buckets [0,5) and [5,10): ref mass 2/3 vs 1/3, cur mass 1/4 vs 3/4
    val ref = Seq(1.0, 1.0, 6.0).toDF("x")
    val cur = Seq(1.0, 6.0, 6.0, 6.0).toDF("x")
    val out = Profile.psiDrift(ref, cur, col("x"), lo = 0.0, hi = 10.0,
      nBuckets = 2).orderBy("bucket").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L)) // n_ref
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L)) // n_cur
    // (0.25 − 2/3)·ln(0.25/(2/3)) = 0.40868, (0.75 − 1/3)·ln(2.25) = 0.33789
    assert(out.map(_.getLong(3)).toSeq == Seq(4087L, 3379L))
    val total = Profile.psiTotal(Profile.psiDrift(ref, cur, col("x"),
      0.0, 10.0, 2)).head.getLong(0)
    assert(total == 4087L + 3379L)
  }

  test("psiDrift: a bucket empty on one side contributes the minP-floored " +
    "finite penalty, and buckets empty on both sides are omitted") {
    val ref = Seq(1.0, 1.0).toDF("x") // all mass in bucket 0
    val cur = Seq(6.0, 6.0).toDF("x") // all mass in bucket 1
    val out = Profile.psiDrift(ref, cur, col("x"), lo = 0.0, hi = 10.0,
      nBuckets = 2).orderBy("bucket").collect()
    // only buckets 0 and 1 appear (no -1 / 2 overflow rows, nothing
    // empty-on-both-sides)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // (1e-6 − 1)·ln(1e-6) ≈ 13.81550 nats on each side, symmetric
    assert(out.map(_.getLong(3)).toSeq == Seq(138155L, 138155L))
  }

  test("hardNegatives: same-label candidates are excluded, ties rank by " +
    "ascending id, k cuts the tail") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), "a"), // anchor
      (1L, Array(1.0f, 0.0f), "a"), // identical but same label — excluded
      (2L, Array(1.0f, 0.0f), "b"), // cos 1.0
      (3L, Array(0.9f, 0.1f), "b"), // cos ≈ 0.9939
      (4L, Array(1.0f, 0.0f), "c"), // cos 1.0 — tie with 2, larger id
      (5L, Array(0.0f, 1.0f), "b")  // cos 0 — beyond k=3
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 4L, 3L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(out.forall(_.getAs[String]("neg_label") != "a"))
    assert(out.take(2).forall(_.getAs[Double]("score") == 1.0))
    assert(out.forall(_.getAs[Long]("query_id") == 0L))
  }

  test("portable-mode trainCentroids is layout-invariant like the default mode") {
    val df = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    def rows(part: Int) = Similarity.trainCentroids(df.repartition(part),
        k = 4, iters = 2, portable = true)
      .select(col("list_id"), posexplode(col("centroid")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(rows(3) == rows(11))
  }

  // --- frequentItems: Misra-Gries pruning + exact recount ---

  private def naiveFrequent(df: org.apache.spark.sql.DataFrame,
      ppm: Long): Set[(String, Long)] = {
    val keyed = df.select(col("k").cast("string").as("key"))
      .filter(col("key").isNotNull)
    val total = keyed.count()
    keyed.groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") > total * ppm / 1000000L)
      .as[(String, Long)].collect().toSet
  }

  test("frequentItems: equals the naive GROUP BY/HAVING on an adversarial " +
    "distribution that forces sketch decrements") {
    // capacity m = ceil(1e6/50000) = 20, but 401 distinct keys: 400
    // singletons ("noise_*") hammer the decrement path; "hot" (30% of
    // rows) must survive per-partition pruning anyway
    val rows = (1 to 400).map(i => s"noise_$i") ++ Seq.fill(171)("hot")
    val df = new scala.util.Random(42).shuffle(rows).toDF("k").repartition(7)
    val got = Profile.frequentItems(df, col("k"), 50000L)
      .as[(String, Long)].collect().toSet
    assert(got == naiveFrequent(df, 50000L))
    assert(got == Set(("hot", 171L))) // exact count, not an MG estimate
  }

  test("frequentItems: result is independent of partition layout") {
    val rows = (1 to 200).flatMap(i => Seq.fill(i % 13 + 1)(s"k_${i % 37}"))
    val df = rows.toDF("k")
    val a = Profile.frequentItems(df.repartition(1), col("k"), 30000L)
      .as[(String, Long)].collect().toSet
    val b = Profile.frequentItems(df.repartition(17), col("k"), 30000L)
      .as[(String, Long)].collect().toSet
    assert(a == b && a == naiveFrequent(df, 30000L) && a.nonEmpty)
  }

  test("frequentItems: nulls ignored; empty input and no-qualifier " +
    "thresholds yield empty results") {
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    // threshold: total=3 (nulls out), 400000 ppm → n > 1: only "a"
    assert(Profile.frequentItems(df, col("k"), 400000L)
      .as[(String, Long)].collect().toSet == Set(("a", 2L)))
    assert(Profile.frequentItems(Seq.empty[String].toDF("k"), col("k"), 1000L)
      .count() == 0L)
  }

  test("streaming PSI monitor: sealed windows score exactly what the " +
    "batch psiDrift computes on the same rows; an in-distribution " +
    "window scores zero") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(1.0, 1.0, 6.0, 6.0).toDF("x")
    val refHist = Profile.histogram(ref, col("x"), 0.0, 10.0, 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[PsiIn]
    val q = Profile.streamingHistogram(input.toDF(), "t", col("x"),
      lo = 0.0, hi = 10.0, nBuckets = 2,
      windowDur = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("psi_mon")
      .outputMode("append").start()
    try {
      val base = 1704067200000L // window A: ref-identical distribution
      def in(offsetMs: Long, v: Double) = PsiIn(new java.sql.Timestamp(base + offsetMs), v)
      input.addData(in(0, 1.0), in(1000, 1.0), in(2000, 6.0), in(3000, 6.0))
      // window B (hour 1): drifted distribution
      input.addData(in(3600000, 1.0), in(3610000, 6.0), in(3620000, 6.0),
        in(3630000, 6.0))
      q.processAllAvailable()
      // advance the watermark far past both windows to seal them
      input.addData(in(5 * 3600000L, 5.0))
      q.processAllAvailable()

      val got = Profile.finalizePsi(spark.table("psi_mon"), refHist)
        .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getLong(1)))
        .toMap
      val winA = Seq(1.0, 1.0, 6.0, 6.0).toDF("x")
      val winB = Seq(1.0, 6.0, 6.0, 6.0).toDF("x")
      def batchPsi(w: org.apache.spark.sql.DataFrame): Long =
        Profile.psiTotal(Profile.psiDrift(ref, w, col("x"), 0.0, 10.0, 2))
          .head.getLong(0)
      assert(got(base) == batchPsi(winA))
      assert(got(base) == 0L) // in-distribution window
      assert(got(base + 3600000L) == batchPsi(winB))
      assert(got(base + 3600000L) > 0L)
    } finally q.stop()
  }

  test("streaming hot-key monitor: each sealed window's top-k equals " +
    "batch topKeys over the same rows, with the same tie-break") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[PsiIn]
    // reuse PsiIn: x encodes the key
    val q = Profile.streamingKeyCounts(
      input.toDF().select(col("t"), concat(lit("k"), col("x").cast("int")).as("k")),
      "t", col("k"), windowDur = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("hot_keys")
      .outputMode("append").start()
    try {
      val base = 1704067200000L
      def in(off: Long, v: Double) = PsiIn(new java.sql.Timestamp(base + off), v)
      // window A: k1×3, k2×3, k3×1 (tie between k1/k2)
      input.addData(in(0, 1), in(1000, 1), in(2000, 1),
        in(3000, 2), in(4000, 2), in(5000, 2), in(6000, 3))
      // window B: k9×2, k1×1
      input.addData(in(3600000, 9), in(3610000, 9), in(3620000, 1))
      q.processAllAvailable()
      input.addData(in(5 * 3600000L, 5)) // advance the watermark
      q.processAllAvailable()

      val got = Profile.finalizeTopKeys(spark.table("hot_keys"), 2)
        .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
          r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == Set(
        (base, 1, "k1", 3L), (base, 2, "k2", 3L), // tie: key asc
        (base + 3600000L, 1, "k9", 2L), (base + 3600000L, 2, "k1", 1L)))
      // agrees with the batch operator over the same window's rows
      val batch = Profile.topKeys(
        Seq("k1", "k1", "k1", "k2", "k2", "k2", "k3").toDF("k"), col("k"), 2)
        .as[(String, Long)].collect().toSeq
      assert(batch == Seq(("k1", 3L), ("k2", 3L)))
    } finally q.stop()
  }

  // --- leakage-safe splits ---

  test("clusterSafeSplit: every cluster lands whole in one split, " +
    "splitLeakage reads zero off-diagonal, while the naive hashSplit " +
    "leaks on the same pairs") {
    import graft.functions.{Dedup, Sampling}
    // 300 docs, every 3rd has a clone at id+1000 → 100 two-doc clusters
    val docs = (0L until 300L).map(i => (i, s"text-$i")) ++
      (0L until 300L by 3).map(i => (i + 1000L, s"text-$i"))
    val df = docs.toDF("doc_id", "text")
    val pairs = (0L until 300L by 3).map(i => (i, i + 1000L))
      .toDF("id_a", "id_b")
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val naive = Sampling.hashSplit(df, "doc_id", fracs)
    val naiveLeak = Sampling.splitLeakage(pairs, naive, "doc_id")
      .filter(col("split_a") =!= col("split_b"))
      .agg(sum("n_pairs")).as[Long].head
    assert(naiveLeak > 0L, "fixture must make the naive split leak")

    val labels = Dedup.clusters(pairs)
    val safe = Sampling.clusterSafeSplit(df, "doc_id", labels, fracs)
    // acceptance: no pair straddles a split boundary
    assert(Sampling.splitLeakage(pairs, safe, "doc_id")
      .filter(col("split_a") =!= col("split_b")).count() == 0L)
    // clones carry their ORIGINAL's split (cluster label = min id)
    val byId = safe.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    (0L until 300L by 3).foreach(i => assert(byId(i) == byId(i + 1000L)))
    // singletons keep their plain hashSplit fate (backward compatible)
    val naiveById = naive.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    (1L until 300L by 3).foreach(i => assert(byId(i) == naiveById(i)))
    // all three splits are populated at these sizes
    assert(safe.select("split").distinct().count() == 3L)
  }

  test("splitLeakage: split pairs are unordered and counts are per pair") {
    import graft.functions.Sampling
    val assignment = Seq((1L, "train"), (2L, "test"), (3L, "test"),
      (4L, "train")).toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (3L, 1L), (2L, 3L), (1L, 4L))
      .toDF("id_a", "id_b")
    val got = Sampling.splitLeakage(pairs, assignment, "doc_id")
      .as[(String, String, Long)].collect().toSet
    // (1,2) and (3,1) both count as (test, train) regardless of direction
    assert(got == Set(("test", "train", 2L), ("test", "test", 1L),
      ("train", "train", 1L)))
  }

  test("topKeys: deterministic (n desc, key asc) tie-break and no global " +
    "sort in the plan") {
    val df = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(5)("z") ++
      Seq.fill(1)("q")).toDF("k")
    val top = Profile.topKeys(df, col("k"), 3)
    assert(top.as[(String, Long)].collect().toSeq ==
      Seq(("z", 5L), ("a", 3L), ("b", 3L)))
    // TakeOrderedAndProject, not Sort+Exchange: each task keeps its own
    // top k — the plan must carry no global Sort node (string match: AQE
    // wraps the tree, so a typed collect() can't see inside it)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortExec"), plan)
  }
}
