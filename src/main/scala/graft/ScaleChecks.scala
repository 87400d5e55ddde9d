package graft

import graft.functions.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spark-side cross-validation for the queries whose DuckDB oracles
 * time out at large fixtures (BENCH_SF1.md: `dedup_clusters`,
 * `sim_cosine_pairs`, `sim_semantic_dedup` at sf1). Each check is an
 * independent formulation of a property the oracle would have pinned —
 * verified entirely distributed, so it runs at any scale the engine
 * itself can:
 *
 *  1. connected-component invariants for `Dedup.clusters` over the
 *     exact-Jaccard pair list: both endpoints of every pair carry the
 *     same label; every label is the min id of its component; every
 *     paired id is labeled.
 *  2. LSH-blocked cosine pairs ⊆ brute-force pairs at the same
 *     threshold, with bit-identical scores on the intersection (the
 *     blocked path must never invent or mis-score a pair).
 *  3. `semanticDedup` keep semantics: exactly one kept row per
 *     cluster, and the kept row is the min-id representative.
 *  4. full-probe IVF top-k ≡ brute-force top-k (partitioned index
 *     probing loses nothing when every list is probed).
 *
 * Usage: runMain graft.ScaleChecks <sfDir>   (exits 1 on any FAIL)
 */
object ScaleChecks {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp-sf1")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

    var failed = 0
    def check(name: String)(violations: => Long): Unit = {
      val v = violations
      println(f"$name%-52s ${if (v == 0) "PASS" else s"FAIL ($v violations)"}")
      if (v != 0) failed += 1
    }

    // -- 1. dedup_clusters invariants (same inputs as the query) --
    val docs = table("documents")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxShingleFreq = Int.MaxValue).localCheckpoint()
    val labels = Dedup.clusters(pairs).localCheckpoint()
    val lA = labels.select(col("id").as("id_a"), col("cluster").as("c_a"))
    val lB = labels.select(col("id").as("id_b"), col("cluster").as("c_b"))
    check("clusters: pair endpoints share a label") {
      pairs.join(lA, Seq("id_a")).join(lB, Seq("id_b"))
        .filter(col("c_a") =!= col("c_b")).count()
    }
    check("clusters: label = min id of its component") {
      labels.groupBy(col("cluster")).agg(min(col("id")).as("m"))
        .filter(col("m") =!= col("cluster")).count()
    }
    check("clusters: every paired id is labeled") {
      pairs.select(col("id_a").as("id"))
        .unionAll(pairs.select(col("id_b").as("id"))).distinct()
        .join(labels, Seq("id"), "left_anti").count()
    }

    // -- 2. LSH pairs ⊆ brute force, scores bit-identical --
    val emb = table("embeddings")
    val brute = Similarity.bruteForcePairs(emb, threshold = 0.4)
      .localCheckpoint()
    val lsh = Similarity.cosineNearDupPairs(emb, threshold = 0.4, nPlanes = 6)
    check("lsh pairs: subset of brute force, scores identical") {
      lsh.select(col("id_a"), col("id_b"), col("score"))
        .join(brute.select(col("id_a"), col("id_b"),
          col("score").as("bscore")), Seq("id_a", "id_b"), "left")
        .filter(col("bscore").isNull || col("bscore") =!= col("score"))
        .count()
    }

    // -- 3. semanticDedup keep semantics (PRODUCTION defaults: the
    // finite chain-level hot-bucket cap — these invariants must hold
    // under the capped star-sampled candidate generation too) --
    val sem = Similarity.semanticDedup(emb, threshold = 0.4, nPlanes = 6)
      .localCheckpoint()
    check("semanticDedup: exactly one kept per cluster") {
      sem.groupBy(col("cluster"))
        .agg(sum(col("kept").cast("long")).as("k"))
        .filter(col("k") =!= 1L).count()
    }
    check("semanticDedup: cluster label is the min vec_id of its members") {
      sem.groupBy(col("cluster")).agg(min(col("vec_id")).as("m"))
        .filter(col("m") =!= col("cluster")).count()
    }
    check("semanticDedup: every kept row IS its cluster's labeled id") {
      // direct pin on the kept column (not just the label): the kept
      // flag must sit on the min-id representative row itself
      sem.filter(col("kept")).filter(col("vec_id") =!= col("cluster")).count()
    }

    // -- 4. full-probe IVF ≡ brute force top-k --
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 10)
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nLists = 16, nProbes = 16)
    check("full-probe IVF top-k = brute-force top-k") {
      bf.unionAll(ivf)
        .groupBy(bf.columns.map(col).toSeq: _*).agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2).count()
    }

    // -- 5. index erasure at scale: reader-visible completeness, the
    // PHYSICAL purge, and cost proportionality (untouched files stay
    // byte-stable — the erase touches only files carrying erased ids) --
    val work = graft.Fixtures.newDir("graft_scale_erase")
      .toFile.getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetUnder(root: String, skip: String => Boolean): Seq[String] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
        fs.listStatus(p).toSeq.flatMap { e =>
          if (e.isDirectory) { if (skip(e.getPath.getName)) Nil else walk(e.getPath) }
          else if (e.getPath.getName.endsWith(".parquet")) Seq(e.getPath.toString)
          else Nil
        }
      walk(new org.apache.hadoop.fs.Path(root))
    }
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      s"$work/idx", nLists = 16, trainIters = 1)
    Similarity.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1),
      s"$work/idx", 0L): Unit
    // derive from the ACTUAL ids — scaled fixtures shift ids per replica
    val eraseIds = emb.filter(col("vec_id") % 97 === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // the resolver's pre-erase LIVE view: live clean files must survive
    // byte-stable; only SUPERSEDED clean files may legitimately vanish
    // (the erase's unconditional vacuum reclaims them)
    def uri(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val preLive = Similarity.readIvfLists(spark, s"$work/idx")
      .inputFiles.map(uri).toSet
    val preClean = parquetUnder(s"$work/idx", _ == "centroids").flatMap { f =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
      if (spark.read.parquet(f).filter(col("vec_id").isin(eraseIds: _*))
        .isEmpty) Some((f, preLive(uri(f)), st.getLen, st.getModificationTime))
      else None
    }
    val erased = Similarity.eraseFromIvfIndex(spark, s"$work/idx", eraseIds)
    check("ivf erase: erased exactly the requested ids") {
      math.abs(erased - eraseIds.length)
    }
    check("ivf erase: full probe = brute force over survivors") {
      val survivors = emb.filter(!col("vec_id").isin(eraseIds: _*))
      val q2 = survivors.filter(col("vec_id") < 5)
      val want = Similarity.bruteForceTopK(survivors, q2, k = 10)
      val got = Similarity.queryIvfIndex(spark, s"$work/idx", q2, k = 10,
        nProbes = 16)
      want.select("query_id", "vec_id", "score")
        .unionAll(got.select("query_id", "vec_id", "score"))
        .groupBy("query_id", "vec_id", "score").agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2).count()
    }
    check("ivf erase: PHYSICAL purge — no surviving file carries an id") {
      spark.read.parquet(parquetUnder(s"$work/idx", _ == "centroids"): _*)
        .filter(col("vec_id").isin(eraseIds: _*)).count()
    }
    check("ivf erase: cost proportional — clean files byte-stable") {
      // every pre-erase clean LIVE file must survive untouched — a
      // vanished live clean file means the erase deleted data it never
      // needed to touch (violation), not just a rewrite; a superseded
      // clean file may vanish (vacuum) but must never be REWRITTEN
      preClean.count { case (f, live, len, m) =>
        val p = new org.apache.hadoop.fs.Path(f)
        if (live) !fs.exists(p) || {
          val st = fs.getFileStatus(p)
          st.getLen != len || st.getModificationTime != m
        }
        else fs.exists(p) && {
          val st = fs.getFileStatus(p)
          st.getLen != len || st.getModificationTime != m
        }
      }.toLong
    }

    spark.stop()
    if (failed > 0) { System.err.println(s"$failed check(s) FAILED"); sys.exit(1) }
    println("all checks passed")
  }
}
