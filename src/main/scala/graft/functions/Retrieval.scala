package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over the corpus: BM25 top-k (Robertson et al.,
 * Okapi), the standard keyword-relevance baseline a curation stack keeps
 * next to its embedding ANN (functions.Similarity) — targeted corpus
 * inspection ("show me the documents about X"), hybrid-retrieval recall,
 * and query-driven subset export all start here.
 *
 * Scale shape: the exploded (doc, term) stream is filtered to the
 * query's terms BEFORE the first shuffle, so the tf hash-agg moves only
 * matching tuples (a handful per document, not the token stream); df and
 * the corpus stats (N, total length) are one-row/broadcast joins; the
 * final top-k is orderBy+limit → TakeOrderedAndProject (per-partition
 * heaps, never a global sort materialization). The corpus-stats pass
 * re-scans the text column once — a real deployment precomputes doc
 * lengths at ingest; the second scan is the price of statelessness here.
 *
 * Determinism: each per-term contribution is quantized to integer 1e-6
 * BEFORE the per-doc sum, so the sum is long addition — order-independent
 * and reproducible bit-for-bit in any engine that parses the same
 * formula (the ~1e-10 ln() quantization-boundary wobble aside, exactly as
 * documented for Pipeline.topTfidfTerms).
 */
object Retrieval {

  /**
   * Top-k documents for a bag-of-words query under BM25
   * (k1 = 1.2, b = 0.75 are the classic defaults):
   *
   *   idf(t)  = ln((N − df + 0.5) / (df + 0.5) + 1)
   *   s(D, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *   score   = Σ_t floor(s(D, t)·1e6 + 0.5)     (integer micro-points)
   *
   * Ties at the cut are broken by ascending doc id.
   */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
    val tf = toks.filter(col("term").isin(terms.map(lit): _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(TextFunctions.tokens(col(textCol))).cast("long")).as("total_dl"))
    // formula shape mirrored verbatim in the SQL oracle — keep the
    // parenthesization in sync with SparkEntry.oracleSql("text_bm25")
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("contrib_q6", floor(contrib * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id").agg(sum("contrib_q6").as("score_q6"))
      .orderBy(col("score_q6").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id").as(idCol), col("score_q6"))
  }

  /** Shard a term for the persisted index layout (64 dirs, stable). */
  private def termShard(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(64L)).cast("int")

  /**
   * PERSISTED BM25 index — build once, query many times, same contract
   * as the persisted MinHash and IVF indexes: the expensive pass
   * (tokenize + tf over the whole corpus) runs at build and lands as
   * parquet postings partitioned by a 64-way term-hash shard, with
   * corpus stats (N, total length) in a one-row side table. A query
   * reads ONLY its terms' shards — the scan is partition-pruned to
   * ~|terms|/64 of the postings — computes df from the loaded postings,
   * and scores identically to [[bm25TopK]].
   */
  def buildBm25Index(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
    toks.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("shard", termShard(col("term")))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/postings")
    docs.agg(count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(col(textCol))).cast("long")).as("total_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  // ---- resolver read path: the SnapshotFold contract the other two
  // persisted indexes carry, extended here so the postings/stats dirs
  // support reader-atomic ERASURE folds and as-of pins. A plain build
  // is generation zero (raw files, no manifests); only an erase ever
  // publishes versions. ---- //

  private val shardSchema = new org.apache.spark.sql.types.StructType()
    .add("shard", org.apache.spark.sql.types.IntegerType)

  private def shardDirsOf(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path): Seq[(Int, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(live)) Nil
    else fs.listStatus(live).toSeq
      .filter(e => e.isDirectory && e.getPath.getName.startsWith("shard="))
      .flatMap(e => e.getPath.getName.stripPrefix("shard=").toIntOption
        .map(_ -> e.getPath))

  /** Snapshot-resolved scan of the postings tree — `onlyShards` prunes
   *  at resolution time (non-queried shard dirs are never even listed,
   *  preserving the ~|terms|/64 partition pruning the layout exists
   *  for); `asOf` pins the read ([[pinBm25Index]]). */
  private[functions] def readPostings(spark: org.apache.spark.sql.SparkSession,
      path: String, onlyShards: Option[Seq[Int]] = None,
      asOf: Option[Long] = None): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = shardDirsOf(fs, live)
      .filter { case (id, _) => onlyShards.forall(_.contains(id)) }
      .map { case (id, d) =>
        (org.apache.spark.sql.catalyst.InternalRow(id),
          graft.store.SnapshotFold.resolve(fs, d, asOf = asOf))
      }
      .filter(_._2.nonEmpty)
    graft.store.SnapshotFold.dataFrame(spark, shardSchema, parts, Seq(live))
      .getOrElse {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          new StructType().add("doc_id", LongType).add("dl", IntegerType)
            .add("term", StringType).add("tf", LongType)
            .add("shard", IntegerType))
      }
  }

  /** Snapshot-resolved read of the one-row stats table. */
  private[functions] def readBm25Stats(spark: org.apache.spark.sql.SparkSession,
      path: String, asOf: Option[Long] = None): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = graft.store.SnapshotFold.resolve(fs, live, asOf = asOf)
    require(files.nonEmpty, s"no BM25 index stats at $path")
    graft.store.SnapshotFold.dataFrame(spark,
      new org.apache.spark.sql.types.StructType(),
      Seq((org.apache.spark.sql.catalyst.InternalRow.empty, files)),
      Seq(live)).get
  }

  /** SKEW-PROOF as-of pin over a persisted BM25 index — max record
   *  time the index's own storage reports (the
   *  [[graft.store.TierStore.pinNow]] contract); feed to the `asOf`
   *  arm of [[queryBm25Index]]. NOTE: `buildBm25Index(mode overwrite)`
   *  over an existing path REPLACES history rather than versioning it
   *  — rebuild at a fresh path when pins must survive. */
  def pinBm25Index(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // LOUD on a bad path (pinIvfIndex/pinMinhashIndex parity): a typo'd
    // root must fail at capture time, not months later when an asOf
    // read resolves an empty view against pin 0
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/stats")),
      s"no BM25 index at $path")
    val statsPin = graft.store.SnapshotFold.pinDir(fs,
      new org.apache.hadoop.fs.Path(s"$path/stats"))
    shardDirsOf(fs, new org.apache.hadoop.fs.Path(s"$path/postings"))
      .foldLeft(statsPin) { case (m, (_, d)) =>
        math.max(m, graft.store.SnapshotFold.pinDir(fs, d))
      }
  }

  /**
   * Targeted document ERASURE from a persisted BM25 index — of the
   * three persisted indexes this one retains the MOST reconstructable
   * content: `postings/` stores each erased document's full
   * term-frequency bag. Same contract as
   * [[graft.functions.Similarity.eraseFromIvfIndex]]: one
   * resolver-pinned scan finds the live files carrying an erased
   * `doc_id` (they scatter across term-hash shards — cost follows the
   * erased docs' distinct-term footprint, never the corpus), one job
   * rewrites exactly those files minus the erased rows, each touched
   * shard publishes through the [[graft.store.SnapshotFold]] manifest
   * (reader-atomic under live [[queryBm25Index]] calls, EMPTY
   * snapshots where every candidate row was erased), and history is
   * reclaimed UNCONDITIONALLY — pre-erase pins fail loudly. Atomicity
   * granularity is PER DIR (the IVF/MinHash contract): a query racing
   * the pass resolves one complete snapshot of every shard and of the
   * stats row, but mid-pass those snapshots can straddle the erase
   * (e.g. pre-erase stats with some shards already erased) — a
   * transient, bounded score skew; the completed pass is exact.
   *
   * The one-row `stats/` table is corrected in the same pass: the
   * erased documents' (count, Σdl) — read from their own postings
   * before the rewrite — are subtracted and the corrected row
   * publishes as the stats dir's next snapshot, so post-erase scores
   * equal a fresh build over the survivors. (A document that produced
   * ZERO tokens at build time has no postings to find: it stays in
   * `n_docs` — it contributed no erasable content there either.)
   *
   * Returns the number of erased documents found in the index.
   */
  def eraseFromBm25Index(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: Seq[Long],
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(ids.nonEmpty, "empty erase set")
    val live = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(live), s"no BM25 index at $path")
    def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val resolved = shardDirsOf(fs, live).map { case (id, d) =>
      (id, d, graft.store.SnapshotFold.resolve(fs, d))
    }
    val parts = resolved.filter(_._3.nonEmpty).map { case (id, _, f) =>
      (org.apache.spark.sql.catalyst.InternalRow(id), f)
    }
    var erasedDocs = 0L
    var erasedDl = 0L
    val hitPaths: Set[String] =
      graft.store.SnapshotFold.dataFrame(spark, shardSchema, parts, Seq(live)) match {
        case None => Set.empty
        case Some(frame) =>
          // IdFilter: literal IN-list for a bounded batch, broadcast
          // semi join for a mass purge (plan stays O(1))
          val hits = graft.store.IdFilter.keepIn(
              frame.select(col("doc_id"), col("dl"),
                input_file_name().as("_f")), "doc_id", ids)
            .localCheckpoint()
          val docAgg = hits.select(col("doc_id"), col("dl")).distinct()
            .agg(count(lit(1)), coalesce(sum(col("dl").cast("long")), lit(0L)))
            .collect()(0)
          erasedDocs = docAgg.getLong(0)
          erasedDl = docAgg.getLong(1)
          hits.select(col("_f")).distinct().collect()
            .map(r => norm(r.getString(0))).toSet
      }
    if (hitPaths.nonEmpty) {
      val plans = resolved.flatMap { case (id, d, files) =>
        val cands = files.filter(f =>
          hitPaths(norm(fs.makeQualified(f.getPath).toString)))
        graft.store.SnapshotFold.planFiles(fs, d, cands).map(p => (id, d.getName, p))
      }
      val staged = new org.apache.hadoop.fs.Path(s"$path/.erase_postings")
      fs.delete(staged, true)
      val pparts = plans.map { case (id, _, p) =>
        (org.apache.spark.sql.catalyst.InternalRow(id), p.candidates)
      }
      val bytes = plans.flatMap(_._3.candidates).map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      graft.store.IdFilter.dropIn(
          graft.store.SnapshotFold.dataFrame(spark, shardSchema, pparts,
            Seq(live)).get, "doc_id", ids)
        .repartition(nOut, col("shard"))
        .write.partitionBy("shard").parquet(staged.toString)
      plans.foreach { case (_, name, p) =>
        val fresh = new org.apache.hadoop.fs.Path(staged, name)
        if (!fs.exists(fresh)) fs.mkdirs(fresh): Unit
        graft.store.SnapshotFold.publish(fs, p.dir, p.version, fresh,
          p.foldedRels)
      }
      fs.delete(staged, true)
      // correct the stats row: subtract the erased docs' contributions
      // and publish as the stats dir's next snapshot
      val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
      val cur = readBm25Stats(spark, path).collect()(0)
      val statsFiles = graft.store.SnapshotFold.resolve(fs, statsDir)
      graft.store.SnapshotFold.planFiles(fs, statsDir, statsFiles).foreach { p =>
        val freshStats = new org.apache.hadoop.fs.Path(s"$path/.erase_stats")
        fs.delete(freshStats, true)
        import spark.implicits._
        Seq((cur.getLong(0) - erasedDocs, cur.getLong(1) - erasedDl))
          .toDF("n_docs", "total_dl").coalesce(1)
          .write.parquet(freshStats.toString)
        graft.store.SnapshotFold.publish(fs, statsDir, p.version, freshStats,
          p.foldedRels)
      }
    }
    // UNCONDITIONAL vacuum: superseded postings still carry the bags
    resolved.foreach { case (_, d, _) =>
      graft.store.SnapshotFold.vacuumDir(fs, d)
    }
    graft.store.SnapshotFold.vacuumDir(fs,
      new org.apache.hadoop.fs.Path(s"$path/stats"))
    erasedDocs
  }

  /** Query a persisted index: identical scores to the direct path;
   *  `asOf` pins the read to a [[pinBm25Index]] instant. */
  def queryBm25Index(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      asOf: Option[Long] = None): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    // pmod(xxhash64, 64) ≡ hash & 63 for a power-of-two shard count
    val shards = terms.map(t =>
      (org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L) & 63L).toInt)
    val tf = readPostings(spark, path, Some(shards.distinct), asOf)
      .filter(col("term").isin(terms.map(lit): _*))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = readBm25Stats(spark, path, asOf)
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("contrib_q6", floor(contrib * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("doc_id").agg(sum("contrib_q6").as("score_q6"))
      .orderBy(col("score_q6").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_q6"))
  }

  /**
   * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of N
   * ranked candidate lists: score(d) = Σ_lists 1/(kRrf + rank_d(list)),
   * the standard way to combine a lexical (BM25) and a semantic (cosine
   * ANN) ranking without calibrating their incomparable score scales.
   *
   * Each input carries (`byCols`…, doc_id, rank); a document absent from
   * a list simply contributes nothing for it. Contributions are the
   * integer micro-points floor(1e6/(kRrf+rank)) — pure integer
   * arithmetic, so the fused score is order-independent and reproducible
   * bit-for-bit in any engine (same determinism contract as the BM25
   * quantization above).
   *
   * Scale shape: inputs are per-query top-k pools (each ≤ poolK rows per
   * `byCols` group, limit-bounded upstream), so the union + hash-agg +
   * final top-k move only candidate tuples — never the corpus. With
   * `byCols` (e.g. a query_id for batched multi-query fusion) the final
   * cut is a per-group WindowGroupLimit; without, TakeOrderedAndProject.
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
      byCols: Seq[String] = Nil): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    val keyCols = byCols :+ "doc_id"
    val contribs = rankings.map(_.select(keyCols.map(col) :+
      floor(lit(1000000.0) / (lit(kRrf) + col("rank"))).cast("long")
        .as("contrib_q6"): _*))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("contrib_q6").as("rrf_q6"), count(lit(1)).as("n_lists"))
    if (byCols.isEmpty)
      fused.orderBy(col("rrf_q6").desc, col("doc_id")).limit(k)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(byCols.map(col): _*)
        .orderBy(col("rrf_q6").desc, col("doc_id"))
      fused.withColumn("_r", row_number().over(w)).filter(col("_r") <= k)
        .drop("_r")
    }
  }

  /**
   * Hybrid first-stage retrieval for ONE query: BM25 over the text
   * column fused with brute-force cosine over the embedding column via
   * [[rrfFuse]]. `queryVec` is a one-row DataFrame holding the query
   * embedding (its id is excluded from the semantic list, per
   * Similarity.bruteForceTopK). Batched multi-query fusion composes
   * ranked lists tagged with a query id and calls [[rrfFuse]] with
   * `byCols` directly.
   *
   * The global row_number on the lexical side ranks bm25TopK's OUTPUT —
   * a limit(poolK)-bounded frame, never the corpus (PlanAudit accepts
   * global windows over limit-bounded children for exactly this shape).
   */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVec: DataFrame, k: Int = 10,
      poolK: Int = 100, kRrf: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lex = bm25TopK(docs, queryTerms, poolK, idCol = idCol, textCol = textCol)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_q6").desc, col(idCol))))
      .select(col(idCol).as("doc_id"), col("rank"))
    val sem = Similarity.bruteForceTopK(embeddings, queryVec, poolK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("vec_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), k, kRrf)
  }
}
