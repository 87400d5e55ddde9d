package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / quota operators for training-data curation.
 *
 * Everything here keys off a PORTABLE hash-derived uniform instead of
 * `rand()`:
 *  - reproducible across runs, engines (the DuckDB oracle replicates it
 *    bit-for-bit from md5) and cluster sizes;
 *  - safe under task retries and speculative execution — `rand()` draws
 *    a DIFFERENT value when a task re-runs, which silently changes the
 *    sample (and breaks exactly-once semantics of downstream joins);
 *  - stable as the corpus grows: a document's keep/drop fate depends
 *    only on its key, so incremental pipeline runs don't resample the
 *    old data.
 */
object Sampling {

  /** Key → uniform in [0, 1): the first 32 bits of md5(key as string),
   *  scaled. Portable: any engine with md5 reproduces it exactly. */
  def portableUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") / 4294967296.0

  /** Deterministic Bernoulli sample: keep rows whose key-derived uniform
   *  falls below `p`. A pure filter — pushes into the scan, no shuffle. */
  def sampleByHash(df: DataFrame, keyCol: String, p: Double): DataFrame =
    df.filter(portableUniform(col(keyCol)) < p)

  /**
   * Deterministic train/val/test split: carve [0, 1) into cumulative
   * hash ranges and label every row by where its key-uniform lands. A
   * document's split NEVER changes as the corpus grows or the job is
   * re-run/partitioned differently — the property that prevents
   * train/test contamination across pipeline versions.
   */
  def hashSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), fractions))

  /** The cumulative-range split label for an arbitrary key expression —
   *  shared by [[hashSplit]] and [[clusterSafeSplit]]. */
  private def splitLabel(key: Column,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = portableUniform(key)
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.zip(bounds).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), hi), acc) =>
        when(u < hi, name).otherwise(acc)
      }
  }

  /**
   * Leakage-safe split: near-duplicate documents must land in the SAME
   * split, or evaluation sees paraphrases of training rows — the
   * within-corpus contamination that [[hashSplit]] alone cannot prevent
   * (a doc-level split strands ~2·f·(1−f) of every duplicate cluster's
   * pairs across the train/eval boundary). Every row is labeled by its
   * CLUSTER's hash rather than its own: `labels` is an (id, cluster)
   * assignment — [[Dedup.clusters]] over verified near-dup pairs — and
   * rows absent from it (singletons) key by their own id, which agrees
   * with the cluster convention (a cluster's label IS its minimum
   * member id). Whole clusters move together, so per-split fractions
   * still hold in expectation over clusters.
   *
   * Scale shape: the labels table is the post-blocking duplicate
   * population — corpus-small by construction — so the join broadcasts
   * and the corpus itself never shuffles.
   */
  def clusterSafeSplit(df: DataFrame, keyCol: String, labels: DataFrame,
      fractions: Seq[(String, Double)], labelId: String = "id",
      labelCluster: String = "cluster"): DataFrame = {
    val lab = labels.select(col(labelId).as(keyCol),
      col(labelCluster).cast("string").as("_csplit_cluster"))
    df.join(broadcast(lab), Seq(keyCol), "left")
      .withColumn("split", splitLabel(
        coalesce(col("_csplit_cluster"), col(keyCol).cast("string")),
        fractions))
      .drop("_csplit_cluster")
  }

  /**
   * Split-leakage audit: given the verified near-dup pair list and a
   * split assignment, count pairs by the (unordered) split pair of
   * their endpoints. Off-diagonal rows — `split_a != split_b` — are
   * leakage: a train/test boundary running through a duplicate cluster.
   * Zero off-diagonal rows is the acceptance check for
   * [[clusterSafeSplit]]; a nonzero count quantifies how contaminated a
   * naive split is.
   *
   * Scale shape: the assignment table is corpus-sized, so it is first
   * cut to the pair endpoints (broadcast semi-join on the pair ids —
   * pairs are blocking survivors, corpus-small) and the pair list then
   * broadcast-joins the cut twice. The corpus never shuffles.
   */
  def splitLeakage(pairs: DataFrame, assignment: DataFrame, keyCol: String,
      splitCol: String = "split", idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val ids = pairs.select(col(idA).as(keyCol))
      .union(pairs.select(col(idB).as(keyCol))).distinct()
    val cut = assignment.select(col(keyCol), col(splitCol))
      .join(broadcast(ids), Seq(keyCol), "left_semi")
    val a = cut.select(col(keyCol).as(idA), col(splitCol).as("_sa"))
    val b = cut.select(col(keyCol).as(idB), col(splitCol).as("_sb"))
    pairs.select(col(idA), col(idB))
      .join(broadcast(a), Seq(idA)).join(broadcast(b), Seq(idB))
      .groupBy(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /**
   * Per-group mixture sampling — the domain-mixing step of corpus
   * curation (keep web at 30 %, books at 100 %, ...): each group's rows
   * survive at its configured rate, keyed by the same portable uniform,
   * so mixtures are reproducible and monotone (raising a rate only ADDS
   * documents, never swaps them). Unlisted groups use `defaultRate`.
   */
  def mixtureByGroup(df: DataFrame, groupCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (g, r)) =>
      when(col(groupCol) === g, r).otherwise(acc)
    }
    df.filter(portableUniform(col(keyCol)) < rate)
  }

  /**
   * Token-budget mixture — the "data recipe" step stated the way recipe
   * papers state it (so-many tokens of web, so-many of code, ...):
   * derive each group's keep RATE from its actual token count
   * (`min(1, budget/actual)`), then apply the same hash-gated filter as
   * [[mixtureByGroup]]. Expected kept tokens ≈ the budget; the kept SET
   * is deterministic, stable as the corpus grows, and monotone in the
   * budget. Unlisted groups keep everything.
   *
   * Scale shape: one aggregate for the per-group token totals (a
   * groups-sized frame joined back — AQE broadcasts it when it fits)
   * plus the pushdown-friendly hash filter; rates land in the output as
   * `keep_rate` for the run report.
   */
  def mixtureToTokenBudget(df: DataFrame, groupCol: String, keyCol: String,
      tokens: Column, budgets: Map[String, Long]): DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(tokens.cast("long")).as("_total"))
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (g, b)) =>
      when(col(groupCol) === g, b).otherwise(acc)
    }
    df.join(totals, Seq(groupCol))
      .withColumn("keep_rate",
        when(budget.isNull || budget >= col("_total"), 1.0)
          .otherwise(budget.cast("double") / col("_total")))
      .filter(portableUniform(col(keyCol)) < col("keep_rate"))
      .drop("_total")
  }

  /**
   * Per-group quota (e.g. ≤ `n` documents per source/domain), selection
   * deterministic by hashed key: the kept rows are the `n` smallest
   * (uniform, key) per group.
   *
   * Scale shape: the naive formulation is a row_number window over the
   * full group — one task sorts the whole group, which dies on a
   * billion-row domain. Instead a two-phase plan: per-group counts set a
   * hash threshold that pre-filters each group down to ~`safety`·n
   * expected survivors, and the exact rank runs over the pre-filtered
   * slice only. The counts join carries one row per distinct group, so no
   * broadcast is forced — AQE (on by default in GraftSession) broadcasts
   * it when it fits and falls back to a shuffle join when the group
   * column is high-cardinality, instead of failing at the driver
   * broadcast limit. Groups where the pre-filter (with
   * probability ≲ e^−n·(1−1/safety)²/2) kept fewer than n rows fall back
   * to the exact window over just those groups, so the result is always
   * exactly the deterministic top-n — the fallback is a correctness
   * net, not a different answer.
   */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int,
      safety: Double = 3.0): DataFrame = {
    val u = portableUniform(col(keyCol))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_cnt"))
    val pre = df.join(counts, Seq(groupCol))
      .filter(u < least(lit(1.0), lit(safety * n) / col("_cnt")))
      .drop("_cnt")
    // groups whose pre-filter kept fewer than n rows AND dropped anything
    // (possible only by hash-tail bad luck) → exact window over those few
    val preCounts = pre.groupBy(col(groupCol)).agg(count(lit(1)).as("_kept"))
    val short = counts.join(preCounts, Seq(groupCol), "left")
      .filter(coalesce(col("_kept"), lit(0L)) < n &&
        col("_cnt") > coalesce(col("_kept"), lit(0L)))
      .select(col(groupCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(u, col(keyCol))
    val fromPre = pre.join(short, Seq(groupCol), "left_anti")
      .withColumn("_r", row_number().over(w)).filter(col("_r") <= n).drop("_r")
    val fromFull = df.join(short, Seq(groupCol))
      .withColumn("_r", row_number().over(w)).filter(col("_r") <= n).drop("_r")
    fromPre.unionByName(fromFull)
  }

  /**
   * Keep the top `frac` of every group by a score column — quantile
   * quality curation ("best 20 % of each domain"), the selection rule
   * quality-classifier pipelines actually ship. Exact per-group rank
   * with a deterministic tiebreaker, so the kept set is reproducible
   * across runs and engines. One partitioned sort per group (an exact
   * quantile needs it); for the billion-row-group regime pre-thin with
   * `sampleByHash` or accept an approximate cut via a score histogram.
   */
  def topFractionPerGroup(df: DataFrame, groupCol: String, score: Column,
      frac: Double, tieCol: String): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    val wRank = Window.partitionBy(col(groupCol)).orderBy(score.desc, col(tieCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("_r", row_number().over(wRank))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_r") <= ceil(col("_n") * frac).cast("long"))
      .drop("_r", "_n")
  }

  /**
   * Deterministic sequence packing: assign each document to a training
   * sequence of ~`budget` tokens. Documents are bucketed by an
   * independent slice of the md5 hash (bits 33-64, so bucket and
   * within-bucket order are uncorrelated), ordered inside each bucket by
   * the portable uniform, and cut greedily at the running token count —
   * `seq_id = floor(tokens_before / budget)`, `tok_offset` the position
   * inside that sequence. This is the concat-then-chop packing most
   * pre-training pipelines use (a doc may straddle two sequences; the
   * trainer masks across the boundary), made reproducible: the packing
   * depends only on (key, token count), not on partition layout or run.
   *
   * Scale shape: one map stage (token count + hashes) and ONE window per
   * bucket (running sum, partition spec always present). `nBuckets`
   * bounds per-task state — size it ≥ cluster cores; each bucket is an
   * independent stream of sequences, which is what a multi-host data
   * loader wants anyway (host h reads buckets ≡ h mod hosts).
   */
  def packSequences(df: DataFrame, keyCol: String, tokens: Column, budget: Int,
      nBuckets: Int = 64): DataFrame = {
    require(budget > 0 && nBuckets > 0, "budget and nBuckets must be positive")
    val u = portableUniform(col(keyCol))
    val bucket = pmod(
      conv(substring(md5(col(keyCol).cast("string")), 9, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong))
    val w = Window.partitionBy(col("_bucket")).orderBy(u, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_bucket", bucket)
      .withColumn("_tok", tokens.cast("long"))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .withColumn("_before", col("_cum") - col("_tok"))
      .select(col(keyCol), col("_bucket").as("bucket"),
        floor(col("_before") / lit(budget.toDouble)).cast("long").as("seq_id"),
        (col("_before") % budget).as("tok_offset"),
        col("_tok").as("n_tokens"))
  }

  /**
   * Seeded global shuffle with an explicit 0-based `position` column —
   * the reproducible training-order permutation (epoch shuffling,
   * curriculum interleaving, striding a corpus across data-loader
   * hosts). The order is `(u, key)` where `u = portableUniform(seed:key)`,
   * so the permutation depends only on (seed, key): stable across runs,
   * partition layouts, and engines; a new seed is a fresh epoch order.
   *
   * Scale shape: positions are assigned WITHOUT a global window. Rows
   * bucket by `floor(u·B)` — every row of bucket i hashes strictly below
   * every row of bucket i+1, so global rank = (rows in lower buckets) +
   * (rank within bucket). The per-bucket counts are a tiny `B`-row
   * aggregate (the only global window runs over THAT frame, not the
   * data), broadcast back; within-bucket ranks are a partitioned window.
   * This is `zipWithIndex` re-expressed declaratively, skew-free because
   * the bucket key is a uniform hash.
   */
  /**
   * Deterministic fixed-size sample: the `k` rows with the smallest
   * seeded portable uniforms (ties by key) — "give me exactly 10k
   * documents for the eval set, the same ones every run". Plans as
   * TakeOrderedAndProject: per-partition heaps of k, never a global
   * sort; `rand()`-free so retries and re-runs return identical rows.
   */
  def exactK(df: DataFrame, keyCol: String, k: Int, seed: String = ""): DataFrame =
    df.withColumn("_u", portableUniform(concat_ws(":", lit(seed), col(keyCol))))
      .orderBy(col("_u"), col(keyCol)).limit(k).drop("_u")

  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val u = portableUniform(concat_ws(":", lit(seed), col(keyCol)))
    val withB = df.withColumn("_u", u)
      .withColumn("_b", floor(col("_u") * nBuckets).cast("int"))
    val offsets = withB.groupBy("_b").agg(count(lit(1)).as("_c"))
      .withColumn("_off", sum("_c").over(Window.orderBy(col("_b"))) - col("_c"))
      .select("_b", "_off")
    val w = Window.partitionBy(col("_b")).orderBy(col("_u"), col(keyCol))
    withB.join(broadcast(offsets), Seq("_b"))
      .withColumn("position", col("_off") + row_number().over(w) - 1)
      .drop("_b", "_u", "_off")
  }
}
