package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al. 2023,
 * arXiv:2302.03169): score every raw-corpus document by how much more
 * likely its hashed n-gram features are under a TARGET distribution
 * (the high-quality corpus you wish you had more of) than under the RAW
 * distribution, then keep the documents with the highest importance
 * weights. This is the principled replacement for "train a quality
 * classifier": two multinomials over hashed bigram buckets, no labels.
 *
 * Spark-first shape, no UDFs:
 *  - **features** are one map stage: tokenize, form bigrams, hash each
 *    into one of `nBuckets` buckets (raw text never shuffles — only
 *    (id, bucket) pairs leave the stage);
 *  - **models** are one hash-aggregation per corpus over the bucket
 *    stream — `nBuckets` rows each, broadcast-sized by construction;
 *  - **scoring** is one equi-join of the exploded feature stream
 *    against the λ table (AQE broadcasts it — it is ≤ nBuckets rows)
 *    plus one per-document aggregation.
 *
 * Cross-engine exactness (the established engine convention): smoothed
 * bucket probabilities are single IEEE divisions of exact integers; the
 * per-bucket log-ratio λ_b = ln p_target(b) − ln p_raw(b) is quantized
 * to integer 1e-4 nats BEFORE the order-independent integer sum, so any
 * engine reproduces every document's weight bit-for-bit.
 *
 * Portable mode hashes buckets from md5 (any engine reproduces them);
 * the scale default is xxhash64 — 8-byte computation, no hex decode.
 */
object Importance {

  /** Hashed-bigram feature stream: one row per bigram occurrence,
   *  columns (idCol, b). Documents with < 2 tokens emit nothing. */
  def featureStream(docs: DataFrame, nBuckets: Int, idCol: String = "doc_id",
      textCol: String = "text", portable: Boolean = true): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val grams = docs.select(col(idCol), toks.as("_t"))
      .where(size(col("_t")) >= 2)
      .select(col(idCol), posexplode(col("_t")).as(Seq("_p", "_w2")), col("_t"))
      .where(col("_p") >= 1)
      .select(col(idCol),
        concat_ws(" ", element_at(col("_t"), col("_p")), col("_w2")).as("_g"))
    val bucket =
      if (portable)
        pmod(conv(substring(md5(col("_g")), 1, 15), 16, 10).cast("long"),
          lit(nBuckets.toLong))
      else pmod(xxhash64(col("_g")), lit(nBuckets.toLong))
    grams.select(col(idCol), bucket.as("b"))
  }

  /**
   * Per-bucket quantized log-ratio table λ: (b, lam_q4) for every bucket
   * observed in either corpus, plus the single-row defaults frame
   * (lam0_q4) for buckets unseen in both — with add-one smoothing an
   * unseen bucket still has probability 1/(N+K) under each model.
   */
  def logRatioTable(target: DataFrame, raw: DataFrame, nBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true): (DataFrame, DataFrame) = {
    def counts(c: DataFrame) =
      featureStream(c, nBuckets, idCol, textCol, portable)
        .groupBy("b").agg(count(lit(1)).as("c"))
    val tc = counts(target)
    val rc = counts(raw)
    val totals = tc.agg(sum("c").as("nt")).crossJoin(rc.agg(sum("c").as("nr")))
    val k = lit(nBuckets.toDouble)
    def lam(ct: Column, cr: Column): Column =
      floor((log((ct + 1).cast("double") / (col("nt") + k)) -
        log((cr + 1).cast("double") / (col("nr") + k))) * lit(1e4) + lit(0.5))
        .cast("long")
    val table = tc.withColumnRenamed("c", "ct")
      .join(rc.withColumnRenamed("c", "cr"), Seq("b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        lam(coalesce(col("ct"), lit(0L)), coalesce(col("cr"), lit(0L))).as("lam_q4"))
    val defaults = totals.select(lam(lit(0L), lit(0L)).as("lam0_q4"))
    (table, defaults)
  }

  /**
   * Importance weights for `docs` against a (target, raw) pair:
   * (idCol, n_feat, iw_q4) — iw_q4 = Σ_features λ_b in integer 1e-4
   * nats (the log importance weight; positive = more target-like).
   * Documents with < 2 tokens carry no evidence and score 0 over 0
   * features. When `docs` ⊆ `raw` every feature bucket exists in the λ
   * table; the unseen-bucket default only binds for out-of-corpus docs.
   */
  def weights(docs: DataFrame, target: DataFrame, raw: DataFrame,
      nBuckets: Int = 4096, idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true): DataFrame = {
    val (lamTable, defaults) = logRatioTable(target, raw, nBuckets, idCol,
      textCol, portable)
    val scored = featureStream(docs, nBuckets, idCol, textCol, portable)
      .join(lamTable, Seq("b"), "left")
      .crossJoin(broadcast(defaults))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"),
        sum(coalesce(col("lam_q4"), col("lam0_q4"))).as("iw_q4"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("iw_q4"), lit(0L)).as("iw_q4"))
  }

  /**
   * Keep the `frac` highest-weighted documents, exactly and
   * deterministically: the global top-k cut runs on the INTEGER score
   * histogram (groupBy iw_q4 → at most |distinct scores| rows collected,
   * orders of magnitude below row count), which fixes the boundary
   * score; only boundary-score rows — a thin slice — pay a rank window,
   * partitioned by their (single) score value with id tie-break.
   * No global sort, no unpartitioned window, no full-corpus limit().
   *
   * The histogram collect is bounded by the score RANGE, not the row
   * count: iw_q4 is an integer 1e-4-nat quantization of a sum of
   * per-feature log-ratios, so |distinct scores| ≤ the span of observed
   * weights × 10⁴ — typically thousands. Because that bound is indirect,
   * it is GUARDED: a one-aggregate `approx_count_distinct` probe runs
   * first, and above `maxHistogramRows` distinct scores the cut falls
   * back to an approx-percentile boundary (`iw_q4 ≥ quantile(1−frac)`,
   * GK sketch, `quantileError` rank error) — approximate in result
   * COUNT, still deterministic for a given dataset, and collecting
   * nothing driver-sized. The exact path remains bit-exact and is the
   * oracle surface (`samp_dsir`).
   */
  def selectTop(weighted: DataFrame, frac: Double,
      idCol: String = "doc_id", maxHistogramRows: Long = 4L << 20,
      quantileError: Double = 1e-4): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    val distinctScores = weighted
      .agg(approx_count_distinct(col("iw_q4")).as("d")).head.getLong(0)
    // approx_count_distinct err ~2%; 1.1 margin keeps the guard safe
    if (distinctScores > maxHistogramRows * 11L / 10L) {
      val boundary = weighted.stat
        .approxQuantile("iw_q4", Array(1.0 - frac), quantileError).head
      return weighted.filter(col("iw_q4") >= math.floor(boundary).toLong)
    }
    val hist = weighted.groupBy(col("iw_q4")).agg(count(lit(1)).as("c"))
      .orderBy(col("iw_q4").desc).collect()
    val total = hist.map(_.getLong(1)).sum
    val k = math.ceil(total * frac).toLong
    var run = 0L; var boundary = Long.MinValue; var atBoundary = 0L
    val it = hist.iterator
    while (run < k && it.hasNext) {
      val r = it.next()
      boundary = r.getLong(0)
      atBoundary = k - run // how many boundary-score rows we still need
      run += r.getLong(1)
    }
    val above = weighted.filter(col("iw_q4") > boundary)
    val w = Window.partitionBy(col("iw_q4")).orderBy(col(idCol))
    val atEdge = weighted.filter(col("iw_q4") === boundary)
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= atBoundary).drop("_r")
    above.unionByName(atEdge)
  }

  /** The full DSIR step: weight `raw` against `target`, keep the top
   *  `frac`. Join back by id so callers get their original columns. */
  def resample(raw: DataFrame, target: DataFrame, frac: Double,
      nBuckets: Int = 4096, idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true): DataFrame = {
    val kept = selectTop(
      weights(raw, target, raw, nBuckets, idCol, textCol, portable), frac, idCol)
    raw.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
  }
}
