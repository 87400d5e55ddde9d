package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learned quality filtering — the CCNet/GPT-3-style logistic-regression
 * classifier over hashed bag-of-words features, trained with full-batch
 * gradient descent where every aggregation is an integer micro-unit sum:
 *
 *  - features: distinct tokens hashed into `dims` buckets with the
 *    PORTABLE md5 slice (binary presence features);
 *  - forward pass: z = Σ w_d over the document's buckets — the weights
 *    are stored as micro-unit longs, so the per-document sum is exact
 *    long addition; p = σ(z) is then quantized to 1e-6 BEFORE the
 *    residual, so the per-dimension gradient Σ (label·1e6 − p_q6) is
 *    again an order-independent long sum;
 *  - update: w_d += floor(lr · grad_d / n + 0.5), one IEEE double chain.
 *
 * The result: training is DETERMINISTIC under any partition layout and
 * reproducible bit-for-bit by an external engine (the only FP wobble is
 * exp() inside σ, absorbed by the quantization except on ~1e-10
 * boundaries — the same contract as the LM scorer's quantized ln).
 *
 * Scale shape per iteration: one hash-aggregate for the per-document z
 * (moves (doc, bucket-weight) longs), one for the per-dimension gradient
 * (moves (bucket, residual) longs), and a `dims`-sized collect — the
 * parameter-server-on-driver pattern every distributed LR uses; `dims`
 * bounds driver memory, documents never leave the executors.
 */
object Classifier {

  /** Portable token→bucket hash (md5 slice mod dims). */
  def bucket(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"), lit(dims.toLong))

  /** (doc_id, label, d) distinct binary feature rows. */
  private def features(docs: DataFrame, label: Column, dims: Int,
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), label.cast("long").as("label"),
        explode(array_distinct(transform(
          TextFunctions.tokens(col(textCol)), t => bucket(t, dims)))).as("d"))

  /**
   * Train `iters` full-batch GD steps; returns per-document
   * (doc_id, label, score_q6) under the FINAL weights plus the weight
   * table via the second frame of the tuple.
   */
  def trainQualityLR(docs: DataFrame, label: Column, dims: Int = 64,
      iters: Int = 3, lr: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = features(docs, label, dims, idCol, textCol).localCheckpoint(true)
    val n = docs.count()
    var w = new Array[Long](dims) // micro-unit weights
    def zq6(): DataFrame = {
      val warr = array(w.map(lit): _*)
      feats.withColumn("_w", element_at(warr, col("d").cast("int") + 1))
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("_w")).as("z_q6"))
    }
    for (_ <- 0 until iters) {
      // p = σ(z) quantized; residual r = label·1e6 − p_q6 (long)
      val r = zq6().withColumn("p_q6",
          floor(lit(1e6) / (lit(1.0) + exp(-col("z_q6").cast("double") / lit(1e6)))
            + lit(0.5)).cast("long"))
        .withColumn("r_q6", col("label") * lit(1000000L) - col("p_q6"))
        .select(col("doc_id"), col("r_q6"))
      val grad = feats.join(r, "doc_id")
        .groupBy(col("d")).agg(sum(col("r_q6")).as("g_q6"))
        .as[(Long, Long)].collect().toMap
      w = Array.tabulate(dims) { d =>
        w(d) + math.floor(lr * grad.getOrElse(d.toLong, 0L).toDouble / n + 0.5).toLong
      }
    }
    val scores = zq6().select(col("doc_id"), col("label"),
      col("z_q6").as("score_q6"))
    val weights = w.toIndexedSeq.zipWithIndex
      .map { case (wq, d) => (d.toLong, wq) }.toDF("d", "w_q6")
    (scores, weights)
  }

  /**
   * Inference with a trained weight table — score any corpus with the
   * model trained elsewhere (the train/infer split, as with
   * labelCentroids/assignToCentroids). Weights broadcast as a literal
   * array (dims-bounded), so scoring is one map + one per-doc long-sum
   * aggregate; `score_q6` > 0 means p > 0.5.
   */
  def scoreLR(docs: DataFrame, weights: DataFrame, dims: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = new Array[Long](dims)
    weights.select(col("d"), col("w_q6")).as[(Long, Long)].collect()
      .foreach { case (d, wq) => w(d.toInt) = wq }
    val warr = array(w.toIndexedSeq.map(lit): _*)
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          TextFunctions.tokens(col(textCol)), t => bucket(t, dims)))).as("d"))
      .withColumn("_w", element_at(warr, col("d").cast("int") + 1))
      .groupBy(col("doc_id")).agg(sum(col("_w")).as("score_q6"))
  }
}
