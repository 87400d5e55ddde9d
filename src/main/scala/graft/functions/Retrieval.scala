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
}
