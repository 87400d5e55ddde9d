package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary build + token-id encoding — the step between a
 * cleaned corpus and a trainer's input pipeline: pick the `size` most
 * frequent tokens, assign dense ids by rank, map every document's token
 * stream onto ids with a shared OOV id (= `size`).
 *
 * Scale shape: the count is one explode + hash-aggregate; top-`size`
 * selection is `orderBy(count desc, token).limit(size)` — a distributed
 * TakeOrderedAndProject, no global sort and no unpartitioned window.
 * The rank→id assignment happens on the DRIVER over the ≤ `size`
 * collected rows: a vocabulary is driver-sized by definition (the very
 * next step broadcasts it to every executor), so this is the one place
 * a driver step is the right call, not a scale smell. Ties break by
 * token text, so the vocabulary is deterministic across runs and
 * engines.
 */
object Vocab {

  /** (token, id) vocabulary of the `size` most frequent tokens. */
  def build(docs: DataFrame, size: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("token")).limit(size)
      .select(col("token")).as[String].collect()
    top.zipWithIndex.toIndexedSeq.toDF("token", "id")
  }

  /**
   * Per-document encoding summary against a vocabulary: token count,
   * OOV count, and the positional id checksum Σ (pos+1)·id — scalar
   * outputs (id LISTS don't survive engine-neutral row sorting; the
   * checksum pins every id at every position). Documents with zero
   * tokens produce no row. `oovId` defaults to the vocab size.
   */
  def encode(docs: DataFrame, vocab: DataFrame, oovId: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "token")))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(oovId)))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("id") === oovId, 1)).as("n_oov"),
        sum((col("pos") + 1).cast("long") * col("id").cast("long")).as("idsum"))
  }
}
