package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Composite training-data preprocessing pipeline (builder-prompt scope):
 * the canonical corpus-cleanup pass — language filter, quality floor,
 * exact dedup — composed from the verified primitives.
 *
 * Scale shape: language ID and quality scoring are one fused map stage
 * (native TokenStats expression, no shuffle); the dedup is a single
 * hash-aggregate on the 128-bit key — the only shuffle in the pipeline,
 * and it moves (key, id, lang, score) tuples, never document text.
 */
object Pipeline {

  /**
   * docs → surviving documents with their language, quality score and
   * duplicate count. `dedupKey` defaults to the full normalized-text
   * fingerprint; pass e.g. a prefix fingerprint for fuzzy-prefix dedup.
   * Keeps the lowest-id document of every duplicate group.
   */
  def cleanCorpus(docs: DataFrame, lang: String = "en", minQuality: Double = 0.3,
      idCol: String = "doc_id", textCol: String = "text",
      dedupKey: Option[Column] = None): DataFrame = {
    val key = dedupKey.getOrElse(TextFunctions.fingerprint(col(textCol)))
    val scored = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .withColumn("score", round(TextFunctions.qualityScore(col("text")), 6))
      .filter(col("lang_pred") === lang && col("score") >= minQuality)
      .withColumn("fp", key)
    scored
      .groupBy(col("fp"))
      .agg(
        min_by(struct(col("doc_id"), col("score")), col("doc_id")).as("_keep"),
        count(lit(1)).as("dups"))
      .select(col("fp"), col("_keep.doc_id").as("doc_id"),
        col("_keep.score").as("score"), col("dups"))
  }

  /**
   * Per-group corpus report — the health dashboard every curation run
   * ends with: document/token/char volumes and the exact-unique count
   * per source (or any grouping column). One map stage + one hash
   * aggregate; integer outputs so any engine replicates it exactly.
   * `n_unique` < `n_docs` quantifies within-source exact duplication.
   */
  def corpusStats(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("total_tokens"),
      sum(length(col(textCol)).cast("long")).as("total_chars"),
      countDistinct(TextFunctions.fingerprint(col(textCol))).as("n_unique"))
}
