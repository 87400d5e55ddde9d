package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training corpora (builder-prompt
 * extension beyond the reference surface): flag training documents that
 * share word n-grams with an evaluation/benchmark set, the standard
 * pre-training hygiene step (GPT-3 App. C / PaLM-style 13-gram overlap;
 * smaller n here because the synthetic documents are short).
 *
 * Scale shape: the benchmark side is SMALL by definition (eval suites
 * are megabytes, not terabytes), so its distinct n-gram keys are
 * broadcast and the corpus side — the 100 TB side — is a single map +
 * broadcast-semi-join + one hash-aggregate shuffle on doc_id. The
 * corpus text itself never shuffles; only (doc_id, 64-bit key) pairs
 * that actually hit do. If a caller feeds a benchmark set too large to
 * broadcast, drop the hint via `broadcastBenchmark = false` and AQE
 * picks the strategy.
 */
object Decontaminate {

  /** N-gram → fixed-width join key. Portable mode is the unsigned value
   *  of the first 60 bits of md5 (any engine replicates it bit-for-bit:
   *  `CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)` in DuckDB);
   *  the scale default is xxhash64 (faster, JVM-only). */
  def ngramKey(g: Column, portable: Boolean): Column =
    if (portable) conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    else xxhash64(g)

  /**
   * Per-document contamination report: every corpus document sharing at
   * least one distinct word `n`-gram with `benchmark`, with the count of
   * distinct shared n-grams as `hits`. Documents with zero overlap are
   * absent (filter with a left_anti join to KEEP the clean ones).
   */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true, broadcastBenchmark: Boolean = true): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"),
          explode(TextFunctions.shingleSet(col(textCol), n)).as("g"))
        .select(col("doc_id"), ngramKey(col("g"), portable).as("k"))
    val bench = grams(benchmark).select("k").distinct()
    val benchSide = if (broadcastBenchmark) broadcast(bench) else bench
    grams(corpus).join(benchSide, Seq("k"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
  }

  /** The complement: corpus documents with NO benchmark n-gram overlap —
   *  the set that is safe to train on. */
  def cleanCorpus(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true): DataFrame = {
    val flagged = flagContaminated(corpus, benchmark, n, idCol, textCol, portable)
    corpus.join(flagged.withColumnRenamed("doc_id", idCol).select(idCol),
      Seq(idCol), "left_anti")
  }

  /**
   * Bloom-prefiltered twin of [[flagContaminated]] — the shape that wins
   * when even the benchmark's distinct-key set is too wide to hash-join
   * comfortably against 100 TB of exploded corpus n-grams: build a bloom
   * filter over the benchmark keys with Spark's distributed
   * `bloom_filter_agg` (`numBits` defaults to ~9.6 bits/item ≈ 1 % fp), ship
   * the ~`numBits/8`-byte sketch as a literal into a map-side
   * `might_contain` prefilter (the same `BloomFilterMightContain`
   * expression Spark's own runtime-filter injection uses, full codegen),
   * and only the surviving ~(hits + 1 %) of grams enter the exact
   * semi-join. False positives die in the join, so the RESULT IS
   * BIT-IDENTICAL to `flagContaminated` — the bloom stage only changes
   * how much data reaches the shuffle.
   */
  def flagContaminatedBloom(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 5, idCol: String = "doc_id", textCol: String = "text",
      portable: Boolean = true, expectedItems: Long = 1000000L,
      broadcastBenchmark: Boolean = false): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"),
          explode(TextFunctions.shingleSet(col(textCol), n)).as("g"))
        .select(col("doc_id"), ngramKey(col("g"), portable).as("k"))
    import org.apache.spark.sql.GraftBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bench = grams(benchmark).select("k").distinct()
    // bloom_filter_agg is registered internal-only; build the aggregate
    // expression directly (same class Spark's runtime-filter rule plants)
    val bloomBytes = bench
      .agg(column(new BloomFilterAggregate(expression(xxhash64(col("k"))),
        Literal(expectedItems), Literal(expectedItems * 8))
        .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // An empty benchmark aggregates to a null sketch; nothing can be
    // contaminated, so return the (correct) empty report rather than
    // planting Literal(null) inside might_contain.
    if (bloomBytes == null)
      return grams(corpus).filter(lit(false))
        .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    val mightContain = column(BloomFilterMightContain(
      Literal(bloomBytes), expression(xxhash64(col("k")))))
    // No forced broadcast by default: this entry point exists precisely
    // for benchmark key sets too wide to hash-join comfortably, and a
    // forced broadcast of that same set can OOM the driver. AQE picks
    // the join strategy from the post-bloom sizes; opt back in for a
    // known-small benchmark.
    val benchSide = if (broadcastBenchmark) broadcast(bench) else bench
    grams(corpus).filter(mightContain)
      .join(benchSide, Seq("k"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
  }
}
