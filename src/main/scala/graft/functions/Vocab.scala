package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * Vocabulary coverage curve — for each candidate vocab size in
   * `sizes`, the fraction of ALL corpus token occurrences covered by the
   * top-`size` tokens (the number a tokenizer team actually reads when
   * choosing |V|; the complement is the OOV rate). One token-count
   * aggregate feeds every size: ranks come from one orderBy over the
   * DISTINCT-token frame (vocabulary-sized, not corpus-sized), and the
   * covered mass per size is a running sum over that same small frame.
   * Fractions are micro-unit quantized for engine-exact comparison.
   */
  def coverage(docs: DataFrame, sizes: Seq[Int], minCount: Long = 1L,
      textCol: String = "text"): DataFrame = {
    require(sizes.nonEmpty, "sizes must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    // the ranking window runs over the DISTINCT-token frame with a
    // deterministic (n desc, token) order; on a web-scale corpus bound
    // it with `minCount` (the hapax tail is never vocab material and is
    // the bulk of |distinct tokens|) — totals still count every token
    val w = Window.orderBy(col("n").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts.filter(col("n") >= minCount)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .withColumn("cum", sum(col("n")).over(w))
    val total = counts.agg(sum(col("n")).as("_total"))
    val rows = sizes.distinct.sorted.map { s =>
      ranked.filter(col("rank") <= s)
        .agg(max(col("cum")).as("covered"))
        .withColumn("size", lit(s.toLong))
    }.reduce(_ unionByName _)
    rows.crossJoin(broadcast(total))
      .select(col("size"),
        floor(col("covered").cast("double") / col("_total") * lit(1e6) + lit(0.5))
          .cast("long").as("coverage_q6"))
  }

  // --- BPE merge training (Sennrich et al. 2016) ---

  /** Word-frequency table — the corpus-scale half of BPE training (one
   *  explode + one hash-aggregate; this is the only part that touches
   *  100 TB — the merge loop below runs over this table, which is
   *  exactly how production BPE trainers are structured). On web text
   *  the DISTINCT-word tail (URLs, hashes, typos) runs to billions, so
   *  the table is NOT driver-sized without a floor: `minCount` prunes it
   *  the way Sennrich's reference trainer does (freq ≥ 2 alone typically
   *  cuts web vocab ~10×; pruned words still counted by callers that
   *  need totals, e.g. [[coverage]], which takes the same param). */
  def wordFreqs(docs: DataFrame, textCol: String = "text",
      minCount: Long = 1L): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    if (minCount > 1L) counts.filter(col("freq") >= minCount) else counts
  }

  /**
   * The BPE merge loop: starting from single characters, repeatedly
   * merge the most frequent adjacent symbol pair (frequency weighted by
   * word count), `nMerges` times or until no pair repeats. Ties break
   * on the lexicographic (left, right) pair, so the learned merge
   * sequence is fully deterministic. Pure function over the
   * word-frequency table.
   */
  def learnMerges(freqs: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words = freqs.toArray.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val out = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        out += best
        words = words.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              merged += syms(i) + syms(i + 1); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toArray, f)
        }
      }
    }
    out.result()
  }

  /** Hard ceiling on the collected word-frequency table: ~4M (word,
   *  freq) rows is hundreds of MB at worst — comfortably driver-sized —
   *  while covering far more vocabulary than any tokenizer uses. */
  val DefaultMaxTrainWords: Int = 1 << 22

  /**
   * Learn `nMerges` BPE merges from a corpus → (rank, left, right).
   *
   * The driver collect is BOUNDED: the frequency table is floored at
   * `minCount` (hapax pruning, as in Sennrich's reference trainer) and
   * then hard-capped at `maxWords` rows. If the floored table still
   * exceeds the cap this FAILS FAST with the measured size instead of
   * silently truncating the tail (a silent cut could change learned
   * merges without warning) — raise `minCount` (the right fix on web
   * text) or `maxWords`. `learnMerges` is order-independent, so the
   * bounded path reproduces the unbounded result whenever the pruned
   * words carry no repeated pairs (see `Round5OpsSpec`).
   */
  def trainBpe(docs: DataFrame, nMerges: Int, textCol: String = "text",
      minCount: Long = 1L, maxWords: Int = DefaultMaxTrainWords): DataFrame = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    // orderBy+limit = distributed TakeOrdered on (freq desc, word) —
    // deterministic, no global sort; +1 row detects cap overflow
    val bounded = wordFreqs(docs, textCol, minCount)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords + 1).as[(String, Long)].collect()
    require(bounded.length <= maxWords,
      s"trainBpe: word-frequency table exceeds maxWords=$maxWords rows " +
        s"after minCount=$minCount pruning; raise minCount or maxWords")
    learnMerges(bounded.toSeq, nMerges).zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }

  /**
   * Apply a merge list to every word of `text`, producing the flat BPE
   * piece array. Each rank is one left-to-right non-overlapping scan —
   * the reference implementation's semantics — expressed on a BRACKETED
   * symbol string (`(a)(b)(c)`; merge (l,r) = replace `(l)(r)` with
   * `(lr)`). Brackets make every symbol boundary explicit, so built-in
   * `replace` reproduces the classic scan exactly (a spaced encoding
   * would share boundary characters between adjacent matches and break
   * on runs like `aaaa`). The whole chain is built-in string functions —
   * pure whole-stage codegen, no UDF, byte-for-byte replicable in any
   * engine with `replace`/`regexp_extract_all`. Tokens are `[a-z0-9]+`,
   * so the brackets can never collide with symbol text.
   */
  def applyMerges(text: Column, merges: Seq[(String, String)]): Column = {
    val words = TextFunctions.tokens(text)
    flatten(transform(words, w => {
      val bracketed = regexp_replace(w, "(.)", "($1)")
      val mergedStr = merges.foldLeft(bracketed) { case (s, (l, r)) =>
        replace(s, lit(s"($l)($r)"), lit(s"($l$r)"))
      }
      regexp_extract_all(mergedStr, lit("\\(([a-z0-9]+)\\)"), lit(1))
    }))
  }
}
