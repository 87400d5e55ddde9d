package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * Column-level data profiling — the first thing anyone runs against an
 * unfamiliar 100 TB drop: per-column row/null/distinct counts and
 * min/max, unpivoted to one row per column so the report is stable as
 * schemas evolve.
 *
 * Scale shape: ONE aggregate job over the table. Counts, nulls and
 * min/max are plain partial-aggregating functions; the exact distinct
 * counts make Spark plan a single `expand` (one input row → one row per
 * profiled column) feeding a two-phase hash aggregate — the standard
 * multi-count-distinct plan, linear in columns profiled. For the
 * interactive regime where ±2 % is fine, `approxDistinct = true` swaps
 * in HyperLogLog++ sketches and the expand disappears entirely (pure
 * one-pass partial agg, same as Pipeline.corpusStatsApprox).
 *
 * Determinism: numeric min/max are emitted as integer micro-units
 * (`floor(x·1e6 + 0.5)`) and string min/max as raw strings — no
 * double-to-text rendering anywhere, so any engine reproduces the
 * report bit-for-bit.
 */
object Profile {

  /** Profile `cols` (default: all numeric + string columns) of `df`. */
  def columns(df: DataFrame, cols: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[NumericType] || f.dataType == StringType =>
          f.name
      }.toSeq
    require(targets.nonEmpty, "no profilable columns")
    val aggs = targets.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      def q6(x: org.apache.spark.sql.Column) =
        floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")
      Seq(
        count(col(c)).as(s"_n:$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"_d:$c"),
        (if (isNum) q6(min(col(c))) else lit(null).cast("long")).as(s"_mn:$c"),
        (if (isNum) q6(max(col(c))) else lit(null).cast("long")).as(s"_mx:$c"),
        (if (isNum) lit(null).cast("string") else min(col(c))).as(s"_ms:$c"),
        (if (isNum) lit(null).cast("string") else max(col(c))).as(s"_xs:$c"))
    }
    val nRows = count(lit(1)).as("_rows")
    val wide = df.agg(nRows, aggs: _*)
    // unpivot: one struct per column, inline_outer to rows
    val entries = targets.map { c =>
      struct(lit(c).as("column"), col("_rows").as("n_rows"),
        (col("_rows") - col(s"`_n:$c`")).as("n_nulls"),
        col(s"`_d:$c`").as("n_distinct"),
        col(s"`_mn:$c`").as("min_q6"), col(s"`_mx:$c`").as("max_q6"),
        col(s"`_ms:$c`").as("min_str"), col(s"`_xs:$c`").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * Fixed-width histogram of a numeric expression over [lo, hi) — the
   * score-distribution report that closes every curation run (where do
   * the quality/LM/similarity scores mass, where should the cut go).
   * One hash-aggregate on the integer bucket id; values below/above the
   * range land in buckets -1 / `nBuckets`. Bucket ids come from exact
   * integer micro-unit arithmetic (`floor(x·1e6)` vs precomputed long
   * edges), so boundary assignment is bit-identical in any engine —
   * a raw `floor((x-lo)/width)` would wobble on edge values.
   */
  def histogram(df: DataFrame, value: org.apache.spark.sql.Column,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    df.filter(value.isNotNull).select(microUnits(value).as("_hq"))
      .groupBy(bucketOf(col("_hq"), lo, hi, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Micro-unit quantization shared by every histogram form.
   *  Materialize it ONCE before the edge comparisons: the chained whens
   *  reference it nBuckets+1 times, and a complex `value` expression
   *  inlined there would be re-evaluated per edge (measured 10× on the
   *  quality-score histogram — CASE branches don't share subexpressions
   *  the way projections do). */
  private def microUnits(value: org.apache.spark.sql.Column) =
    floor(value.cast("double") * lit(1e6)).cast("long")

  /** The exact integer-edge bucket rule over a micro-unit column —
   *  buckets are [edge(i), edge(i+1)); ≥ top edge → nBuckets (overflow);
   *  below edge(0) → -1. One definition, so the batch histogram, PSI and
   *  the streaming monitor bucket IDENTICALLY. */
  private def bucketOf(hq: org.apache.spark.sql.Column,
      lo: Double, hi: Double, nBuckets: Int): org.apache.spark.sql.Column = {
    val edges = (0 to nBuckets).map(i =>
      math.floor((lo + (hi - lo) * i / nBuckets) * 1e6).toLong)
    edges.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (e, i)) => when(hq >= e, i).otherwise(acc)
    }.cast("long")
  }

  /**
   * Population Stability Index between a reference and a current
   * snapshot of the same metric — the standard drift alarm between two
   * crawls / two training mixes (PSI < 0.1 stable, 0.1-0.25 drifting,
   * > 0.25 investigate). Both sides bucket through [[histogram]]'s
   * exact integer-edge rule; per bucket the contribution is
   * `(p_cur − p_ref) · ln(p_cur / p_ref)` with probabilities floored at
   * `minP` so an empty bucket contributes a finite penalty. Returns one
   * row per bucket non-empty on either side (a bucket empty in BOTH
   * contributes exactly 0 and is omitted): `(bucket, n_ref, n_cur,
   * term_q4)` where `term_q4` is the contribution in integer 1e-4 nats
   * — quantized BEFORE any summing (the text_lm_score contract), so
   * `sum(term_q4)` is order-independent and cross-engine exact;
   * [[psiTotal]] folds it to the scalar.
   *
   * Scale shape: one hash-aggregate per side (the histogram), then
   * arithmetic over ≤ nBuckets+2 rows — the snapshots themselves are
   * never joined or shuffled row-to-row.
   */
  def psiDrift(ref: DataFrame, cur: DataFrame,
      value: org.apache.spark.sql.Column, lo: Double, hi: Double,
      nBuckets: Int, minP: Double = 1e-6): DataFrame = {
    require(minP > 0, "minP must be positive")
    val hRef = histogram(ref, value, lo, hi, nBuckets)
      .select(col("bucket"), col("n").as("n_ref"))
    val hCur = histogram(cur, value, lo, hi, nBuckets)
      .select(col("bucket"), col("n").as("n_cur"))
    val joined = hRef.join(hCur, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("_tr"), sum("n_cur").as("_tc"))
    val pRef = pNorm(col("n_ref"), col("_tr"), minP)
    val pCur = pNorm(col("n_cur"), col("_tc"), minP)
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((pCur - pRef) * log(pCur / pRef) * lit(1e4) + lit(0.5))
          .cast("long").as("term_q4"))
  }

  /** Floored probability `max(n/total, minP)` with an explicit failure
   *  when a histogram side is EMPTY (total 0): 0/0 is NaN, and NaN sorts
   *  above minP in `greatest`, so without the guard an empty reference
   *  silently turned every PSI term into garbage instead of erroring. */
  private def pNorm(n: org.apache.spark.sql.Column,
      total: org.apache.spark.sql.Column, minP: Double) =
    when(total > 0, greatest(n.cast("double") / total, lit(minP)))
      .otherwise(raise_error(
        lit("PSI: histogram side has zero total rows — cannot normalize"))
        .cast("double"))

  /** The PSI scalar: Σ term_q4 over a [[psiDrift]] report, still in
   *  integer 1e-4 nats (one row: `psi_q4`). */
  def psiTotal(drift: DataFrame): DataFrame =
    drift.agg(coalesce(sum("term_q4"), lit(0L)).as("psi_q4"))

  /**
   * EXACT frequent items above a support threshold — the hot-key report
   * that decides where salting/broadcast special-casing is worth it
   * (which device floods the stream, which token dominates the corpus)
   * — at bounded memory per task.
   *
   * The naive `GROUP BY key HAVING count > t` shuffles every distinct
   * key; over 100 TB of exploded tokens that is a shuffle the size of
   * the corpus. Here a per-partition MISRA-GRIES summary (capacity
   * m = ⌈1e6/supportPpm⌉) first prunes the candidate space: a key whose
   * global count exceeds N·supportPpm/1e6 loses at most n_p/(m+1) of its
   * count to decrements in a partition of n_p rows, Σ n_p/(m+1) ≤ N/m ≤
   * N·supportPpm/1e6 over all partitions — so every qualifying key
   * SURVIVES in at least one partition summary (the classic Misra-Gries
   * bound, applied per partition). The surviving candidate set
   * (≤ m · partitions keys, KBs not TBs) broadcasts into a semi-join
   * pre-filter, and only candidate rows reach the exact recount
   * aggregate. The result is bit-identical to the naive plan — the
   * sketch only prunes, the counts published are exact — which is what
   * makes the operator oracle-able.
   *
   * Support is parts-per-million (`supportPpm`) and the cut is integer
   * arithmetic (`n > N·supportPpm / 1e6`, floored long division), so
   * any engine computes the identical threshold. Three passes over the
   * key column (count, sketch, recount), zero wide shuffles.
   */
  def frequentItems(df: DataFrame, key: org.apache.spark.sql.Column,
      supportPpm: Long): DataFrame = {
    require(supportPpm > 0 && supportPpm < 1000000L,
      "supportPpm must be in (0, 1e6)")
    val m = math.ceil(1e6 / supportPpm).toInt
    val keyed = df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
    val spark = keyed.sparkSession
    import spark.implicits._
    val total = keyed.count()
    val candidates = keyed.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { k =>
        counts.get(k) match {
          case Some(c) => counts(k) = c + 1
          case None if counts.size < m => counts(k) = 1L
          case None => // decrement-all: drop every key hitting zero
            counts.keysIterator.toArray.foreach { kk =>
              val c = counts(kk)
              if (c == 1L) counts.remove(kk) else counts(kk) = c - 1
            }
        }
      }
      counts.keysIterator
    }.toDF("key").distinct()
    val threshold = total * supportPpm / 1000000L
    keyed.join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
  }

  /**
   * Streaming drift monitor, part 1: per event-time window, the bucket
   * histogram of `value` as a watermark-bounded streaming aggregation.
   * Append mode — a window's counts emit exactly once, when the
   * watermark seals it; state is bounded by (open windows × buckets),
   * independent of row volume. Buckets use the SAME integer-edge rule
   * as the batch [[histogram]], so a reference histogram computed in
   * batch compares exactly.
   *
   * Structured Streaming allows one aggregation per stream — this is
   * it. The per-window PSI arithmetic runs on the SEALED rows (in a
   * `foreachBatch`, or in batch over the sink table) via
   * [[finalizePsi]], where batch rules apply.
   */
  def streamingHistogram(stream: DataFrame, timeCol: String,
      value: org.apache.spark.sql.Column, lo: Double, hi: Double,
      nBuckets: Int, windowDur: String, watermarkDelay: String): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    stream.filter(value.isNotNull)
      .select(col(timeCol).as("_t"), microUnits(value).as("_hq"))
      .withWatermark("_t", watermarkDelay)
      .groupBy(window(col("_t"), windowDur).as("_w"),
        bucketOf(col("_hq"), lo, hi, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("_w.start").as("window_start"), col("bucket"), col("n"))
  }

  /**
   * Streaming drift monitor, part 2: fold sealed per-window bucket
   * counts (the [[streamingHistogram]] output) against a reference
   * histogram ([[histogram]] over the baseline corpus) into one PSI
   * scalar per window — `(window_start, psi_q4)` in integer 1e-4 nats,
   * the same term arithmetic and quantization-before-sum contract as
   * [[psiDrift]]. The reference is windows-independent and broadcast;
   * the only shuffle is per-window totals over (windows × buckets) rows.
   */
  def finalizePsi(sealedCounts: DataFrame, ref: DataFrame,
      minP: Double = 1e-6): DataFrame = {
    require(minP > 0, "minP must be positive")
    val refH = ref.select(col("bucket"), col("n").as("n_ref"))
    // fresh aliases on each branch: both derive from sealedCounts, and a
    // full-outer self-join over the shared attributes would be ambiguous
    val refPerWin = sealedCounts.select(col("window_start").as("_wr"))
      .distinct().crossJoin(broadcast(refH))
      .select(col("_wr"), col("bucket").as("_br"), col("n_ref"))
    val cur = sealedCounts.select(col("window_start").as("_wc"),
      col("bucket").as("_bc"), col("n").as("n_cur"))
    val j = refPerWin.join(cur,
        col("_wr") === col("_wc") && col("_br") === col("_bc"), "full_outer")
      .select(coalesce(col("_wr"), col("_wc")).as("window_start"),
        coalesce(col("_br"), col("_bc")).as("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = j.groupBy("window_start")
      .agg(sum("n_ref").as("_tr"), sum("n_cur").as("_tc"))
    val pRef = pNorm(col("n_ref"), col("_tr"), minP)
    val pCur = pNorm(col("n_cur"), col("_tc"), minP)
    j.join(totals, Seq("window_start"))
      .select(col("window_start"),
        floor((pCur - pRef) * log(pCur / pRef) * lit(1e4) + lit(0.5))
          .cast("long").as("_term"))
      .groupBy("window_start").agg(sum("_term").as("psi_q4"))
  }

  /**
   * Streaming hot-key monitor, part 1: per event-time window, the
   * per-key counts of `key` as one watermark-bounded streaming
   * aggregation (append mode — sealed windows emit once; state = open
   * windows × distinct keys within them). Same two-part shape as the
   * PSI monitor: Structured Streaming allows one aggregation, so the
   * top-k cut runs in batch over the sealed rows via
   * [[finalizeTopKeys]]. The continuous form of [[topKeys]] — which
   * device floods which hour, watched live.
   */
  def streamingKeyCounts(stream: DataFrame, timeCol: String,
      key: org.apache.spark.sql.Column, windowDur: String,
      watermarkDelay: String): DataFrame =
    stream.select(col(timeCol).as("_t"), key.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .withWatermark("_t", watermarkDelay)
      .groupBy(window(col("_t"), windowDur).as("_w"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("_w.start").as("window_start"), col("key"), col("n"))

  /**
   * Streaming hot-key monitor, part 2: the exact top-k per sealed
   * window, (n desc, key asc) tie-break — a per-window ranking window
   * over already-aggregated (window, key, n) rows, WindowGroupLimit-
   * bounded, never over the data stream itself.
   */
  def finalizeTopKeys(sealedCounts: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(col("n").desc, col("key").asc)
    sealedCounts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("window_start", "rank", "key", "n")
  }

  /**
   * Exact top-k values of `key` by count with a deterministic
   * (n desc, key asc) tie-break. The ranking is a distributed
   * TakeOrderedAndProject over the aggregated (key, n) rows — each task
   * keeps its own top k and the driver merges k·partitions rows; no
   * global sort, no unpartitioned window.
   */
  def topKeys(df: DataFrame, key: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(key.cast("string").as("key")).filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc).limit(k)
  }
}
