package graft.rollup

import graft.model.Tier
import graft.query.TierPolicy
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tiered downsampling cascade — the reference's InfluxDB continuous
 * queries (SELECT mean of every field INTO the next tier, all
 * measurements, GROUP BY time(res) and all tags; reference:
 * src/integration/tsdb/storage/influxdb_v1.go:72-78,333-348)
 * re-expressed as batch aggregations:
 * raw→day @1m, day→week @10m, week→month @1h, month→year @1d.
 *
 * Design divergence (SURVEY.md P8): the rollup field keeps the name
 * `value` in every tier instead of InfluxDB's cascading `mean_mean_*`
 * artifact names, so `ResolveFieldFullName` becomes the identity.
 *
 * Scale: one shuffle per tier on (bucket, measurement, tags) — exactly the
 * grouping the next tier is partitioned by, so a 100 TB raw tier reduces
 * ~30× per hop and each hop's input is the (much smaller) previous rollup,
 * never raw data re-scanned. Map-side partial aggregation applies since
 * avg is algebraic.
 */
object Downsampler {

  /** The tag identity of a series (CQ `GROUP BY *`; csv.go:22 column set). */
  val defaultTagCols: Seq[String] =
    Seq("dev_id", "dev_type", "dir", "location_id", "service", "src", "topic", "domain", "unit")

  /**
   * One downsampling hop: mean of `value` per epoch-aligned bucket per
   * (measurement, tags). Buckets align to the epoch like InfluxDB
   * `GROUP BY time(X)` and Spark's `window()`.
   */
  def downsample(points: DataFrame, resolutionMinutes: Long,
      tagCols: Seq[String] = defaultTagCols): DataFrame = {
    val sec = resolutionMinutes * 60
    val present = tagCols.filter(points.columns.contains)
    val bucket = timestamp_seconds(floor(unix_timestamp(col("time")) / sec) * sec).as("time")
    points
      .groupBy((Seq(col("measurement"), bucket) ++ present.map(col)): _*)
      .agg(avg(col("value")).as("value"))
  }

  /** Materialize the full cascade from a raw-tier DataFrame; returns
   *  tier-name → rollup DataFrame (reference cascade influxdb_v1.go:72-78). */
  def cascade(raw: DataFrame, tagCols: Seq[String] = defaultTagCols): Map[String, DataFrame] = {
    Tier.cascade.foldLeft(Map("gen_raw" -> raw)) { case (acc, (from, to)) =>
      val res = TierPolicy.tierResolutionMinutes(to, Tier.ProfileOptimized)
      acc + (to.name -> downsample(acc(from.name), res, tagCols))
    }
  }

  /**
   * CONTINUOUS rollup — the streaming counterpart of `maintain`, closest
   * in spirit to InfluxDB's continuous queries (influxdb_v1.go:72-78):
   * tails new files of the source tier, aggregates per epoch-aligned
   * window with a watermark bounding state, and appends each finalized
   * window's rows into the target tier. Append-mode emission means every
   * (window, series) row is written exactly once per run (at-least-once
   * across restarts — same appendix-idempotence story as runStream).
   * NOTE the watermark gotcha: a finalized window is emitted by the batch
   * AFTER the one that advanced the watermark past its end — with a file
   * source that means emission waits for the next file to arrive.
   * BOUNDARY: the file source tails the tier's raw APPEND files only;
   * committed `_v=N` compaction snapshots are underscore-hidden from it
   * by design (a compaction rewrites history the stream already
   * processed — re-surfacing it would double-count). A stream started
   * AFTER history was compacted away should bootstrap with one batch
   * [[maintain]] pass first.
   *
   * `target` lets the finalized windows land in a DIFFERENT store than
   * the one being tailed (the classic CQ-into-another-database shape;
   * also keeps hop output separate from rows the ingest ROUTER already
   * placed in the same tier of the source store). Default: same store.
   */
  def streamingHop(store: graft.store.TierStore, from: Tier, to: Tier,
      checkpoint: String, watermark: String = "30 minutes",
      tagCols: Seq[String] = defaultTagCols,
      target: Option[graft.store.TierStore] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sink = target.getOrElse(store)
    val spark = store.read(from).sparkSession
    val res = TierPolicy.tierResolutionMinutes(to, Tier.ProfileOptimized)
    // maxFilesPerTrigger pins the micro-batch boundaries to the file
    // layout instead of poll cadence — a benchmark fixture sets it so
    // the run's batch count measures the PLAN, not timing (r11 ask #3)
    val base = spark.readStream
      .schema(store.read(from).schema)
    val src = maxFilesPerTrigger
      .fold(base)((n: Int) => base.option("maxFilesPerTrigger", n.toString))
      .parquet(store.tierPath(from.name))
    val present = tagCols.filter(src.columns.contains)
    src
      .withWatermark("time", watermark)
      .groupBy(window(col("time"), s"$res minutes") +:
        col("measurement") +: present.map(col): _*)
      .agg(avg(col("value")).as("value"))
      .select(col("measurement") +: col("window.start").as("time") +:
        col("value") +: present.map(col): _*)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch plan carries the stateful windowed aggregation —
        // without a persist the emptiness probe and the staged write
        // EACH execute it (shuffle + state-store pass twice per
        // micro-batch, the dominant addBatch cost). Persist caches the
        // (small — sealed windows only) batch output across the two
        // actions; the batch's own cache is dropped before the next
        // trigger (guide §5 persist-on-reuse, VERDICT-r16 ask #4).
        batch.persist()
        try { if (!batch.isEmpty) sink.write(to, batch) }
        finally { batch.unpersist(): Unit }
      }
      .start()
  }

  /**
   * HISTORICAL backfill: rebuild every rollup tier for an EXPLICIT
   * `[fromDate, toDate]` date window (inclusive, `yyyy-MM-dd`) from the
   * tier below — the repair [[maintain]]'s recent-`sinceDays` increment
   * cannot reach (late-arriving raw replays, a corrected transform, a
   * poisoned window). Same snapshot-publish machinery
   * ([[graft.store.TierStore.replaceDatePartitions]]): readers flip
   * old→new per partition, never partial; a window date whose source
   * rows vanished retires its stale rollup partition via an empty
   * snapshot. No retention expiry, no compaction — backfill corrects
   * data, the periodic maintain owns lifecycle.
   *
   * Whole-date windows align with every cascade resolution (1 m, 10 m,
   * 1 h, 1 d buckets all nest inside a date), so the recompute is
   * bucket-exact at the window edges. Scale shape: per hop, ONE
   * partition-pruned scan of the window (the `date` filter prunes at
   * the index) and one shuffle on the rollup grouping — cost is the
   * window's size, not the tier's history.
   */
  def backfill(store: graft.store.TierStore, fromDate: String, toDate: String,
      tagCols: Seq[String] = defaultTagCols,
      retainHistory: Boolean = false): Unit = {
    val from = java.sql.Date.valueOf(fromDate)
    val to = java.sql.Date.valueOf(toDate)
    require(!from.after(to), s"backfill window is inverted: $fromDate > $toDate")
    import org.apache.spark.sql.functions.col
    // same hop set as maintain: the fixed cascade plus registered CQs
    val hops: Seq[(Tier, Tier, Long)] =
      Tier.cascade.map { case (f, t) =>
        (f, t, TierPolicy.tierResolutionMinutes(t, Tier.ProfileOptimized))
      } ++ store.continuousQueries.flatMap { cq =>
        for (f <- store.tierByName(cq.src); t <- store.tierByName(cq.target))
          yield (f, t, cq.resolutionMinutes)
      }
    hops.foreach { case (f, t, res) =>
      def window(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("date") >= from && col("date") <= to)
      val src = window(store.read(f))
      // replace every window date present in SOURCE or TARGET: a date
      // with fresh rows gets the recompute, a date whose source is gone
      // retires its stale rollup (collect as strings — see maintain).
      // ONE action covers both sides (union before the distinct) — the
      // two separate collects paid an extra scan job per hop
      def dateCol(df: org.apache.spark.sql.DataFrame) =
        df.select(col("date").cast("string"))
      val affected = dateCol(src).unionAll(dateCol(window(store.read(t))))
        .distinct().collect().map(_.getString(0)).toSet
      if (affected.nonEmpty)
        store.replaceDatePartitions(t, downsample(src.drop("date"), res, tagCols),
          affected.toSeq.sorted, retainHistory = retainHistory)
    }
  }

  /**
   * Rollup CONSISTENCY audit: for each cascade hop, recompute the
   * `[fromDate, toDate]` window from the source tier and compare
   * against what the target tier actually stores — the "can I trust my
   * rollups" report that catches a missed maintain, a partial publish
   * restored from backup, or writes that bypassed the router. Returns
   * one row per (tier, measurement, date) with row-level counts:
   *
   *   n_expected / n_actual   — recomputed vs stored (window, series) rows
   *   n_missing / n_extra     — keys on one side only
   *   n_value_mismatch        — keys on both sides whose values differ
   *                             beyond `tolerance` (summation-order ulps
   *                             pass; real corruption does not)
   *
   * A clean window reports every mismatch column 0 — repair with
   * [[backfill]]. Scale shape: per hop, two partition-pruned window
   * scans and ONE shuffle on the rollup key (the recompute's own
   * grouping); the comparison join is on already-aggregated rollup
   * rows, orders of magnitude smaller than raw.
   */
  def verifyRollups(store: graft.store.TierStore, fromDate: String,
      toDate: String, tagCols: Seq[String] = defaultTagCols,
      tolerance: Double = 1e-6,
      hops: Seq[(Tier, Tier)] = Nil): org.apache.spark.sql.DataFrame = {
    val from = java.sql.Date.valueOf(fromDate)
    val to = java.sql.Date.valueOf(toDate)
    require(!from.after(to), s"verify window is inverted: $fromDate > $toDate")
    import org.apache.spark.sql.functions._
    // default (Nil): audit EVERYTHING maintenance maintains — the fixed
    // cascade plus every registered CQ; an explicit hop list scopes the
    // audit (its resolution comes from the tier policy, or from the
    // matching CQ registration for custom hops)
    val resolved: Seq[(Tier, Tier, Long)] =
      if (hops.isEmpty)
        Tier.cascade.map { case (f, t) =>
          (f, t, TierPolicy.tierResolutionMinutes(t, Tier.ProfileOptimized))
        } ++ store.continuousQueries.flatMap { cq =>
          for (f <- store.tierByName(cq.src); t <- store.tierByName(cq.target))
            yield (f, t, cq.resolutionMinutes)
        }
      else hops.map { case (f, t) =>
        val polRes = TierPolicy.tierResolutionMinutes(t, Tier.ProfileOptimized)
        val res =
          if (polRes > 0) polRes
          else store.continuousQueries
            .find(cq => cq.src == f.name && cq.target == t.name)
            .map(_.resolutionMinutes)
            .getOrElse(throw new IllegalArgumentException(
              s"no resolution known for hop ${f.name} -> ${t.name}"))
        (f, t, res)
      }
    val reports = resolved.map { case (f, t, res) =>
      def window(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("date") >= from && col("date") <= to)
      val src = window(store.read(f))
      val present = tagCols.filter(src.columns.contains)
      val keys = Seq("measurement") ++ present :+ "time"
      // null-safe key equality: tag columns are nullable, and a
      // name-list join would mark every null-tagged series missing+extra
      def keyed(df: org.apache.spark.sql.DataFrame, vAlias: String) =
        present.foldLeft(df)((d, k) =>
            d.withColumn(k, coalesce(col(k).cast("string"), lit("\u0000"))))
          .select((keys.map(col) :+ col("value").as(vAlias)): _*)
      // key PRESENCE is carried by its own flag (`_pe`) / the actual
      // side's row count (`_c` ≥ 1 wherever the key exists): a
      // legitimately NULL aggregate value (e.g. avg over all-null
      // source values) must still count as present, not as a
      // missing/extra pair — value non-nullness is not key presence
      val expected = keyed(downsample(src.drop("date"), res, present), "v_exp")
        .withColumn("_pe", lit(1))
      // pre-aggregate the ACTUAL side per rollup key: a duplicate-key
      // defect (the same window double-appended) must be COUNTED as
      // extra copies, not silently multiply the join — expected is one
      // row per key by construction (a group-by output), actual is
      // whatever the tier really stores
      val actual = keyed(window(store.read(t)).drop("date"), "v_act")
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_c"), min(col("v_act")).as("_vmin"),
          max(col("v_act")).as("_vmax"))
      val matched = col("_pe").isNotNull && col("_c").isNotNull
      // null-safe value agreement: both-NULL agrees, NULL-vs-value
      // disagrees, two values agree within tolerance
      def agrees(a: Column, b: Column) =
        (a.isNull && b.isNull) ||
          (a.isNotNull && b.isNotNull && abs(a - b) <= tolerance)
      expected.join(actual, keys, "full_outer")
        .select(col("measurement"),
          to_date(col("time")).cast("string").as("date"),
          col("_pe"), col("v_exp"), col("_c"), col("_vmin"), col("_vmax"))
        .groupBy("measurement", "date")
        .agg(count(col("_pe")).as("n_expected"),
          sum(coalesce(col("_c"), lit(0L))).as("n_actual"),
          sum(when(col("_pe").isNotNull && col("_c").isNull, 1L)
            .otherwise(0L)).as("n_missing"),
          // ghost keys contribute all copies; matched keys their surplus
          sum(coalesce(col("_c"), lit(0L)) - when(matched, 1L).otherwise(0L))
            .as("n_extra"),
          sum(when(matched && !(agrees(col("_vmin"), col("v_exp")) &&
            agrees(col("_vmax"), col("v_exp"))), 1L).otherwise(0L))
            .as("n_value_mismatch"))
        .withColumn("tier", lit(t.name))
        .select("tier", "measurement", "date", "n_expected", "n_actual",
          "n_missing", "n_extra", "n_value_mismatch")
    }
    reports.reduce(_ unionAll _)
  }

  /**
   * The maintenance job the reference gets from InfluxDB's continuous
   * queries: rebuild each rollup tier of the store from the tier below,
   * restricted to `sinceDays` of recent data (incremental — CQs also only
   * re-aggregate the recent window), and run retention expiry. Each hop
   * reads the (already much smaller) previous rollup, never raw twice.
   * `retainHistory = true` keeps every superseded snapshot the pass
   * replaces AND defers retention expiry (expiry deletes whole date
   * partitions, which no snapshot protects) so
   * [[graft.store.TierStore.readAsOf]] can pin pre-pass corpus states
   * across ALL tiers; reclaim space — and re-enforce retention — with
   * `vacuumTier` per tier plus a later plain maintain.
   */
  def maintain(store: graft.store.TierStore, now: java.time.Instant,
      sinceDays: Int = 3, tagCols: Seq[String] = defaultTagCols,
      retainHistory: Boolean = false): Unit = {
    val cutoff = java.sql.Date.valueOf(
      java.time.LocalDate.ofInstant(now, java.time.ZoneOffset.UTC).minusDays(sinceDays))
    // the fixed cascade, then the user-registered CQs in registration
    // order (a CQ chained off a rollup tier sees it already refreshed);
    // a CQ whose tier was deleted since registration is skipped, same
    // as InfluxDB running a CQ against a dropped RP
    val hops: Seq[(Tier, Tier, Long)] =
      Tier.cascade.map { case (f, t) =>
        (f, t, TierPolicy.tierResolutionMinutes(t, Tier.ProfileOptimized))
      } ++ store.continuousQueries.flatMap { cq =>
        for (f <- store.tierByName(cq.src); t <- store.tierByName(cq.target))
          yield (f, t, cq.resolutionMinutes)
      }
    hops.foreach { case (from, to, res) =>
      val src = store.read(from).filter(org.apache.spark.sql.functions.col("date") >= cutoff)
      // ONE pass answers both "is the window empty?" and "which dates?"
      // (the separate isEmpty probe paid an extra scan job per hop —
      // guide §1.2: don't compute things twice). Dates collect as
      // STRINGS: decoding DateType to java.sql.Date needs `--add-opens
      // java.base/sun.util.calendar` on JDK 17+, which a bare
      // `java -cp` driver may not carry.
      val dates = src.select(org.apache.spark.sql.functions.col("date")
        .cast("string")).distinct().collect().map(_.getString(0))
      if (dates.nonEmpty) {
        // replace the recent window in the target tier atomically per
        // partition: the fresh rollup is fully staged before any live
        // partition moves (TierStore.replaceDatePartitions' two-rename
        // publish) — the old drop-then-append left the window missing
        // for the whole aggregation job under concurrent readers
        store.replaceDatePartitions(to, downsample(src.drop("date"), res, tagCols),
          dates.toSeq, retainHistory = retainHistory)
      }
      // retention expiry physically DELETES whole date partitions — no
      // snapshot protects them — so with retainHistory it is deferred
      // too: run a plain maintain (or expire explicitly) once no run
      // still pins a pre-expiry timestamp
      if (!retainHistory) store.expire(to, now)
      store.compact(to, retainHistory = retainHistory)
    }
    if (!retainHistory) {
      store.expire(graft.model.Tier.GenRaw, now)
      store.expire(graft.model.Tier.GenDefault, now)
    }
    store.compact(graft.model.Tier.GenRaw, retainHistory = retainHistory)
    store.compact(graft.model.Tier.GenDefault, retainHistory = retainHistory)
  }
}
