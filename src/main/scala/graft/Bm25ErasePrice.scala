package graft

import org.apache.spark.sql.functions._

/**
 * Pricing probe for the BM25 erase-stats strategy (VERDICT r12 ask #3):
 * the current implementation RECOMPUTES (n_docs, total_dl) from the
 * surviving postings after every erase — O(index), crash-converging by
 * construction — while the staged-delta-journal alternative would pay
 * O(hits) per erase at the cost of an exactly-once journal protocol.
 * This probe separates the erase pass into its components on the sf1
 * index so the choice is made by measurement:
 *
 *   build_sec     one-time index build over the corpus
 *   recount_sec   the survivor recount alone (the current stats step:
 *                 distinct (doc_id, dl) over ALL postings + zero-docs)
 *   delta_sec     the O(hits) alternative's compute: the same aggregate
 *                 over postings FILTERED to the erase ids (term-shard
 *                 scan narrowed by the id predicate) — journal I/O
 *                 (one tiny file write + read) would add ~ms
 *   erase_sec     the full current erase pass (rewrite + recount +
 *                 unconditional vacuum), for the recount's share
 *
 * Findings land in BENCH_NOTES.md "Round-13: BM25 erase-stats pricing".
 *
 * Usage: runMain graft.Bm25ErasePrice [sfDir] [workDir] [nIds]
 */
object Bm25ErasePrice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val work = args.lift(1).getOrElse(
      graft.Fixtures.newDir("graft_bm25price")
        .toFile.getAbsolutePath)
    val nIds = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val idx = s"$work/idx"
    val buildSec = sec(graft.functions.Retrieval.buildBm25Index(docs, idx))
    val ids = (0 until nIds).map(i => i.toLong * 7L + 1L)

    // component A: the survivor recount (what the current erase pays
    // for stats, measured standalone on the un-erased index)
    val recountSec = sec {
      graft.functions.Retrieval.readPostings(spark, idx)
        .select(col("doc_id"), col("dl").cast("long").as("dl")).distinct()
        .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).collect(): Unit
      graft.functions.Retrieval.readZeroDocs(spark, idx)
        .select("doc_id").distinct().count(): Unit
    }
    // component B: the O(hits) delta compute the journal design would
    // pay instead (id-filtered aggregate + one tiny journal roundtrip)
    val deltaSec = sec {
      graft.functions.Retrieval.readPostings(spark, idx)
        .filter(col("doc_id").isin(ids: _*))
        .select(col("doc_id"), col("dl").cast("long").as("dl")).distinct()
        .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).collect(): Unit
      graft.functions.Retrieval.readZeroDocs(spark, idx)
        .filter(col("doc_id").isin(ids: _*)).distinct().count(): Unit
    }
    // the full current erase pass, for the recount's share of the total
    var erased = 0L
    val eraseSec = sec {
      erased = graft.functions.Retrieval.eraseFromBm25Index(spark, idx, ids)
    }
    println(f"""{"bm25_erase_price":{"sf":"$sfDir","n_docs":$nDocs,""" +
      f""""n_ids":$nIds,"erased":$erased,"build_sec":$buildSec%.2f,""" +
      f""""recount_sec":$recountSec%.2f,"delta_sec":$deltaSec%.2f,""" +
      f""""erase_sec":$eraseSec%.2f,""" +
      f""""recount_share":${recountSec / eraseSec}%.2f}}""")
    spark.stop()
  }
}
