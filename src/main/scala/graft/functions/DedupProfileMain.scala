package graft.functions

import graft._
import org.apache.spark.sql.functions._

/**
 * Diagnostic harness for the streaming indexed-dedup path (round-7
 * VERDICT ask #3): stage-level timing of one micro-batch's components,
 * then end-to-end `Pipeline.streamingIndexedDedup` throughput at two
 * chunkings of the same corpus — the fixed-overhead vs per-row cost
 * split that explains the soak's rows/s figure. Results recorded in
 * BENCH_NOTES.md ("streaming indexed dedup").
 *
 * Usage: runMain graft.functions.DedupProfileMain [docsParquet]
 */
object DedupProfileMain {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("tmp-sf1/documents.parquet")
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def rm(p: String): Unit = fs.delete(new org.apache.hadoop.fs.Path(p), true)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ---- stage-level timing, one 5k-doc batch (after codegen warm) ----
    val docs = spark.read.parquet(docsPath)
      .filter(col("doc_id") < 5000).select(col("doc_id"), col("text"))
    val idx = "/tmp/dedup_prof_idx"
    rm(idx)
    Dedup.shingledDocs(docs.limit(100), 3, 64, "doc_id", "text").count() // warm
    val sh = time("shingledDocs+persist") {
      val s = Dedup.shingledDocs(docs, 3, 64, "doc_id", "text").persist(); s.count(); s
    }
    val dropIntra = time("pairsFromShingled") {
      val d = Dedup.pairsFromShingled(sh, 64, 16, 0.8, Dedup.DefaultChainMaxBucket)
        .select(col("id_b").as("id")).persist(); d.count(); d
    }
    time("query empty idx") {
      Dedup.queryIndexFromShingled(spark,
        sh.join(dropIntra, Seq("id"), "left_anti"), idx, 3, 64, 16, 0.8).count()
    }
    val clean = time("clean anti-join+sink write") {
      val c = docs.join(dropIntra.withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left_anti")
      c.write.mode("overwrite").parquet("/tmp/dedup_prof_out"); c
    }
    time("index build (survivors)") {
      Dedup.buildMinhashIndex(clean, idx, 3, 64, 16)
    }
    val docs2 = spark.read.parquet(docsPath)
      .filter(col("doc_id") >= 5000 && col("doc_id") < 10000)
      .select(col("doc_id"), col("text"))
    val sh2 = time("batch2 shingled+persist") {
      val s = Dedup.shingledDocs(docs2, 3, 64, "doc_id", "text").persist(); s.count(); s
    }
    val drop2 = time("batch2 pairs") {
      val d = Dedup.pairsFromShingled(sh2, 64, 16, 0.8, Dedup.DefaultChainMaxBucket)
        .select(col("id_b").as("id")).persist(); d.count(); d
    }
    time("batch2 query populated idx") {
      Dedup.queryIndexFromShingled(spark, sh2.join(drop2, Seq("id"), "left_anti"),
        idx, 3, 64, 16, 0.8).count()
    }
    sh.unpersist(); dropIntra.unpersist(); sh2.unpersist(); drop2.unpersist()

    // ---- end-to-end throughput vs chunking (same corpus both runs) ----
    val all = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    val total = all.count()
    val configs = Seq((10, 0), (10, 4), (2, 0))
    configs.zipWithIndex.foreach { case ((nChunks, compactEvery), ci) =>
      val work = s"/tmp/dedup_prof_e2e_$ci"
      rm(work)
      SoakUtil.writeChunks(spark, all, "doc_id", s"$work/in", nChunks)
      val t0 = System.nanoTime()
      val q = Pipeline.streamingIndexedDedup(
        SoakUtil.streamDir(spark, s"$work/in", all.schema),
        s"$work/idx", s"$work/ckpt",
        cleanB => cleanB.write.mode("append").parquet(s"$work/out"),
        compactEvery = compactEvery)
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val survivors = spark.read.parquet(s"$work/out").count()
      val idxFiles = Seq("buckets", "shingles").map { t =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/idx/$t"))
          .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
      }.sum
      println(f"E2E chunks=$nChunks%-3d compactEvery=$compactEvery " +
        f"docs=$total wall=$wall%.1f s docs_per_sec=${total / wall}%.0f " +
        f"survivors=$survivors idx_files=$idxFiles")
    }
    spark.stop()
  }
}
