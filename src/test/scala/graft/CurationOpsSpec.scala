package graft

import graft.functions.{Export, Importance, Sampling, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 curation operators: SemDeDup semantic dedup, DSIR importance
 *  resampling, sharded JSONL export. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // --- SemDeDup ---

  test("semanticDedup keeps exactly one representative per near-dup cluster") {
    val tagged = Similarity.semanticDedup(emb, threshold = 0.4, nPlanes = 6)
    val rows = tagged.select("vec_id", "cluster", "kept")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == emb.count())
    // representative = min id of its cluster, kept flag consistent
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cl, members) =>
      assert(members.map(_._1).min == cl) // label is the component min
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cl)
    }
    // it actually deduplicates something on this corpus
    assert(rows.count(!_._3) > 0)
  }

  test("semanticDedup singletons are their own kept cluster") {
    val e = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.001f)), // near-dups
      (3L, Array(-1f, 0.2f))                        // unrelated
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(e, threshold = 0.99, nPlanes = 4)
      .select("vec_id", "cluster", "kept").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, true)))
    assert(out(1) == ((2L, 1L, false)))
    assert(out(2) == ((3L, 3L, true)))
  }

  // --- DSIR importance weights ---

  test("importance weights prefer target-like documents") {
    val target = Seq((100L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta"),   // looks like the target
      (2L, "gamma delta gamma delta"), // does not
      (3L, "alpha beta gamma delta")   // mixed
    ).toDF("doc_id", "text")
    val w = Importance.weights(raw, target, raw, nBuckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L))
  }

  test("importance weights: short docs carry zero evidence") {
    val one = Seq((1L, "single"), (2L, "")).toDF("doc_id", "text")
    val w = Importance.weights(one, one, one, nBuckets = 16)
      .as[(Long, Long, Long)].collect()
    assert(w.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("selectTop takes exactly ceil(frac*n) rows, ties broken by id") {
    val scored = Seq(
      (1L, 2L, 50L), (2L, 2L, 40L), (3L, 2L, 40L), (4L, 2L, 40L), (5L, 2L, 10L)
    ).toDF("doc_id", "n_feat", "iw_q4")
    val kept = Importance.selectTop(scored, 0.6) // k = 3
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L)) // 50, then the two smallest-id 40s
  }

  test("resample is a semi-join back to original columns") {
    val out = Importance.resample(docs, docs.filter($"source" === "src0"),
      frac = 0.3, nBuckets = 512)
    assert(out.columns.toSeq == docs.columns.toSeq)
    val n = docs.count()
    assert(out.count() == math.ceil(n * 0.3).toLong)
  }

  // --- JSONL export ---

  test("jsonl shard round trip is lossless and manifest adds up") {
    val root = graft.Fixtures.newDir("graft_jsonl_spec")
      .toFile.getAbsolutePath
    val manifest = Export.writeJsonlShards(docs, root, "doc_id", 4)
      .as[(Long, Long, Long)].collect()
    assert(manifest.map(_._2).sum == docs.count())
    assert(manifest.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    // bytes in the manifest match what landed on disk (newline-terminated)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    manifest.foreach { case (shard, _, bytes) =>
      val sz = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/shard=$shard"))
        .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen).sum
      assert(sz == bytes, s"shard $shard on-disk $sz vs manifest $bytes")
    }
    val back = Export.readJsonlShards(spark, root, docs.schema)
    assert(back.count() == docs.count())
    // column-for-column equality, including the derived shard assignment
    val expected = docs.withColumn("shard", Export.shardCol($"doc_id", 4))
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }

  test("jsonl reader prunes to the filtered shard directories") {
    val root = graft.Fixtures.newDir("graft_jsonl_prune")
      .toFile.getAbsolutePath
    Export.writeJsonlShards(docs, root, "doc_id", 4)
    val one = Export.readJsonlShards(spark, root, docs.schema)
      .filter($"shard" === 2L)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || one.count() ==
      docs.withColumn("s", Export.shardCol($"doc_id", 4)).filter($"s" === 2).count())
    // shard survives as a partition column → equality with direct compute
    assert(one.count() ==
      docs.withColumn("s", Export.shardCol($"doc_id", 4)).filter($"s" === 2).count())
  }

  // --- BPE pre-tokenizer ---

  test("bpe pre-tokenizer splits contractions, attaches spaces, keeps case") {
    val out = Seq("I'll see 42 dogs, Anna's Dog!").toDF("text")
      .select(graft.functions.TextFunctions.bpeTokens($"text").as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("I", "'ll", " see", " 42", " dogs", ",", " Anna", "'s",
      " Dog", "!"))
    assert(out.mkString == "I'll see 42 dogs, Anna's Dog!") // lossless cover
  }

  test("shard assignment is the portable md5 slice") {
    val got = docs.select($"doc_id", Export.shardCol($"doc_id", 8).as("s"))
      .as[(Long, Long)].collect().toMap
    val exp = docs.select($"doc_id",
      (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 8).as("s")).as[(Long, Long)].collect().toMap
    assert(got == exp)
  }
}
