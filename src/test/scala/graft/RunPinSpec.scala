package graft

import graft.functions.{Dedup, Similarity}
import graft.run.RunPin
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-store run pins: one persisted manifest reproducing the exact
 * capture-time state of every store a training run reads — tier
 * store, IVF index, MinHash index — across later appends, folds, and
 * manifest reloads; guarded resolution (wrong kind/path refuses);
 * atomic persistence (a torn manifest is loud, never a silent
 * part-vector).
 */
class RunPinSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = graft.Fixtures
    .newDir("graft_runpin").toFile.getAbsolutePath

  private def clustered(from: Int, until: Int): DataFrame =
    spark.range(from.toLong, until.toLong).select(col("id").as("vec_id"),
      array(
        when(col("id") % 2 === 0, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        when(col("id") % 2 === 1, lit(1.0f) + col("id").cast("float") / 1000f)
          .otherwise(lit(0.01f)).cast("float"),
        lit(0.02f), lit(0.03f)).as("embedding"))

  private def doc(i: Int) = (i.toLong,
    s"alpha beta gamma delta epsilon zeta eta theta token$i tail$i")

  private def pts(ids: Range): DataFrame =
    ids.map(i => ("m1", new java.sql.Timestamp(1700000000000L + i * 1000L),
      i.toDouble, s"d$i", "0", "sensor", "import", s"m1;$i"))
      .toDF("measurement", "time", "value", "dev_id", "location_id",
        "dev_type", "dir", "series_id")

  test("one saved manifest reproduces tier + IVF + MinHash exactly " +
    "across phase-B appends and history-retaining folds everywhere") {
    val work = tmpDir()
    val store = new graft.store.TierStore(spark, s"$work/store")
    val tier = graft.model.Tier.GenRaw
    store.write(tier, pts(0 until 20))
    Similarity.buildIvfIndex(clustered(0, 20), s"$work/idx", nLists = 4,
      trainIters = 1)
    Dedup.buildMinhashIndex((0 until 8).map(doc).toDF("doc_id", "text"),
      s"$work/mh", n = 3, k = 16, bands = 4)
    val pin = RunPin.capture(spark, Seq(
      "ann" -> RunPin.Ivf(s"$work/idx"),
      "dedup" -> RunPin.Minhash(s"$work/mh"),
      "corpus" -> RunPin.Tier(store)))
    RunPin.save(spark, pin, s"$work/run.pin")
    val probe = clustered(0, 2)
    val annBefore = Similarity.queryIvfIndex(spark, s"$work/idx", probe,
      k = 5, nProbes = 4).select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    // phase B lands everywhere, then history-retaining folds
    store.write(tier, pts(100 until 120))
    assert(Similarity.appendIvfBatch(clustered(100, 110), s"$work/idx", 0L))
    assert(Dedup.appendShingledToIndexBatch(
      Dedup.shingledDocs((100 until 108).map(doc).toDF("doc_id", "text"),
        3, 16, "doc_id", "text"), s"$work/mh", 3, 16, 4, 0L))
    store.compact(tier, minFiles = 1, retainHistory = true): Unit
    Similarity.compactIvfLists(spark, s"$work/idx", minFiles = 2,
      retainHistory = true): Unit
    Dedup.compactMinhashIndex(spark, s"$work/mh", minFiles = 2,
      retainHistory = true): Unit
    // resolve EVERYTHING through the loaded manifest
    val loaded = RunPin.load(spark, s"$work/run.pin")
    assert(loaded == pin, "manifest round-trip changed the pin vector")
    val corpus = RunPin.tierRead(loaded, "corpus", store, tier)
    assert(corpus.select("dev_id").as[String].collect().toSet ==
      (0 until 20).map(i => s"d$i").toSet, "pinned corpus leaked phase B")
    val ann = Similarity.queryIvfIndex(spark, s"$work/idx", probe, k = 5,
      nProbes = 4, asOf = Some(RunPin.ivfPin(loaded, "ann", s"$work/idx")))
      .select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    assert(ann == annBefore, "pinned ANN probe diverged")
    val hits = Dedup.queryMinhashIndex(spark,
      Seq((9000L, doc(3)._2), (9001L, doc(103)._2)).toDF("doc_id", "text"),
      s"$work/mh", n = 3, k = 16, bands = 4, threshold = 0.5,
      asOf = Some(RunPin.minhashPin(loaded, "dedup", s"$work/mh")))
      .select("id_idx").as[Long].collect().toSet
    assert(hits.nonEmpty && hits.forall(_ < 100L),
      s"pinned dedup query leaked phase B: $hits")
  }

  test("Bm25 member: a pinned BM25 query reproduces across an erase " +
    "through the loaded manifest") {
    import graft.functions.Retrieval
    val work = tmpDir()
    def d(i: Int) = (i.toLong, s"table hash merge scan alpha$i")
    Retrieval.buildBm25Index((0 until 20).map(d).toDF("doc_id", "text"),
      s"$work/bm")
    // an erase DESTROYS history by contract — so pin AFTER the first
    // erase and prove the manifest reproduces across a SECOND one...
    Retrieval.eraseFromBm25Index(spark, s"$work/bm", Seq(7L)): Unit
    val pin = RunPin.capture(spark, Seq("lex" -> RunPin.Bm25(s"$work/bm")))
    RunPin.save(spark, pin, s"$work/run.pin")
    val before = Retrieval.queryBm25Index(spark, s"$work/bm",
      Seq("table"), k = 30).as[(Long, Long)].collect().toSeq
    val loaded = RunPin.load(spark, s"$work/run.pin")
    val pinned = Retrieval.queryBm25Index(spark, s"$work/bm",
      Seq("table"), k = 30,
      asOf = Some(RunPin.bm25Pin(loaded, "lex", s"$work/bm")))
      .as[(Long, Long)].collect().toSeq
    assert(pinned == before && before.length == 19)
    // ...and that the second erase makes the pin loudly stale
    Retrieval.eraseFromBm25Index(spark, s"$work/bm", Seq(3L)): Unit
    intercept[IllegalStateException] {
      Retrieval.queryBm25Index(spark, s"$work/bm", Seq("table"), k = 30,
        asOf = Some(RunPin.bm25Pin(loaded, "lex", s"$work/bm"))).count()
    }
    intercept[IllegalArgumentException] {
      RunPin.ivfPin(loaded, "lex", s"$work/bm") // wrong kind refuses
    }
  }

  test("guarded resolution: wrong member, wrong kind, and wrong path " +
    "all refuse loudly") {
    val work = tmpDir()
    Similarity.buildIvfIndex(clustered(0, 10), s"$work/idx", nLists = 2,
      trainIters = 1)
    Similarity.buildIvfIndex(clustered(0, 10), s"$work/idx2", nLists = 2,
      trainIters = 1)
    val pin = RunPin.capture(spark, Seq("ann" -> RunPin.Ivf(s"$work/idx")))
    intercept[NoSuchElementException] { pin.pinOf("nope") }
    // wrong kind
    intercept[IllegalArgumentException] {
      RunPin.minhashPin(pin, "ann", s"$work/idx")
    }
    // wrong path: run A's manifest must not pin run B's index
    intercept[IllegalArgumentException] {
      RunPin.ivfPin(pin, "ann", s"$work/idx2")
    }
    assert(RunPin.ivfPin(pin, "ann", s"$work/idx") == pin.pinOf("ann"))
    // duplicate member names refuse at capture
    intercept[IllegalArgumentException] {
      RunPin.capture(spark, Seq("a" -> RunPin.Ivf(s"$work/idx"),
        "a" -> RunPin.Ivf(s"$work/idx2")))
    }
  }

  test("persistence is atomic and loud: missing manifest, torn write, " +
    "and overwrite all behave") {
    val work = tmpDir()
    Similarity.buildIvfIndex(clustered(0, 10), s"$work/idx", nLists = 2,
      trainIters = 1)
    val pin = RunPin.capture(spark, Seq("ann" -> RunPin.Ivf(s"$work/idx")))
    intercept[IllegalArgumentException] {
      RunPin.load(spark, s"$work/absent.pin")
    }
    RunPin.save(spark, pin, s"$work/run.pin")
    assert(RunPin.load(spark, s"$work/run.pin") == pin)
    // a torn manifest (no trailing ok) is loud
    val p = new HPath(s"$work/torn.pin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("graft-run-pin v2\nann\tivf\tx\tm%3D5%3Bl%3D%3Bs%3D\n".getBytes("UTF-8"))
    finally out.close()
    intercept[IllegalArgumentException] { RunPin.load(spark, s"$work/torn.pin") }
    // overwrite: a re-save replaces the old vector atomically
    assert(Similarity.appendIvfBatch(clustered(100, 105), s"$work/idx", 0L))
    val pin2 = RunPin.capture(spark, Seq("ann" -> RunPin.Ivf(s"$work/idx")))
    assert(pin2.pinOf("ann") != pin.pinOf("ann"),
      "a later capture must occupy a later ledger position")
    RunPin.save(spark, pin2, s"$work/run.pin")
    assert(RunPin.load(spark, s"$work/run.pin") == pin2)
    // names and paths survive encoding round trips
    val odd = RunPin(Map("we ird/na=me" ->
      RunPin.Entry("ivf", "/tmp/pa th/with=eq\tand tab",
        graft.store.AsOfPin(Map("w w" -> 7L),
          Map("/di=r;x" -> 2L, "s:eq" -> 3L), 7L))))
    RunPin.save(spark, odd, s"$work/odd.pin")
    assert(RunPin.load(spark, s"$work/odd.pin") == odd)
  }

  test("a pin resolved past vacuumed history keeps the per-store LOUD " +
    "contract through the run-pin arms") {
    val work = tmpDir()
    Similarity.buildIvfIndex(clustered(0, 10), s"$work/idx", nLists = 2,
      trainIters = 1)
    assert(Similarity.appendIvfBatch(clustered(100, 105), s"$work/idx", 0L))
    val pin = RunPin.capture(spark, Seq("ann" -> RunPin.Ivf(s"$work/idx")))
    RunPin.save(spark, pin, s"$work/run.pin")
    assert(Similarity.appendIvfBatch(clustered(200, 205), s"$work/idx", 1L))
    // a NON-retaining fold + vacuum destroys the pinned history
    Similarity.compactIvfLists(spark, s"$work/idx", minFiles = 2): Unit
    Similarity.vacuumIvfIndex(spark, s"$work/idx")
    val loaded = RunPin.load(spark, s"$work/run.pin")
    intercept[IllegalStateException] {
      Similarity.readIvfLists(spark, s"$work/idx",
        asOf = Some(RunPin.ivfPin(loaded, "ann", s"$work/idx"))).count()
    }
  }
}
