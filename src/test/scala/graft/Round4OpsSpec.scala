package graft

import graft.functions.{Decontaminate, Profile, Retrieval, RuleFilters, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 operators: BM25 retrieval, bloom-prefiltered decontamination,
 *  deterministic corpus shuffle, column profiling, C4 rule filtering. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // --- BM25 ---

  test("bm25: higher tf wins at equal length, absent docs excluded") {
    val d = Seq(
      (1L, "table table chair"),
      (2L, "table chair chair"),
      (3L, "chair lamp sofa")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, Seq("table"), k = 10)
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // ranked, doc 3 absent
    assert(out(0)._2 > out(1)._2)
  }

  test("bm25: length normalization prefers the shorter doc at equal tf") {
    val d = Seq(
      (1L, "table chair"),
      (2L, "table chair lamp sofa desk bed rug shelf")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, Seq("table"), k = 10)
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("bm25: k caps the result with (score desc, id) tie-break") {
    val d = Seq.tabulate(6)(i => (i.toLong, "table chair")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, Seq("table"), k = 3)
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L)) // all tied → smallest ids
  }

  test("persisted BM25 index reproduces the direct path with pruned shards") {
    val root = graft.Fixtures.newDir("graft_bm25_spec")
      .toFile.getAbsolutePath
    Retrieval.buildBm25Index(docs, root)
    val q = Retrieval.queryBm25Index(spark, root, Seq("table", "hash"), k = 15)
    val direct = Retrieval.bm25TopK(docs, Seq("table", "hash"), k = 15)
      .as[(Long, Long)].collect().toSeq
    assert(q.as[(Long, Long)].collect().toSeq == direct)
    // the postings scan is partition-pruned to the query terms' shards
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"))
  }

  // --- bloom-prefiltered decontamination ---

  test("bloom decon is bit-identical to the exact overlap") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val exact = Decontaminate.flagContaminated(corpus, bench, n = 3)
      .as[(Long, Long)].collect().toSet
    val bloom = Decontaminate.flagContaminatedBloom(corpus, bench, n = 3,
      expectedItems = 10000L).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && bloom == exact)
  }

  // --- deterministic shuffle ---

  test("shuffle positions are a permutation equal to the global rank") {
    val out = Sampling.deterministicShuffle(docs, "doc_id", seed = "s1")
    val n = docs.count()
    val pos = out.select("position").as[Long].collect().sorted
    assert(pos.toSeq == (0L until n))
    // equality with the single-window definition of the same order
    val u = Sampling.portableUniform(concat_ws(":", lit("s1"), $"doc_id"))
    val ref = docs.withColumn("_u", u)
      .withColumn("p", row_number().over(Window.orderBy($"_u", $"doc_id")) - 1)
      .select($"doc_id", $"p".cast("long")).as[(Long, Long)].collect().toMap
    val got = out.select("doc_id", "position").as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("shuffle order is seed-dependent but layout-independent") {
    val a = Sampling.deterministicShuffle(docs, "doc_id", seed = "s1")
      .select("doc_id", "position").as[(Long, Long)].collect().toMap
    val b = Sampling.deterministicShuffle(docs.repartition(7), "doc_id", seed = "s1")
      .select("doc_id", "position").as[(Long, Long)].collect().toMap
    val c = Sampling.deterministicShuffle(docs, "doc_id", seed = "s2")
      .select("doc_id", "position").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a != c)
  }

  // --- column profiler ---

  test("profile counts nulls, distincts and min/max per column") {
    val d = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(-0.25)),
      (Some(2L), Some("b"), None)).toDF("id", "s", "v")
    val rows = Profile.columns(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = rows("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 && id.getLong(3) == 2)
    assert(id.getLong(4) == 1000000L && id.getLong(5) == 2000000L)
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    val v = rows("v")
    assert(v.getLong(2) == 1 && v.getLong(4) == -250000L && v.getLong(5) == 1500000L)
  }

  test("profile approx mode plans without an expand of the input") {
    val plan = Profile.columns(docs, Seq("doc_id", "source"),
      approxDistinct = true).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  // --- native vector-sum aggregate / centroids ---

  test("labelCentroids equals the posexplode formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = graft.functions.Similarity.labelCentroids(emb)
      .select($"group", $"n", posexplode($"sum_q6"))
      .select($"group", $"n", $"pos", $"col")
      .as[(Int, Long, Int, Long)].collect().toSet
    val ref = emb.select($"label", posexplode($"embedding"))
      .groupBy($"label", $"pos")
      .agg(sum(floor($"col".cast("double") * 1e6 + 0.5).cast("long")).as("q"))
      .join(emb.groupBy($"label").agg(count(lit(1)).as("n")), "label")
      .select($"label", $"n", $"pos", $"q")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("vector-sum aggregate is layout-independent; null vectors skipped") {
    val d = Seq(
      (1, Some(Array(1.0f, 2.0f))),
      (1, Some(Array(0.5f, -1.0f))),
      (1, None),
      (2, Some(Array(3.0f, 4.0f)))).toDF("label", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Similarity.labelCentroids(df)
        .select($"group", $"n", $"sum_q6").as[(Int, Long, Seq[Long])]
        .collect().toSet
    val a = run(d)
    assert(a == run(d.repartition(13)))
    assert(a == Set((1, 2L, Seq(1500000L, 1000000L)), (2, 1L, Seq(3000000L, 4000000L))))
  }

  test("trainCentroids is deterministic under repartitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def train(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Similarity.trainCentroids(df, k = 4, iters = 2)
        .select($"list_id", $"centroid").as[(Long, Seq[Double])]
        .collect().toMap
    assert(train(emb) == train(emb.repartition(7)))
  }

  // --- clusters fast path / random projection ---

  test("clusters driver fast path equals the iterative rounds") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 7L))
      .toDF("id_a", "id_b")
    val fast = graft.functions.Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toSet
    val iter = graft.functions.Dedup.clusters(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(fast == iter)
    assert(fast == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (7L, 7L)))
  }

  test("random projection sign bit is the LSH signature") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.select($"vec_id",
      graft.functions.expressions.VectorExpressions
        .randomProjectionQ6($"embedding", 6).as("y"),
      graft.functions.expressions.VectorExpressions
        .lshSignature($"embedding", 6).as("sig"))
      .as[(Long, Seq[Long], Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (_, y, sig) =>
      val fromProj = y.zipWithIndex
        .map { case (v, p) => if (v >= 0) 1L << p else 0L }.sum
      // micro-unit quantization can only flip a hairline-zero dot; on
      // this data the signatures must agree exactly
      assert(fromProj == sig)
    }
  }

  // --- vocab coverage ---

  test("vocab coverage is monotone in size and reaches 1 at full vocab") {
    val cov = graft.functions.Vocab.coverage(docs, Seq(1, 10, 1000000))
      .as[(Long, Long)].collect().toMap
    assert(cov(1L) > 0 && cov(1L) < cov(10L))
    assert(cov(1000000L) == 1000000L) // every token covered
  }

  // --- learned quality classifier ---

  test("LR classifier learns the label and trains layout-independently") {
    import graft.functions.Classifier
    def train(df: org.apache.spark.sql.DataFrame) =
      Classifier.trainQualityLR(df, $"lang" === "en", dims = 64, iters = 3)
    val (scores, weights) = train(docs)
    val rows = scores.as[(Long, Long, Long)].collect()
    val pos = rows.filter(_._2 == 1L).map(_._3.toDouble)
    val neg = rows.filter(_._2 == 0L).map(_._3.toDouble)
    assert(pos.nonEmpty && neg.nonEmpty)
    // after 3 steps the english docs score higher on average
    assert(pos.sum / pos.size > neg.sum / neg.size)
    assert(weights.count() == 64)
    // deterministic under repartitioning — the quantized-gradient claim
    val (scores2, _) = train(docs.repartition(13))
    assert(scores2.as[(Long, Long, Long)].collect().toSet == rows.toSet)
    // inference with the trained weights reproduces the training scores
    val inferred = Classifier.scoreLR(docs, weights)
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _, s) => assert(inferred(id) == s) }
  }

  // --- blocklist ---

  test("blocklist predicate and broadcast semi-join forms agree") {
    import graft.functions.RuleFilters
    val pred = RuleFilters.blocklistFilter(docs, Seq("merge", "spill"))
      .select("doc_id").as[Long].collect().toSet
    val join = RuleFilters.blocklistFilter(docs, Seq("merge", "spill"),
      broadcastList = true).select("doc_id").as[Long].collect().toSet
    assert(pred == join)
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(pred.nonEmpty && pred != all) // it drops something, keeps something
  }

  // --- NFC normalization ---

  test("nfc folds combining sequences to precomposed forms") {
    val out = Seq(("cafe\u0301", "caf\u00e9"), ("a\u0303", "\u00e3"))
      .toDF("raw", "want")
      .select(graft.functions.expressions.VectorExpressions
        .nfcNormalize($"raw").as("got"), $"want")
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want) }
    // already-composed text is untouched
    val same = Seq(Tuple1("ma\u00f1ana plain ascii")).toDF("s")
      .select(graft.functions.expressions.VectorExpressions
        .nfcNormalize($"s")).as[String].head()
    assert(same == "ma\u00f1ana plain ascii")
  }

  // --- histogram ---

  test("histogram buckets exactly, with under/overflow buckets") {
    val d = Seq(-0.5, 0.0, 0.05, 0.1, 0.95, 1.0, 2.0).toDF("x")
    val out = graft.functions.Profile.histogram(d, $"x", 0.0, 1.0, 10)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(-1L -> 1L, 0L -> 2L, 1L -> 1L, 9L -> 1L, 10L -> 2L))
    // boundary value 0.1 lands in bucket 1, not 0 (edges are exact)
    assert(!out.contains(2L))
  }

  // --- corpus diff ---

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "same text"))
      .toDF("doc_id", "text")
    val next = Seq((2L, "gamma delta edited"), (3L, "SAME   text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup.corpusDiff(prev, next)
      .as[(Long, String)].collect().toMap
    // 3 is unchanged through normalization (case + whitespace collapse)
    assert(out == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"))
  }

  // --- token-budget mixture ---

  test("token-budget mixture: rates bind, monotone, unlisted untouched") {
    import graft.functions.{Sampling, TextFunctions}
    val toks = TextFunctions.tokenCount($"text")
    def kept(budgets: Map[String, Long]) =
      Sampling.mixtureToTokenBudget(docs, "source", "doc_id", toks, budgets)
        .select("doc_id").as[Long].collect().toSet
    val small = kept(Map("src0" -> 200L))
    val big = kept(Map("src0" -> 2000L))
    assert(small.subsetOf(big)) // monotone in the budget
    // unlisted sources keep everything
    val all = docs.filter($"source" =!= "src0").select("doc_id")
      .as[Long].collect().toSet
    assert(all.subsetOf(small))
    // the kept token mass of the capped source is near its budget
    val keptTokens = Sampling.mixtureToTokenBudget(docs, "source", "doc_id",
        toks, Map("src0" -> 200L))
      .filter($"source" === "src0").agg(sum(toks)).as[Long].head()
    assert(keptTokens < 600, s"kept $keptTokens tokens for a 200 budget")
  }

  // --- BPE merge training ---

  test("learnMerges reproduces the classic fixture sequence") {
    // low×5 lower×2 newest×6 widest×3 (Sennrich-style, chars only):
    // (e,s) and (s,t) tie at 9 → lexicographic; then (es,t); then (l,o)
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = graft.functions.Vocab.learnMerges(freqs, 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("applyMerges matches the classic scan, including symbol runs") {
    val out = Seq((1L, "newest aaaa low"))
      .toDF("doc_id", "text")
      .select(graft.functions.Vocab.applyMerges($"text",
        Seq(("e", "s"), ("es", "t"), ("a", "a"))).as("p"))
      .as[Seq[String]].head()
    // newest → n e w est; aaaa → aa aa (left-to-right non-overlap);
    // low untouched
    assert(out == Seq("n", "e", "w", "est", "aa", "aa", "l", "o", "w"))
  }

  test("applyMerges property: replace chain ≡ classic scan on random input") {
    import org.scalacheck.{Gen, Prop}
    // reference: one left-to-right non-overlapping scan per rank
    def classic(word: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (l, r)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    val genWord = Gen.nonEmptyListOf(Gen.oneOf('a', 'b')).map(_.mkString)
    val genWords = Gen.nonEmptyListOf(genWord).map(_.take(5))
    val genMergeCount = Gen.choose(0, 6)
    checkProp(Prop.forAll(genWords, genMergeCount) { (words, nm) =>
      // learn merges from the words themselves so they are realistic
      val merges = graft.functions.Vocab.learnMerges(
        words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq, nm)
      val text = words.mkString(" ")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(graft.functions.Vocab.applyMerges($"text", merges).as("p"))
        .as[Seq[String]].head()
      val want = words.flatMap(w => classic(w, merges))
      got == want
    }, minTests = 30)
  }

  test("trained merges applied to the training corpus reassemble it") {
    val d = docs.limit(50)
    val merges = graft.functions.Vocab.trainBpe(d, nMerges = 20)
      .orderBy("rank").as[(Long, String, String)].collect()
      .map { case (_, l, r) => (l, r) }.toSeq
    assert(merges.size == 20)
    val ok = d.select($"text",
        graft.functions.Vocab.applyMerges($"text", merges).as("p"))
      .as[(String, Seq[String])].collect()
    ok.foreach { case (text, pieces) =>
      val words = "[a-z0-9]+".r.findAllIn(text.toLowerCase).mkString
      assert(pieces.mkString == words) // lossless cover of every word
    }
    // merges actually fire: fewer pieces than characters
    val chars = ok.map(_._2.map(_.length).sum).sum
    val nPieces = ok.map(_._2.size).sum
    assert(nPieces < chars)
  }

  // --- exact-k sampling / centroid assignment ---

  test("exactK returns exactly k stable rows as TakeOrderedAndProject") {
    val a = Sampling.exactK(docs, "doc_id", 25, seed = "e")
    assert(a.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val ids = a.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 25)
    val b = Sampling.exactK(docs.repartition(11), "doc_id", 25, seed = "e")
      .select("doc_id").as[Long].collect().toSet
    assert(b == ids)
    // and they are the true global minimum of the seeded uniform
    val u = Sampling.portableUniform(concat_ws(":", lit("e"), $"doc_id"))
    val brute = docs.withColumn("_u", u).orderBy($"_u", $"doc_id")
      .limit(25).select("doc_id").as[Long].collect().toSet
    assert(brute == ids)
  }

  test("assignToCentroids picks the nearest prototype, ties by id") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.1f, 1.0f)), (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("group", "centroid")
    val out = graft.functions.Similarity.assignToCentroids(vecs, cents)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0)) // 3 ties → smaller id
  }

  // --- scale-shape plan guards ---

  test("bm25 top-k plans as TakeOrderedAndProject, no global sort or window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val q = Retrieval.bm25TopK(docs, Seq("table", "hash"), k = 20)
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("bloom decon prefilters map-side with might_contain before the join") {
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val plan = Decontaminate.flagContaminatedBloom(corpus, bench, n = 3,
      expectedItems = 10000L).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"))
  }

  test("deterministic shuffle windows only over buckets (scale guard)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Sampling.deterministicShuffle(docs, "doc_id", "s1")
      .queryExecution.optimizedPlan
    // the only unpartitioned window is the B-row offset table's running
    // sum — it must sit on an Aggregate, never on the data stream
    val bad = opt.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        !w.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] => w
    }
    assert(bad.isEmpty, s"data-stream global window:\n${bad.mkString("\n")}")
  }

  // --- C4 rules ---

  test("c4 line rules: terminal punctuation and min words") {
    val d = Seq((1L,
      "a good long sentence.\nshort.\nno punctuation here\nanother fine line!"))
      .toDF("doc_id", "text")
    val out = RuleFilters.c4Filter(d).as[(Long, String, Long)].head()
    assert(out._2 == "a good long sentence.\nanother fine line!")
    assert(out._3 == 2L)
  }

  test("c4 doc rules: braces, lorem ipsum, and min surviving lines") {
    val d = Seq(
      (1L, "a good long sentence.\nanother fine line here."),
      (2L, "a good long sentence.\ncode { brace }\nanother fine line."),
      (3L, "contains Lorem Ipsum filler.\nanother fine line here."),
      (4L, "only one surviving line here.\nshort.")).toDF("doc_id", "text")
    val kept = RuleFilters.c4Filter(d).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
