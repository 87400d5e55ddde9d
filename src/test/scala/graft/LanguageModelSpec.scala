package graft

import graft.functions.LanguageModel
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log"),
    (4L, "zzz qqq zzz qqq zzz")).toDF("doc_id", "text")

  test("hand-computed bigram scores on a tiny corpus") {
    // corpus token stream: 6 + 5 + 6 + 5 = 22 tokens
    // vocab: the cat sat on mat ate fish a dog log zzz qqq -> V = 12, N = 22
    val m = LanguageModel.train(corpus)
    val totals = m.totals.collect().head
    assert(totals.getLong(0) == 22L && totals.getLong(1) == 12L)

    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni("the") == 4L && uni("zzz") == 3L && uni("a") == 2L)
    val bi = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi(("the", "cat")) == 2L && bi(("zzz", "qqq")) == 2L)

    // doc 1 = "the cat sat on the mat":
    //   p(the) = (4+1)/(22+12); then bigram terms
    def q(x: Double): Long = math.floor(x * 1e4 + 0.5).toLong
    val lps = Seq(
      math.log(5.0 / 34.0),              // first token: the
      math.log((2.0 + 1) / (4 + 12)),    // the->cat c=2, c(the)=4
      math.log((1.0 + 1) / (2 + 12)),    // cat->sat c=1, c(cat)=2
      math.log((1.0 + 1) / (1 + 12)),    // sat->on  c=1, c(sat)=1  [sat on x2? no: doc1+doc3 both have "sat on"]
      math.log((1.0 + 1) / (2 + 12)),    // on->the  c=1, c(on)=2
      math.log((1.0 + 1) / (4 + 12)))    // the->mat c=1, c(the)=4
    // fix sat->on: appears in docs 1 and 3 => c=2, c(sat)=2
    val fixed = lps.updated(3, math.log((2.0 + 1) / (2 + 12)))
    val expected = math.floor(fixed.map(q).sum.toDouble / 6 + 0.5).toLong

    val out = LanguageModel.scoreDocs(corpus, m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 6L)
    assert(out(1L)._2 == expected)
    // the repetitive doc scores HIGHER than average (its bigrams are
    // near-deterministic) — the high-side band the filter cuts
    assert(out(4L)._2 > out(3L)._2)
  }

  test("docs with no tokens are excluded; singleton doc scored by smoothing only") {
    val docs = Seq((1L, "???"), (2L, "hello")).toDF("doc_id", "text")
    val out = LanguageModel.scoreSelf(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    // single "hello": N=1 V=1, p = (1+1)/(1+1) = 1, lp = 0
    assert(out.head.getLong(2) == 0L)
  }

  test("hashKeys scale mode is value-identical to the portable string-key mode") {
    val a = LanguageModel.scoreSelf(corpus).orderBy("doc_id").collect().toSeq
    val b = LanguageModel.scoreSelf(corpus, hashKeys = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("scoring against an external reference corpus handles OOV tokens") {
    val ref = corpus.filter($"doc_id" <= 3)
    val m = LanguageModel.train(ref)
    val docs = Seq((9L, "the cat xyzzy")).toDF("doc_id", "text")
    val out = LanguageModel.scoreDocs(docs, m).collect().head
    assert(out.getLong(1) == 3L)
    // xyzzy unseen: bigram c=0, context "cat" c=2 -> lp = ln(1/(2+V))
    val totals = m.totals.collect().head
    val v = totals.getLong(1)
    def q(x: Double): Long = math.floor(x * 1e4 + 0.5).toLong
    val lps = Seq(
      math.log(5.0 / (totals.getLong(0) + v)),     // the: c=4
      math.log(3.0 / (4 + v)),                     // the->cat c=2, c(the)=4
      math.log(1.0 / (2 + v)))                     // cat->xyzzy c=0, c(cat)=2
    assert(out.getLong(2) == math.floor(lps.map(q).sum.toDouble / 3 + 0.5).toLong)
  }

  test("perplexity band filter keeps the middle of the distribution") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = LanguageModel.perplexityBandFilterSelf(docs, 0.2, 0.8)
    val scores = LanguageModel.scoreSelf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val keptRows = kept.select("doc_id", "lp_q4").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // every kept doc carries its score, the extremes are gone, and the
    // kept set is exactly the docs inside the band edges the sketch chose
    assert(keptRows.forall { case (id, lp) => scores(id) == lp })
    val keptIds = keptRows.map(_._1).toSet
    assert(!keptIds.contains(scores.minBy(_._2)._1))
    assert(!keptIds.contains(scores.maxBy(_._2)._1))
    val lo = keptRows.map(_._2).min
    val hi = keptRows.map(_._2).max
    assert(scores.values.count(v => v >= lo && v <= hi) == keptIds.size)
    // schema: original columns preserved + lp_q4
    assert(kept.columns.toSet == docs.columns.toSet + "lp_q4")
  }

  test("no unpartitioned windows in the scoring plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val plan = LanguageModel.scoreSelf(corpus).queryExecution.optimizedPlan
    val bad = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty)
  }
}
