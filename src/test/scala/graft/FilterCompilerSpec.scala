package graft

import graft.ingest.FilterCompiler
import graft.model.Filter
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}


/** Config-driven filter chain (reference: process.go:234-287; fixture
 *  cases from the commented tests at process_test.go:136-239). */
class FilterCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val msgs = Seq(
    ("t1", "d1", "s1", "m1"), ("t1", "d1", "s2", "m1"), ("t2", "d2", "s1", "m2"),
    ("t3", "d1", "ecollector", "m1"), ("t2", "d1", "s3", "m3"))

  private def run(filters: Seq[Filter]): Set[String] = {
    val df = msgs.toDF("topic", "domain", "serv", "msg_type")
    df.filter(FilterCompiler.compile(filters))
      .select(concat_ws("|", col("topic"), col("domain"), col("serv"), col("msg_type")))
      .as[String].collect().toSet
  }

  private def runRef(filters: Seq[Filter]): Set[String] =
    msgs.filter { case (t, d, s, m) => FilterCompiler.interpret(filters, t, d, s, m) }
      .map { case (t, d, s, m) => s"$t|$d|$s|$m" }.toSet

  test("ecollector self-traffic always dropped") {
    val all = Seq(Filter(id = 1)) // empty atomic filter = allow all
    assert(!run(all).exists(_.contains("ecollector")))
    assert(run(all).size == 4)
  }

  test("simple equality, negation, linked and/or") {
    val eq = Seq(Filter(id = 1, topic = "t1"))
    assert(run(eq) == runRef(eq))
    val neg = Seq(Filter(id = 1, topic = "t1", negation = true))
    assert(run(neg) == runRef(neg))
    val andChain = Seq(
      Filter(id = 1, domain = "d1", linkedFilterBooleanOperation = "and", linkedFilterId = 2),
      Filter(id = 2, msgType = "m1", isAtomic = false))
    assert(run(andChain) == runRef(andChain))
    val orChain = Seq(
      Filter(id = 1, topic = "t2", linkedFilterBooleanOperation = "or", linkedFilterId = 2),
      Filter(id = 2, service = "s2", isAtomic = false))
    assert(run(orChain) == runRef(orChain))
  }

  test("first atomic filter is the single entry point (reference loop order)") {
    val two = Seq(Filter(id = 1, topic = "t1"), Filter(id = 2, topic = "t2"))
    // only filter 1 is consulted — t2 rows must NOT pass
    assert(run(two) == runRef(two))
    assert(!run(two).exists(_.startsWith("t2")))
  }

  test("no atomic filter ⇒ nothing passes") {
    val f = Seq(Filter(id = 1, isAtomic = false, topic = "t1"))
    assert(run(f).isEmpty && runRef(f).isEmpty)
  }

  test("compiled column ≡ interpreter (property over random configs)") {
    val field = Gen.oneOf("", "t1", "t2", "d1", "s1", "m1", "zz")
    val genFilter = for {
      id <- Gen.choose(1, 4)
      t <- field; d <- field; s <- field; m <- field
      neg <- Gen.oneOf(true, false)
      atomic <- Gen.frequency(2 -> true, 1 -> false)
      linkId <- Gen.oneOf(0, 1, 2, 3, 4)
      op <- Gen.oneOf("and", "or", "")
    } yield Filter(id = id, topic = t, domain = d, service = s, msgType = m,
      negation = neg, isAtomic = atomic, linkedFilterId = linkId,
      linkedFilterBooleanOperation = op)
    val genConfig = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, genFilter))
    checkProp(Prop.forAll(genConfig) { filters => run(filters) == runRef(filters) }, minTests = 30)
  }
}
