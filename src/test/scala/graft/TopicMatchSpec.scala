package graft

import graft.ingest.TopicMatch
import org.scalacheck.{Gen, Prop}


/** MQTT wildcard matching (reference: src/utils/utils.go:13-41). */
class TopicMatchSpec extends SparkSpec {

  /** Straightforward recursive matcher mirroring the reference's segment
   *  walk — the semantic oracle for the regex translation. */
  private def refMatch(pat: List[String], topic: List[String]): Boolean = (pat, topic) match {
    case (Nil, Nil) => true
    case ("#" :: _, _) => true
    case ("+" :: pt, _ :: tt) => refMatch(pt, tt)
    case (p :: pt, t :: tt) if p == t => refMatch(pt, tt)
    case _ => false
  }

  test("exact, plus and hash semantics") {
    assert(TopicMatch.matchesStr("a/b/c", "a/b/c"))
    assert(!TopicMatch.matchesStr("a/b/c", "a/b"))
    assert(TopicMatch.matchesStr("a/b/c", "a/+/c"))
    assert(!TopicMatch.matchesStr("a/b/c", "a/+/d"))
    assert(TopicMatch.matchesStr("a/b/c", "a/#"))
    assert(TopicMatch.matchesStr("a/b/c", "#"))
    assert(TopicMatch.matchesStr("a", "a/#")) // '#' matches zero segments
    assert(TopicMatch.matchesStr("pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:sensor_temp/ad:15_0",
      "pt:j1/mt:evt/rt:dev/#"))
    assert(TopicMatch.matchesStr("pt:j1/mt:evt/rt:dev/rn:t/ad:1/sv:serv_click/ad:9",
      "pt:j1/mt:evt/+/+/+/sv:serv_click/#"))
  }

  test("regex translation ≡ recursive reference matcher (property)") {
    val seg = Gen.oneOf("a", "b", "ad:1", "sv:x", "rn-z")
    val patSeg = Gen.frequency(5 -> seg, 2 -> Gen.const("+"), 1 -> Gen.const("#"))
    val gen = for {
      t <- Gen.listOfN(4, seg)
      n <- Gen.choose(1, 5)
      p <- Gen.listOfN(n, patSeg)
    } yield (t, p.takeWhile(_ != "#") ++ p.find(_ == "#").toList) // '#' only terminal
    checkProp(Prop.forAll(gen) { case (t, p) =>
      val pat = p.mkString("/")
      TopicMatch.matchesStr(t.mkString("/"), pat) == refMatch(p, t)
    })
  }

  test("anySelector over a column") {
    import spark.implicits._
    val df = Seq("a/b/c", "x/y/z", "a/q/c").toDF("topic")
    val got = df.filter(TopicMatch.anySelector(df("topic"), Seq("a/+/c")))
      .as[String].collect().toSet
    assert(got == Set("a/b/c", "a/q/c"))
  }
}
