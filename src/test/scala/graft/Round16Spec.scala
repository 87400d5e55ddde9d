package graft

import java.time.Instant
import java.sql.Timestamp

import graft.model.Tier
import graft.query.InfluxQL
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-16 surface: field predicates nested inside AndGroup atoms
 *  withhold the rollup mean-upgrade exactly like top-level ones (the
 *  r15 advice's correctness gap), tag-only OR-of-AndGroups stay a
 *  pushable scan filter, and the raw parse path is hardened against
 *  oversized/slash-flood input (statement size cap + linear-time
 *  literal masking). */
class Round16Spec extends SparkSpec {

  private val now = Instant.parse("2024-01-02T00:00:00Z")
  private val base = 1704067200L // 2024-01-01T00:00:00Z

  private val schema = StructType(Seq(
    StructField("measurement", StringType), StructField("time", TimestampType),
    StructField("value", DoubleType), StructField("dev_id", StringType),
    StructField("location_id", StringType), StructField("dir", StringType)))

  private def twoTag(m: String): DataFrame = {
    val rs = Seq(
      (base, 10.0, "1", "imp"), (base + 60, 20.0, "1", "imp"),
      (base, 30.0, "1", "exp"),
      (base, 40.0, "2", "imp"),
      (base + 3600, 50.0, "2", "exp"), (base + 3660, 70.0, "2", "exp"))
      .map { case (sec, v, loc, d) =>
        Row(m, new Timestamp(sec * 1000), v, s"d$loc", loc, d) }
    spark.createDataFrame(spark.sparkContext.parallelize(rs), schema)
  }

  test("a field predicate inside an AndGroup withholds the mean upgrade") {
    // Control: without any field predicate, a 2d window + mean +
    // GROUP BY time(1h) upgrades GenDay -> GenMonth (TierPolicy).
    val seenCtl = scala.collection.mutable.ArrayBuffer.empty[Tier]
    InfluxQL.dataPoints(
      """SELECT mean("value") FROM "sensor_t" WHERE time > now()-2d """ +
        """AND (("location_id" = '1' AND "dir" = 'imp') """ +
        """OR ("location_id" = '2')) GROUP BY time(1h)""",
      t => { seenCtl += t; twoTag("sensor_t") }, _ => None, now)
    assert(seenCtl.last == Tier.GenMonth)

    // The same query with a FIELD predicate nested inside the AndGroup
    // must stay on the raw-holding tier (GenDay) — per-point filtering
    // of pre-aggregated rollup rows while raw rows still exist would be
    // silently wrong (same rule as the top-level field-predicate case,
    // Planner.scanFrame atomHasField).
    val seen = scala.collection.mutable.ArrayBuffer.empty[Tier]
    InfluxQL.dataPoints(
      """SELECT mean("value") FROM "sensor_t" WHERE time > now()-2d """ +
        """AND (("location_id" = '1' AND "value" > 15) """ +
        """OR ("location_id" = '2')) GROUP BY time(1h)""",
      t => { seen += t; twoTag("sensor_t") }, _ => None, now)
    assert(seen.last == Tier.GenDay)
  }

  test("nested parenthesized ANDs flatten; OR back inside distributes") {
    import graft.model.{AndGroup, TagPredicate}
    val r = InfluxQL.parse("""SELECT "v" FROM "m" WHERE """ +
      """(("a" = '1' AND ("b" = '2' AND "c" = '3'))) OR ("a" = '4')""")
      .asInstanceOf[InfluxQL.Select].req
    assert(r.orPredicates == Seq(Seq(
      AndGroup(Seq(TagPredicate("a", "=", "1"), TagPredicate("b", "=", "2"),
        TagPredicate("c", "=", "3"))),
      TagPredicate("a", "=", "4"))))
    // full two-level DNF: an OR nested back inside an AND distributes
    // into sibling disjuncts — the model never carries an Or node
    val r2 = InfluxQL.parse("""SELECT "v" FROM "m" WHERE """ +
      """("a" = '1' AND ("b" = '2' OR "c" = '3')) OR ("a" = '4')""")
      .asInstanceOf[InfluxQL.Select].req
    assert(r2.orPredicates == Seq(Seq(
      AndGroup(Seq(TagPredicate("a", "=", "1"), TagPredicate("b", "=", "2"))),
      AndGroup(Seq(TagPredicate("a", "=", "1"), TagPredicate("c", "=", "3"))),
      TagPredicate("a", "=", "4"))))
    // the model invariant holds across every expansion: leaves only
    (r.orPredicates ++ r2.orPredicates).flatten.foreach {
      case AndGroup(atoms) => assert(!atoms.exists(_.isInstanceOf[AndGroup]))
      case _ =>
    }
    // ...and a crafted exponential product refuses in the envelope
    val blowup = "SELECT \"v\" FROM \"m\" WHERE (" +
      (1 to 12).map(i => s"""("a$i" = '1' OR "b$i" = '2')""").mkString(" AND ") +
      """) OR ("z" = '9')"""
    val e = intercept[IllegalArgumentException] { InfluxQL.parse(blowup) }
    assert(e.getMessage.contains("disjuncts"))
  }

  test("two-level DNF answers correctly end-to-end") {
    // (loc=1 AND (dir='imp' OR dir='exp')) OR (loc=2 AND value > 45)
    // over the twoTag fixture: loc-1 rows all match (10,20,30); loc-2
    // rows need value>45 (50,70)
    val out = InfluxQL.dataPoints(
      """SELECT "value" FROM "app_t" """ +
        """WHERE time >= '2024-01-01T00:00:00Z' AND time <= '2024-01-01T02:00:00Z' """ +
        """AND (("location_id" = '1' AND ("dir" = 'imp' OR "dir" = 'exp')) """ +
        """OR ("location_id" = '2' AND "value" > 45))""",
      _ => twoTag("app_t"), _ => None, now)
    assert(out.select("value").collect().map(_.getDouble(0)).sorted.toSeq
      == Seq(10.0, 20.0, 30.0, 50.0, 70.0))
  }

  test("tag-only OR-of-AndGroups pushes to the scan and keeps date pruning") {
    import graft.store.TierStore
    val root = graft.Fixtures.newDir("graft_orpush").toFile.getAbsolutePath
    val store = new TierStore(spark, root)
    // 10 days of data, two tag series; the query window covers 2 days
    val day0 = Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val rows = (0 until 240).map { h =>
      Row("app_m", new Timestamp((day0 + h * 3600L) * 1000), h.toDouble,
        s"d${h % 2 + 1}", s"${h % 2 + 1}", if (h % 2 == 0) "imp" else "exp")
    }
    store.write(Tier.GenDefault,
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
    val out = InfluxQL.dataPoints(
      """SELECT "value" FROM "app_m" """ +
        """WHERE time >= '2024-01-03T00:00:00Z' AND time <= '2024-01-04T12:00:00Z' """ +
        """AND (("location_id" = '1' AND "dir" = 'imp') """ +
        """OR ("location_id" = '2' AND "dir" = 'exp'))""",
      t => store.read(t), _ => None, now)
    // read the scan node's metadata directly — the plan's toString
    // truncates long filter lists at 100 chars
    val scan = out.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    // the derived date bounds still prune partitions — the OR group is
    // an independent conjunct and must not defeat them
    val partFilters = scan.partitionFilters.mkString(";")
    assert(partFilters.contains("date"), partFilters)
    assert(partFilters.contains("measurement"), partFilters)
    // the tag-only OR-of-ANDs reaches the parquet scan as a pushed
    // Or(And(EqualTo...)) tree — row-group stats can skip on it
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("Or(And(EqualTo(location_id,1),EqualTo(dir,imp))," +
      "And(EqualTo(location_id,2),EqualTo(dir,exp)))"), pushed)
    // and it still answers correctly: every row in-window matches one
    // arm (even hours are loc 1/imp, odd are loc 2/exp) -> 37 points
    assert(out.collect().length == 37)
  }

  // ---- raw parse path hardening: size cap + linear-time masking ----

  /** The pre-round-16 masking semantics as a test-side oracle: the SAME
   *  joint literal+regex-body state walk, but with the regex-body opener
   *  decided by the original whole-prefix regex re-match per slash (the
   *  O(n²) shape the advice flagged). Equivalence over adversarial
   *  generated input pins that the backwards-scan rewrite changed COST,
   *  not BEHAVIOR. */
  private val OpenerOracle =
    "(?is).*(?:[=!]~|\\bfrom\\s(?:\\s*(?:\"[^\"]+\"|[\\w\\-]+)\\s*\\.)*)\\s*".r
  private def maskOracle(q: String): String = {
    val sb = new StringBuilder(q)
    var i = 0; var inStr = false; var inRe = false
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < sb.length && sb.charAt(i + 1) == '\'') {
            sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' '); i += 1
          } else inStr = false
        } else sb.setCharAt(i, ' ')
      } else if (inRe) {
        if (c == '\\' && i + 1 < sb.length) {
          sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' '); i += 1
        } else if (c == '/') inRe = false
        else sb.setCharAt(i, ' ')
      } else if (c == '\'') inStr = true
      else if (c == '/' &&
          OpenerOracle.pattern.matcher(sb.substring(0, i)).matches())
        inRe = true
      i += 1
    }
    sb.toString
  }

  test("backwards-scan masking is byte-equivalent to the regex oracle") {
    import org.scalacheck.{Gen, Prop}
    // token soup biased toward every character class the opener decision
    // reads: slashes, tildes, FROM spellings (case, boundaries), dotted
    // qualifiers (quoted/worded/dashed), string literals with escapes,
    // regex escapes, and whitespace runs
    val token = Gen.frequency(
      6 -> Gen.const("/"), 4 -> Gen.const(" "), 2 -> Gen.const("  "),
      3 -> Gen.oneOf("=~", "!~", "~", "=", "!"),
      4 -> Gen.oneOf("from", "FROM", "From", "xfrom", "x-from", "froma", "from/"),
      4 -> Gen.oneOf(".", "a.", "\"rp\".", "\"r p\".", "a-b.", "\"\".", "..", "a"),
      2 -> Gen.oneOf("'it''s'", "'don/t'", "'", "''"),
      2 -> Gen.oneOf("\\/", "\\", "\"", "(", ")", ","),
      2 -> Gen.oneOf("select", "where", "and", "or", "time", "now()", "1h"))
    val soup = Gen.listOf(token).map(_.mkString)
    checkProp(Prop.forAll(soup) { s =>
      InfluxQL.maskLiterals(s) == maskOracle(s)
    }, minTests = 500)
    // the documented opener shapes, pinned explicitly
    for (s <- Seq(
      """SELECT "v" FROM "m" WHERE "t" =~ /don't (x/ AND "u" !~ /\/esc'/""",
      """SELECT mean("v") FROM /^sensor_/ WHERE time > now()-1h""",
      """SELECT "v" FROM "gen_raw"./te\/mp.*/ WHERE time > now()-1h""",
      """SELECT "v" FROM db . "rp" . /m(/ WHERE a/b > 2 AND msg = 'from x /'""",
      """SELECT 'a/b' / 2, "x from " / 3 FROM t"""))
      assert(InfluxQL.maskLiterals(s) == maskOracle(s), s)
  }

  test("oversized statements refuse cheaply in the envelope") {
    val big = "SELECT \"v\" FROM \"m\" WHERE " +
      Seq.fill(8000)("\"a\" = '1'").mkString(" AND ") // ~100 KB
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException] { InfluxQL.parse(big) }
    assert(e.getMessage.contains("exceeds"))
    assert(!InfluxQL.looksLike(big)) // sniffer declines, never stalls
    assert((System.nanoTime() - t0) < 2e9, "oversized refusal must be cheap")
  }

  test("slash-flood input parses in linear-ish time, not O(n^2)") {
    // ~48 KB of slash-dense WHERE text (under the size cap, so it is
    // actually scanned): the former per-slash whole-prefix regex match
    // made this cost minutes of parse CPU; the backwards scan is
    // amortized linear. Generous wall bound — an order of magnitude
    // under the old cost, an order over the new one.
    val flood = "SELECT \"v\" FROM \"m\" WHERE \"t\" =~ " +
      ("/" * 24000) + " AND time > now()-1h"
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] { InfluxQL.parse(flood) }
    InfluxQL.looksLike(flood)
    assert((System.nanoTime() - t0) < 5e9, "slash flood must parse in seconds")
  }

  test("pushable tag predicates keep the empty-string-for-missing model") {
    // The round's tagAtomColumn rewrite spells =/!= without coalesce so
    // they push to parquet; this pins row-for-row equivalence with the
    // reference model (missing tag ≡ '') over every op × value shape,
    // including NULL and empty-string tag values.
    val rows = Seq(
      (base, 1.0, null: String), (base + 60, 2.0, ""),
      (base + 120, 3.0, "x"), (base + 180, 4.0, "y"))
      .map { case (sec, v, t) =>
        Row("app_t", new Timestamp(sec * 1000), v, "d1", t, "imp") }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    // (predicate-string, reference semantics over the coalesce model)
    val cases: Seq[(String, Double => Boolean)] = Seq(
      ("\"location_id\" = 'x'" -> { v: Double => v == 3.0 }),
      ("\"location_id\" = ''" -> { v: Double => v <= 2.0 }),
      ("\"location_id\" != 'x'" -> { v: Double => v != 3.0 }),
      ("\"location_id\" != ''" -> { v: Double => v > 2.0 }),
      ("\"location_id\" =~ /x/" -> { v: Double => v == 3.0 }),
      ("\"location_id\" =~ /^$/" -> { v: Double => v <= 2.0 }),
      ("\"location_id\" !~ /x/" -> { v: Double => v != 3.0 }),
      ("\"location_id\" !~ /^$/" -> { v: Double => v > 2.0 }))
    cases.foreach { case (pred, keep) =>
      val got = InfluxQL.dataPoints(
        s"""SELECT "value" FROM "app_t" WHERE time > now()-2d AND $pred""",
        _ => df, _ => None, now)
        .select("value").collect().map(_.getDouble(0)).sorted.toSeq
      val want = Seq(1.0, 2.0, 3.0, 4.0).filter(keep)
      assert(got == want, s"$pred: got $got want $want")
    }
  }

  test("a NULL tag groups and echoes under the empty value, not apart") {
    // absent tag ≡ '' must hold for GROUP BY too: one '' group holding
    // both NULL-tag and empty-tag rows (InfluxDB's absent-tag grouping),
    // never a separate NULL group
    val rows = Seq(
      (base, 1.0, null: String), (base + 60, 2.0, ""),
      (base + 120, 3.0, "x"), (base + 180, 4.0, "x"))
      .map { case (sec, v, t) =>
        Row("app_t", new Timestamp(sec * 1000), v, "d1", t, "imp") }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = InfluxQL.dataPoints(
      """SELECT mean("value") FROM "app_t" WHERE time > now()-2d """ +
        """GROUP BY time(1h), "location_id" FILL(none)""",
      _ => df, _ => None, now)
      .select("location_id", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    assert(out == Seq("" -> 1.5, "x" -> 3.5), out.toString)
  }

  test("an empty entry in the device list matches rows without the tag") {
    import graft.model.{DataPointsFilter, DataPointsRequest}
    val rows = Seq(
      (base, 1.0, null: String), (base + 60, 2.0, ""),
      (base + 120, 3.0, "d1"), (base + 180, 4.0, "d2"))
      .map { case (sec, v, d) =>
        Row("app_t", new Timestamp(sec * 1000), v, d, "1", "imp") }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    def run(devs: Seq[String]): Seq[Double] =
      graft.query.Planner.dataPoints(
        DataPointsRequest(measurement = "app_t", relativeTime = "2d",
          filters = DataPointsFilter(devices = devs)),
        _ => df, now).select("value").collect().map(_.getDouble(0)).sorted.toSeq
    assert(run(Seq("d1")) == Seq(3.0)) // NULL never matches a concrete id
    assert(run(Seq("", "d1")) == Seq(1.0, 2.0, 3.0)) // '' ≡ missing tag
  }

  test("cluster-split clone plant survives corpora whose ids exceed 1e6") {
    // Regression for the sf1 board's one real find: the fixture planted
    // clones at doc_id + 1e6, which COLLIDED with a 10x-scaled corpus's
    // remapped ids (non-unique doc_id -> the cluster-label join fanned
    // out and 3,586/60,000 rows mis-split). The offset now derives from
    // max(doc_id) + 1. Pin both halves of the contract on a corpus that
    // spans the old constant: (a) no id collision (one row per planted
    // id), and (b) the leakage-safety invariant — every clone lands in
    // the SAME split as its original.
    val dir = graft.Fixtures.newDir("graft_csplit").toFile.getAbsolutePath
    import spark.implicits._
    val docs = ((0L until 40L) ++ (1000000L until 1000010L))
      .map(i => (i, s"unique text body number $i")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("samp_cluster_split")(spark, dir)
      .select("doc_id", "split").collect()
    val n = docs.count()
    val planted = out.map(_.getLong(0))
    assert(planted.length == n + docs.filter($"doc_id" % 5 === 0).count(),
      "one output row per base doc + per clone")
    assert(planted.distinct.length == planted.length,
      "derived offset must keep doc_id unique (old constant collided)")
    val off = 1000010L // max(doc_id) + 1 of this corpus
    val split = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    ((0L until 40L) ++ (1000000L until 1000010L)).filter(_ % 5 == 0)
      .foreach { o =>
        assert(split(o + off) == split(o),
          s"clone of $o must split with its original (leakage safety)") }
  }
}
