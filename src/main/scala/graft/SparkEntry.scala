package graft

import java.time.Instant

import graft.functions.{Dedup, Similarity, TextFunctions}
import graft.ingest.{FilterCompiler, TopicMatch, Transform}
import graft.meta.MetadataStore
import graft.model.{DataPointsFilter, DataPointsRequest, Filter}
import graft.query.Planner
import graft.rollup.Downsampler
import graft.stream.Aggregator
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one query per implemented operator from SURVEY.md §2,
 * bound to the deterministic testdata tables, each with a DuckDB oracle.
 *
 * Conventions for engine-parity (driver hashes values after sorting
 * columns by name):
 *  - time columns are epoch SECONDS as longs (the reference's response
 *    precision: influx.NewQuery(..., "s"), influxdb_v1.go:191);
 *  - floating-point aggregates are rounded to 6 decimals on both sides;
 *  - all computed columns aliased identically in Spark and SQL.
 */
object SparkEntry {

  /** Deterministic "now" for relative-time queries: just past the end of
   *  the events table (2024-01-30), so relative windows cover it. */
  val Now: Instant = Instant.parse("2024-02-01T00:00:00Z")
  val NowSec: Long = Now.getEpochSecond // 1706745600

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fixed demonstration merge table for `text_bpe_apply` (builds
   *  "table"/"scan" pieces on the synthetic vocabulary). */
  val BpeDemoMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
    "s" -> "c", "sc" -> "a", "sca" -> "n", "h" -> "a")

  /** The events table has carried two ts layouts across fixture
   *  regenerations: parquet TIMESTAMP(NANOS), which Spark 4 only reads as
   *  int64 via the nanosAsLong legacy conf (converted here with integer
   *  division — a double division would lose precision above 2^53), and a
   *  plain timestamp[us] column. Branch on the read dtype so both work. */
  /** Per-JVM cache of a fixture's PREPARED INPUT directory. The bench
   *  harness runs each entry several times in one JVM; re-writing the
   *  byte-identical input parquet on every run adds only setup variance
   *  to the measurement (round-13 ask #4 — the streaming monitors'
   *  spread was warm-up decay of this copy, not batch nondeterminism).
   *  Checkpoints and outputs stay per-run; only the immutable input is
   *  shared. */
  private val fixtureInputs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedInput(key: String)(write: String => Unit): String =
    fixtureInputs.computeIfAbsent(key, _ => {
      val d = graft.Fixtures.newDir("graft_fxin")
        .toFile.getAbsolutePath + "/in"
      write(d)
      d
    })

  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }

  /**
   * events → canonical points binding: measurement from event_type with a
   * routing prefix ("sensor_" = high-frequency tiers, "app_" = gen_default),
   * series per user, deterministic tag derivations.
   */
  private def points(spark: SparkSession, dir: String, prefix: String): DataFrame =
    events(spark, dir).select(
      concat(lit(prefix), col("event_type")).as("measurement"),
      col("ts").as("time"),
      col("value"),
      col("user_id").cast("string").as("dev_id"),
      (col("user_id") % 5).cast("string").as("location_id"),
      when(col("user_id") % 7 === 0, "meter.main_elec").otherwise("sensor").as("dev_type"),
      when(col("event_id") % 2 === 0, "import").otherwise("export").as("dir"),
      concat(lit(prefix), col("event_type"), lit(";"), col("user_id").cast("string")).as("series_id"))

  /** The same binding as a SQL CTE for the oracles. */
  private def ptsCte(prefix: String): String =
    s"""pts AS (
       |  SELECT '$prefix' || event_type AS m,
       |         ts,
       |         CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
       |         value AS v,
       |         CAST(user_id AS VARCHAR) AS dev_id,
       |         CAST(user_id % 5 AS VARCHAR) AS loc,
       |         CASE WHEN user_id % 7 = 0 THEN 'meter.main_elec' ELSE 'sensor' END AS dev_type,
       |         CASE WHEN event_id % 2 = 0 THEN 'import' ELSE 'export' END AS dir,
       |         '$prefix' || event_type || ';' || CAST(user_id AS VARCHAR) AS series
       |  FROM events)""".stripMargin

  /** Cumulative (growing-counter) series per user — meter-style input for
   *  the difference/energy operators. `% 50` adds meter resets. */
  private def cumPoints(spark: SparkSession, dir: String, measurement: String,
      mod: Option[Double]): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // quantize the running sum before the mod wrap: the raw double sum
    // carries order-independent but engine-specific ~1e-9 noise, and
    // `% m` is chaotic when the sum sits that close to a multiple of m
    // (seen at sf0.1); rounding to 6 decimals makes both engines mod
    // identical values
    val cum = round(sum(col("value")).over(w), 6)
    val v = mod.map(m => cum % m).getOrElse(cum)
    events(spark, dir).select(
      lit(measurement).as("measurement"),
      col("ts").as("time"),
      v.as("value"),
      col("user_id").cast("string").as("dev_id"),
      (col("user_id") % 5).cast("string").as("location_id"),
      lit("sensor").as("dev_type"),
      when(col("user_id") % 2 === 0, "import").otherwise("export").as("dir"),
      concat(lit(measurement + ";"), col("user_id").cast("string")).as("series_id"))
  }

  private def cumCte(mod: Option[Double]): String = {
    val expr = mod.map(m => s"(round(sum(value) OVER w, 6) % $m)")
      .getOrElse("round(sum(value) OVER w, 6)")
    s"""cum AS (
       |  SELECT event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec, user_id,
       |         $expr AS v,
       |         CAST(user_id AS VARCHAR) AS dev_id,
       |         CAST(user_id % 5 AS VARCHAR) AS loc,
       |         CASE WHEN user_id % 2 = 0 THEN 'import' ELSE 'export' END AS dir,
       |         CAST(user_id AS VARCHAR) AS series
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin
  }

  /** FIMP envelope binding for the ingest operators (transform/filter/
   *  topic-match): event_type picks the service branch. `private[graft]`
   *  so the StreamingSoak main drives the identical envelope shape. */
  private[graft] def fimp(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val serv = when(col("event_type") === "purchase", "meter_elec")
      .when(col("event_type") === "click", "meter_elec")
      .when(col("event_type") === "view", "sensor_temp")
      .when(col("event_type") === "signup", "thermostat")
      .otherwise("ecollector") // "error" → self-traffic, dropped by F1
    val msgType = when(col("event_type").isin("purchase", "click"), "evt.meter.report")
      .when(col("event_type") === "view", "evt.sensor.report")
      .when(col("event_type") === "signup", "cmd.setpoint.set")
      .otherwise("evt.error.report")
    val unit = when(col("event_type") === "purchase",
        when(col("user_id") % 2 === 0, "W").otherwise("kW"))
      .when(col("event_type") === "click", "kWh")
      .when(col("event_type") === "view", "C")
    val rawVal = when(col("event_type") === "purchase",
        when(col("user_id") % 2 === 0, col("value") * 100).otherwise(col("value")))
      .otherwise(col("value"))
    val valJson = when(col("event_type") === "signup",
        concat(lit("{\"temp\":\""), col("value").cast("string"),
          lit("\",\"unit\":\"C\",\"type\":\"heat\"}")))
      .otherwise(rawVal.cast("string"))
    e.select(
      col("event_id"), col("ts").as("time"),
      concat(lit("pt:j1/mt:evt/rt:dev/rn:t/ad:1/sv:serv_"), col("event_type"),
        lit("/ad:"), col("user_id").cast("string")).as("topic"),
      serv.as("serv"), msgType.as("msg_type"),
      when(col("event_type") === "signup", "str_map").otherwise("float").as("val_t"),
      valJson.as("val_json"),
      map(lit("unit"), unit).as("props"),
      lit("app").as("src"), lit("x").as("domain"))
  }

  /** Per-series StreamIn binding for the StreamingSoak's stateful-agg
   *  phase: agg_func keyed by user so every series carries exactly one
   *  function, covering all six streaming arms incl. `difference`. */
  private[graft] def soakPoints(spark: SparkSession,
      dir: String): org.apache.spark.sql.Dataset[Aggregator.StreamIn] = {
    import spark.implicits._
    events(spark, dir).select(
      concat(col("event_type"), lit(";"), col("user_id").cast("string")).as("series_id"),
      col("event_type").as("measurement"),
      element_at(
        array(lit("mean"), lit("min"), lit("max"), lit("sum"), lit("last"), lit("difference")),
        (pmod(col("user_id"), lit(6)) + 1).cast("int")).as("agg_func"),
      col("ts").as("time"), col("value"),
      when(col("user_id") % 7 === 0, "meter.main_elec").otherwise("sensor").as("dev_type"))
      .as[Aggregator.StreamIn]
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ============================================================ queries ==

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- core relational (scan/filter/agg/join; bench headliners) ---

    "q1_pricing_summary" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_quantity") > 5)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q3_join_agg" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      // revenue summed in integer hundredths-of-cents: a double sum over
      // ~25k items of ~1e5 magnitude accumulates order-dependent error
      // right at the cent-rounding boundary (seen at sf0.1); integer
      // summation is associative, so Spark and any oracle agree exactly
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long")) / 10000.0).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    "q_sessions" -> ((s, dir) =>
      // gap-based sessionization (30-min gap) over the event stream:
      // per-key islands window + one stats agg; value summed in integer
      // centi-units for cross-engine exactness
      graft.stream.Sessions.sessionStats(events(s, dir), gapSeconds = 1800)),

    "q_asof_join" -> ((s, dir) => {
      // as-of alignment: each view event picks up the user's most recent
      // purchase value at-or-before it. The oracle is DuckDB's NATIVE
      // ASOF LEFT JOIN — a fully independent implementation of the
      // semantics (ours is a union + keyed carry window, one shuffle)
      val e = events(s, dir).withColumn("t", unix_timestamp(col("ts")))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t")).agg(max(col("value")).as("v"))
      graft.query.AsofJoin.asofJoin(views, purchases, "user_id", "t", Seq("v"))
        .select(col("event_id"), col("asof_v").as("asof_value"))
    }),

    "q_asof_bucketed" -> ((s, dir) => {
      // the hot-key-safe bucketed form, against the SAME native-ASOF
      // oracle: 6h buckets shard each user's window; the cross-bucket
      // carry must make the sharding invisible
      val e = events(s, dir).withColumn("t", unix_timestamp(col("ts")))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t")).agg(max(col("value")).as("v"))
      graft.query.AsofJoin.asofJoinBucketed(views, purchases, "user_id", "t",
        Seq("v"), bucketSpan = 21600L)
        .select(col("event_id"), col("asof_v").as("asof_value"))
    }),

    "q_region_rollup" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), round(avg(col("c_acctbal")), 6).as("avg_bal"))
    }),

    "s7_raw_sql" -> ((s, dir) => {
      events(s, dir).createOrReplaceTempView("events_v")
      s.sql("SELECT event_type, count(*) AS n, round(sum(value), 2) AS total " +
        "FROM events_v GROUP BY event_type")
    }),

    "s3_roundtrip" -> ((s, dir) => {
      // S3/S9 write→read round trip: route a mixed stream through the
      // tiered store (sensor_* → gen_raw, app_* → gen_default), then read
      // back through the planner with the tier pinned by retention policy.
      // The oracle computes the same aggregate from the ORIGINAL events —
      // any loss, duplication, or misroute in the store path breaks the
      // hash match (a misrouted app_click would leave gen_default empty).
      val root = graft.Fixtures.newDir("graft_s3rt")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "sensor_").unionAll(points(s, dir, "app_")))
      graft.query.InfluxQL.dataPoints(
        """SELECT sum("value") FROM "gen_default"."app_click" """ +
          """WHERE time >= '2024-01-01T00:00:00Z' AND time <= '2024-01-31T00:00:00Z' """ +
          """GROUP BY time(1h) FILL(none)""",
        t => store.read(t), store.tierByName(_), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s5_csv_roundtrip" -> ((s, dir) => {
      // S5 CSV sink round trip: canonical points through the fixed
      // 11-column CSV shape (reference: storage/csv.go:22) and back.
      // Doubles survive exactly (shortest-repr format both ways);
      // timestamps are compared at epoch-second precision — the CSV
      // layer itself keeps milliseconds.
      val root = graft.Fixtures.newDir("graft_csv")
        .toFile.getAbsolutePath
      val pts = points(s, dir, "sensor_")
        .withColumn("service", col("measurement"))
        .withColumn("src", lit("app"))
        .withColumn("topic", concat(lit("rt:dev/sv:"), col("measurement")))
        .withColumn("value_str", lit(null).cast("string"))
        .withColumn("value_bool", lit(null).cast("boolean"))
        .withColumn("unit", lit("W"))
      graft.store.CsvSink.write(pts, root)
      s.read.option("header", true)
        .schema("name string, time timestamp, dev_id string, dev_type string, " +
          "dir string, location_id string, service string, src string, " +
          "topic string, value string, unit string")
        .csv(root)
        .select(col("name"), unix_timestamp(col("time")).as("time_sec"),
          col("dev_id"), col("dev_type"), col("dir"), col("location_id"),
          col("service"), col("src"), col("topic"),
          col("value").cast("double").as("value"), col("unit"))
    }),

    "s7_influxql" -> ((s, dir) => {
      // the reference UI's query dialect (docs/api:9) entering through the
      // string shim — must hash-match the structured a5_time_bucket plan
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") AS "mean_value" FROM "app_click" """ +
          """WHERE time > now()-5w GROUP BY time(1h) FILL(null)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_subquery" -> ((s, dir) => {
      // ONE-level InfluxQL subquery (round-13): the Grafana max-of-mean
      // idiom — outer daily MAX over inner hourly MEANs, outer WHERE
      // omitted (bounds inherited from the inner, the dashboard shape);
      // max() selects an inner mean bit-for-bit, so round(6) is safe
      graft.query.InfluxQL.dataPoints(
        """SELECT max("mean_value") FROM (SELECT mean("value") AS "mean_value" """ +
          """FROM "app_click" WHERE time > now()-5w GROUP BY time(1h)) """ +
          """GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_multi_heavy" -> ((s, dir) => {
      // round-13: MODE + INTEGRAL compose with a simple mean in ONE
      // multi-select — each heavy aggregate runs its own plan over the
      // SAME scanned frame and full-outer-joins back on the bucket key;
      // items reference different fields (mode over the quantized twin)
      graft.query.InfluxQL.dataPoints(
        """SELECT mode("vq") AS "md", integral("value", 1h) AS "ig", mean("value") AS "mu" """ +
          """FROM "app_click" WHERE time > now()-5w GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_")
          .withColumn("vq", floor(col("value")).cast("double")),
        _ => None, Now)
        .select(col("time"), col("md"), round(col("ig"), 6).as("ig"),
          round(col("mu"), 6).as("mu"))
    }),

    "s7_subquery_multi" -> ((s, dir) => {
      // round-13: multi-item lists on BOTH subquery sides — daily
      // extremes of the hourly (mean, max) pair; max/min select inner
      // values bit-for-bit, so round(6) on the mean side is safe
      graft.query.InfluxQL.dataPoints(
        """SELECT max("mu") AS "dmu", min("mx") AS "dmx" FROM """ +
          """(SELECT mean("value") AS "mu", max("value") AS "mx" FROM "app_click" """ +
          """WHERE time > now()-5w GROUP BY time(1h)) GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("dmu"), 6).as("dmu"), col("dmx"))
    }),

    "s7_multi_select" -> ((s, dir) => {
      // round-13 dialect tail: the multi-series panel shape — three
      // aggregates of one field, tag-grouped, planned as ONE scan + ONE
      // shuffle (a single Aggregate node; InfluxQLSpec pins the plan to
      // no-join/no-union)
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") AS "avg_v", max("value") AS "max_v", count("value") AS "n" """ +
          """FROM "app_click" WHERE time > now()-5w """ +
          """GROUP BY time(1d), "location_id" FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("avg_v"), 6).as("avg_v"),
          col("max_v"), col("n"), col("location_id"))
    }),

    "s7_where_regex" -> ((s, dir) => {
      // round-14: the Grafana template-variable WHERE forms — `=~ /re/`
      // (unanchored), `!=` — applied at the SCAN (before aggregation),
      // with absent tags comparing as '' (InfluxDB's tag model)
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """AND "location_id" =~ /^[12]$/ AND "dir" != 'import' """ +
          """GROUP BY time(1d), "location_id" FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"),
          col("location_id"))
    }),

    "s7_where_or" -> ((s, dir) => {
      // round-14: a parenthesized OR group mixing tag and field atoms —
      // the pre-regex Grafana multi-value variable shape — one AND
      // conjunct whose atoms disjoin, applied at the scan
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """AND ("location_id" = '1' OR "location_id" = '3' OR "value" > 95) """ +
          """GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_where_and_or" -> ((s, dir) => {
      // round-15: one level of AND INSIDE an OR group — the Grafana
      // multi-template-variable shape `(a AND b) OR (c AND d)` — mixing
      // tag and field leaves; one AND conjunct whose AndGroup atoms
      // disjoin, applied at the scan (no extra shuffle, no join)
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """AND (("location_id" = '1' AND "dir" = 'export') """ +
          """OR ("location_id" = '3' AND "value" > 50)) """ +
          """GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_where_dnf" -> ((s, dir) => {
      // round-16: an OR nested back INSIDE an AND group — the full
      // two-level-DNF closure over the Grafana builder's output. The
      // parser DISTRIBUTES `(a AND (b OR c)) OR (d AND e)` into
      // leaf-atom AndGroups at parse time, so the scan filter is the
      // same pushable Or(And(...)) tree as s7_where_and_or
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """AND (("location_id" = '1' AND ("dir" = 'export' OR "value" > 80)) """ +
          """OR ("location_id" = '3' AND "value" > 50)) """ +
          """GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_where_field" -> ((s, dir) => {
      // round-14: numeric field conditions in WHERE — per-POINT,
      // applied at the scan BEFORE aggregation (InfluxDB's semantics);
      // the comparison sits on the raw field column so parquet
      // row-group min/max skipping stays available
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """AND "value" > 30 AND "value" <= 95.5 """ +
          """GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_subquery_deep" -> ((s, dir) => {
      // round-14: subqueries now nest to ANY depth — three levels here
      // (hourly mean → daily max → weekly min), with WHERE only at the
      // innermost level so the bounds-inheritance recursion is exercised
      // at both unbounded outer levels; max/min SELECT an inner value
      // bit-for-bit, so only the innermost mean needs round(6)
      graft.query.InfluxQL.dataPoints(
        """SELECT min("dmx") FROM (SELECT max("mu") AS "dmx" FROM """ +
          """(SELECT mean("value") AS "mu" FROM "app_click" """ +
          """WHERE time > now()-5w GROUP BY time(1h)) """ +
          """GROUP BY time(1d)) GROUP BY time(1w) FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s7_multi_tag" -> ((s, dir) => {
      // round-14 dialect notch: GROUP BY time(X), tag1, tag2 — the
      // multi-tag form raw-passthrough InfluxDB 1.x accepts (the
      // reference's own API takes exactly one tag, influxdb_v1.go:160-171,
      // so this is passthrough-only surface); one shuffle keyed on
      // (bucket, location_id, dir), Seq-keyed end-to-end
      graft.query.InfluxQL.dataPoints(
        """SELECT mean("value") FROM "app_click" WHERE time > now()-5w """ +
          """GROUP BY time(1d), "location_id", "dir" FILL(none)""",
        _ => points(s, dir, "app_"), _ => None, Now)
        .select(col("time"), round(col("value"), 6).as("value"),
          col("location_id"), col("dir"))
    }),

    "s7_regex_from" -> ((s, dir) => {
      // regex measurement: the pattern matches against the measurement
      // CATALOG (metadata, never a data scan); matched measurements
      // union, one series each, every branch pruned to its own
      // partitions — the Grafana multi-measurement panel form
      val catalog = () => Seq("sensor_click", "sensor_error",
        "sensor_purchase", "sensor_signup", "sensor_view")
      graft.query.InfluxQL.dataPoints(
        """SELECT sum("value") FROM /^sensor_(click|view)$/ """ +
          """WHERE time > now()-5w GROUP BY time(1d) FILL(none)""",
        _ => points(s, dir, "sensor_"), _ => None, Now, catalog)
        .select(col("measurement"), col("time"),
          round(col("value"), 6).as("value"))
    }),

    "s7_select_into" -> ((s, dir) => {
      // SELECT INTO materializes hourly means as stored points under a
      // NEW measurement (rp-pinned write through the ledgered store
      // path), then the ordinary grammar reads them back — equality
      // with the oracle's direct aggregation proves the
      // materialize→store→read loop lossless
      val root = graft.Fixtures.newDir("graft_s7into")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "app_"))
      val ctx = graft.api.Api.Context(s, store, now = () => Now)
      graft.api.Api.dispatch(ctx, "cmd.tsdb.query",
        """SELECT mean("value") INTO "gen_default"."click_hourly" FROM "app_click" """ +
          """WHERE time >= '2024-01-01T00:00:00Z' AND time <= '2024-01-31T00:00:00Z' """ +
          """GROUP BY time(1h) FILL(none)""").collect()
      // the +5e-10 nudge shifts the round-6 tie boundary identically in
      // both engines: replica-structured fixtures (sf1) produce means
      // landing EXACTLY on x.xxxxxx5, where the engines' last-ULP
      // summation differences would otherwise round to opposite sides
      graft.api.Api.dispatch(ctx, "cmd.tsdb.query",
        """SELECT "value" FROM "gen_default"."click_hourly" """ +
          """WHERE time >= '2024-01-01T00:00:00Z' AND time <= '2024-01-31T00:00:00Z'""")
        .select(col("time"), round(col("value") + 5e-10, 6).as("value"))
    }),

    "s6_write_api" -> ((s, dir) => {
      // S6 write-API round trip (admin.go:179-204): submit a bounded,
      // deterministic point set through cmd.tsdb.write_data_points (the
      // client-facing DTO path), read it back through
      // cmd.tsdb.get_data_points (the planner path), oracle = the same
      // hourly sum over the ORIGINAL events — loss, duplication, or
      // misroute anywhere in the API dispatch → store → planner chain
      // breaks the hash. Same recipe as s3_roundtrip, one level higher
      // in the stack.
      val root = graft.Fixtures.newDir("graft_s6api")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val ctx = graft.api.Api.Context(s, store, now = () => Now)
      val pts = points(s, dir, "app_")
        .filter(col("measurement") === "app_click" &&
          col("dev_id").cast("long") % 5 === 0)
        .select(col("measurement"), col("time"), col("value"),
          col("dev_id"), col("location_id"))
        .collect().toSeq.map { r =>
          graft.api.Api.WritePoint(r.getAs[String]("measurement"),
            Map("dev_id" -> r.getAs[String]("dev_id"),
              "location_id" -> r.getAs[String]("location_id"),
              "dev_type" -> "sensor", "topic" -> "api:write"),
            Map("value" -> r.getAs[Double]("value")),
            r.getAs[java.sql.Timestamp]("time"))
        }
      graft.api.Api.dispatch(ctx, "cmd.tsdb.write_data_points", pts)
      graft.api.Api.dispatch(ctx, "cmd.tsdb.get_data_points",
        graft.api.Api.GetDataPointsRequest(measurementName = "app_click",
          dataFunction = "sum", relativeTime = "5w", groupByTime = "1h",
          fillType = "none"))
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "s8_catalog" -> ((s, dir) => {
      // S8 catalog scan (influxdb_v1.go:376-394): route a mixed stream
      // through the tiered store, then SHOW MEASUREMENTS via the command
      // API — a pure partition LISTING, no data scan. The oracle derives
      // the expected (tier, measurement) catalog from the original
      // events under the same routing rule (sensor_* high-freq →
      // gen_raw, app_* → gen_default), so a misroute or a listing bug
      // breaks the match.
      val root = graft.Fixtures.newDir("graft_s8cat")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "sensor_").unionAll(points(s, dir, "app_")))
      graft.api.Api.dispatch(graft.api.Api.Context(s, store, now = () => Now),
        "cmd.tsdb.get_measurements", null)
    }),

    // --- the Grafana template-variable catalog forms (round 12): SHOW
    // TAG KEYS / TAG VALUES / FIELD KEYS / SERIES through the raw-query
    // command, against a routed store. TAG/FIELD KEYS are schema-derived
    // (no data scan); TAG VALUES and SERIES are column-pruned distincts
    // over the measurement-pruned scan. ---

    "s12_show_meas_regex" -> ((s, dir) => {
      // round-14: SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ — the
      // Grafana template-variable form; the pattern filters the catalog
      // LISTING (metadata-sized, no data scan), unanchored
      val root = graft.Fixtures.newDir("graft_s12m")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "sensor_").unionAll(points(s, dir, "app_")))
      graft.api.Api.dispatch(graft.api.Api.Context(s, store, now = () => Now),
        "cmd.tsdb.query",
        "SHOW MEASUREMENTS WITH MEASUREMENT =~ /^sensor_(click|view)$/")
    }),

    "s12_show_keys" -> ((s, dir) => {
      val root = graft.Fixtures.newDir("graft_s12k")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.write(graft.model.Tier.GenDefault, points(s, dir, "app_"))
      val ctx = graft.api.Api.Context(s, store, now = () => Now)
      val tk = graft.api.Api.dispatch(ctx, "cmd.tsdb.query",
        """SHOW TAG KEYS FROM "app_view"""")
        .select(lit("tag").as("kind"), col("tag_key").as("k"),
          col("measurement").as("v"))
      val fk = graft.api.Api.dispatch(ctx, "cmd.tsdb.query", "SHOW FIELD KEYS")
        .select(lit("field").as("kind"), col("field_key").as("k"),
          col("field_type").as("v"))
      tk.unionAll(fk)
    }),

    "s12_show_tag_values" -> ((s, dir) => {
      val root = graft.Fixtures.newDir("graft_s12tv")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.write(graft.model.Tier.GenDefault, points(s, dir, "app_"))
      graft.api.Api.dispatch(graft.api.Api.Context(s, store, now = () => Now),
        "cmd.tsdb.query",
        """SHOW TAG VALUES FROM "app_view" WITH KEY = "location_id"""")
    }),

    "s12_show_series" -> ((s, dir) => {
      val root = graft.Fixtures.newDir("graft_s12sr")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.write(graft.model.Tier.GenDefault, points(s, dir, "app_"))
      graft.api.Api.dispatch(graft.api.Api.Context(s, store, now = () => Now),
        "cmd.tsdb.query", """SHOW SERIES FROM "app_click"""")
    }),

    // --- ingest: sources / filters / topic match / enrichment / transform ---

    "s2_log_replay" -> ((s, dir) => {
      // events → tai64n log lines → LogReplay.parse → typed rows; the
      // round-trip must reproduce the original event stream exactly
      val e = events(s, dir).select(
        concat(lit("pt:j1/mt:evt/rt:dev/rn:t/ad:1/sv:sensor_temp/ad:"),
          col("event_id").cast("string")).as("topic"),
        lit("sensor_temp").as("serv"), lit("evt.sensor.report").as("msg_type"),
        lit("float").as("val_t"), col("value").cast("string").as("val_json"),
        map(lit("unit"), lit("C")).as("props"), lit("app").as("src"),
        col("ts").as("time"))
      val lines = e.select(graft.sources.LogReplay.format(e).as("value"))
      graft.sources.LogReplay.parse(lines).select(
        regexp_extract(col("topic"), "/ad:(\\d+)$", 1).cast("long").as("event_id"),
        unix_timestamp(col("time")).as("time_sec"),
        col("val_json").cast("double").as("value"),
        col("serv"), col("domain"))
    }),

    "f2_filter_chain" -> ((s, dir) => {
      val filters = Seq(
        Filter(id = 1, service = "serv_error", negation = true,
          linkedFilterBooleanOperation = "and", linkedFilterId = 2),
        Filter(id = 2, msgType = "evt.sensor.report", isAtomic = false,
          linkedFilterBooleanOperation = "or", linkedFilterId = 3),
        Filter(id = 3, service = "serv_click", isAtomic = false))
      val f = fimpLite(s, dir)
      f.filter(FilterCompiler.compile(filters)).select(col("event_id"))
    }),

    "f3_topic_wildcard" -> ((s, dir) => {
      val f = fimpLite(s, dir)
      f.filter(TopicMatch.matches(col("topic"), "pt:j1/mt:evt/+/+/+/sv:serv_click/#"))
        .select(col("event_id"))
    }),

    "p3_metadata_enrich" -> ((s, dir) => {
      val f = fimpLite(s, dir).filter(col("serv") === "serv_view")
      val meta = events(s, dir).select(col("user_id")).distinct().select(
        concat(lit("/rt:dev/rn:t/ad:1/sv:serv_view/ad:"), col("user_id").cast("string")).as("address"),
        col("user_id").cast("int").as("device_id"),
        (col("user_id") % 5).cast("int").as("location_id"),
        when(col("user_id") % 7 === 0, "meter.main_elec").otherwise("sensor").as("device_type"))
      MetadataStore.enrich(f, meta)
        .select(col("event_id"), col("dev_id"), col("location_id"), col("dev_type"))
    }),

    "p5_transform" -> ((s, dir) => {
      Transform(fimp(s, dir)).select(
        col("measurement"), unix_timestamp(col("time")).as("time_sec"),
        col("dir"), round(col("value"), 6).as("value"), col("unit"),
        col("agg_func"), col("series_id"))
    }),

    "p6_typed_extraction" -> ((s, dir) => {
      // exercise the bool/int/string/null/object val_t arms of the
      // transform's typed-value switch (transform.go:299-336)
      val e = events(s, dir)
      val valT = element_at(
        array(lit("float"), lit("int"), lit("bool"), lit("string"), lit("null"), lit("object")),
        (col("event_id") % 6).cast("int") + 1)
      val valJson = when(valT === "float", col("value").cast("string"))
        .when(valT === "int", floor(col("value")).cast("long").cast("string"))
        .when(valT === "bool", (col("event_id") % 2 === 0).cast("string"))
        .when(valT === "string", col("event_type"))
        .when(valT === "null", lit(""))
        .otherwise(lit("{\"a\":1}"))
      val f = e.select(
        concat(lit("t/"), col("event_id").cast("string")).as("topic"),
        lit("dev_sys").as("serv"), lit("evt.x.report").as("msg_type"),
        valT.as("val_t"), valJson.as("val_json"),
        map(lit("unit"), lit("u")).as("props"),
        lit("app").as("src"), lit("x").as("domain"), col("ts").as("time"))
      Transform(f).select(
        regexp_extract(col("topic"), "^t/(\\d+)$", 1).cast("long").as("event_id"),
        col("value"), col("value_bool"), col("value_str"), col("unit"))
    }),

    "p10_transform_fn" -> ((s, dir) => {
      // transform_function=abs over a difference'd hourly mean (P10)
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1h", dataFunction = "mean", fillType = "none",
        transformFunction = "difference"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(abs(col("value")), 6))
        .filter(col("value").isNotNull)
    }),

    "a3_hourly_profile" -> ((s, dir) => {
      // A3: the hourly-profile (meter.main_elec) branch of the difference
      // fold — per 10-min window Σ max(Δ,0) with seed carry-over, the
      // 120-min staleness wipe, the ≤100 sanity bound, zero suppression,
      // and the previous-hour :59 time shift. This branch has no
      // running-emission state (suppression is result≠0 only), so it IS
      // SQL-expressible — the oracle models the fold as per-pair delta
      // contributions assigned to the pair's right-endpoint window, a
      // pair being wiped iff its window start is >120 min past the left
      // endpoint (exactly when the fold's boundary flushes empty the
      // buffer). The sensor branch (recursive lastEmitted suppression) is
      // covered by a2's oracle + exact reference unit vectors.
      Aggregator.difference(
        cumPoints(s, dir, "electricity_meter_energy_sampled", Some(80.0))
          .withColumn("agg_func", lit("difference"))
          .withColumn("dev_type", lit("meter.main_elec")), 10)
        .select(col("series_id"), unix_timestamp(col("time")).as("time_sec"),
          round(col("value"), 6).as("value"))
    }),

    "f9_staleness" -> ((s, dir) => {
      // F9: the 120-min staleness guard (agreggator.go:236-241) as a
      // DEDICATED oracle. The events fixture is sparse per series
      // (median consecutive gap ≈ 7.3 h at sf0.01; ~82% of pairs exceed
      // the cutoff) and the hour-of-day thinning below removes 2-of-6
      // hour blocks, widening gaps further — so the oracle's wipe arm
      // (bucket start > 120 min past the previous point ⇒ contribute 0)
      // is load-bearing: drop it from either side and the hash breaks.
      // Same SQL-expressible hourly fold branch as a3, distinct series
      // (mod-60 counter) and fixture.
      Aggregator.difference(
        cumPoints(s, dir, "f9_meter", Some(60.0))
          .filter(hour(col("time")) % 6 < 4)
          .withColumn("agg_func", lit("difference"))
          .withColumn("dev_type", lit("meter.main_elec")), 10)
        .select(col("series_id"), unix_timestamp(col("time")).as("time_sec"),
          round(col("value"), 6).as("value"))
    }),

    "f7_tier_routing" -> ((s, dir) => {
      // F7: the high/low-frequency classifier + write-tier routing as a
      // plan column (mapping.go:146-168), over measurement names derived
      // from the events table plus the reference's edge cases
      import graft.query.TierPolicy
      val e = events(s, dir)
      val names = e.select(concat(lit("sensor_"), col("event_type")).as("measurement"))
        .union(e.select(concat(lit("app_"), col("event_type")).as("measurement")))
        .union(e.limit(1).select(lit("electricity_meter_energy_sampled").as("measurement")))
        .union(e.limit(1).select(lit("sensor_presence.evt.report").as("measurement")))
        .union(e.limit(1).select(lit("electricity_meter_power").as("measurement")))
        .distinct()
      names.select(col("measurement"),
        TierPolicy.isHighFrequencyCol(col("measurement")).as("high_freq"),
        TierPolicy.writeTierCol(col("measurement"), "optimized").as("tier"))
    }),

    "f8_iqr_outliers" -> ((s, dir) => {
      val e = events(s, dir).filter(col("event_type") === "view")
        .withColumn("v", col("value") * col("value") * col("value") * col("value") * col("value"))
      val stats = e.groupBy(col("user_id"))
        .agg(percentile(col("v"), lit(0.25)).as("q1"), percentile(col("v"), lit(0.75)).as("q3"))
      e.join(stats, "user_id")
        .filter(col("v") < col("q1") - (col("q3") - col("q1")) * 3 ||
          col("v") > col("q3") + (col("q3") - col("q1")) * 3)
        .select(col("event_id"))
    }),

    // --- query planner: bucketing / grouping / fill / tiers (A4-A10) ---

    "a5_time_bucket" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_click", relativeTime = "5w",
        groupByTime = "1h", dataFunction = "mean"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a4_agg_last" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1h", dataFunction = "last", fillType = "none"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a6_group_by_tag" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_purchase", relativeTime = "5w",
        groupByTag = "location_id"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), col("value"), col("location_id"))
    }),

    "a7_time_tag_fill_zero" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_signup", relativeTime = "5w",
        groupByTime = "6h", groupByTag = "location_id",
        dataFunction = "sum", fillType = "0"),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a14_fill_linear" -> ((s, dir) => {
      // FILL(linear): interpolate gaps between neighboring non-null
      // buckets per tag (InfluxQL linear fill; A8 family)
      Planner.dataPoints(DataPointsRequest("app_signup", relativeTime = "5w",
        groupByTime = "6h", groupByTag = "location_id",
        dataFunction = "mean", fillType = "linear"),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a15_percentile" -> ((s, dir) => {
      // InfluxQL PERCENTILE(95) via the open function namespace
      Planner.dataPoints(DataPointsRequest("app_click", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "percentile_95", fillType = "none"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    // --- the widened InfluxQL function namespace (the reference forwards
    // any data_function / transform_function string verbatim into
    // InfluxQL, influxdb_v1.go:167,184 — a migrating user's dashboards
    // use these; each gets its own oracle). Untagged sequential
    // transforms run the BLOCKED global prefix scan (1-minute buckets
    // over 5 weeks span >1 block), so these oracles pin the scale path,
    // not just the window semantics. ---

    "a16_derivative" -> ((s, dir) => {
      // DERIVATIVE(mean(value), 1m) — rate of change of the per-minute
      // mean, untagged → blocked prefix scan
      Planner.dataPoints(DataPointsRequest("app_click", relativeTime = "5w",
        groupByTime = "1m", dataFunction = "mean", fillType = "none",
        transformFunction = "derivative_1m"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(col("value"), 6))
        .filter(col("value").isNotNull)
    }),

    "a17_moving_average" -> ((s, dir) => {
      // ROUND then MOVING_AVERAGE(.., 7): integer summands make the
      // blocked prefix-sum arithmetic exact in any summation order
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1m", dataFunction = "mean", fillType = "none",
        transformFunction = "round,moving_average_7"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(col("value"), 6))
        .filter(col("value").isNotNull)
    }),

    "a18_cumulative_sum" -> ((s, dir) => {
      // ROUND then CUMULATIVE_SUM — running total in global time order
      // (blocked scan; integer summands, see a17)
      Planner.dataPoints(DataPointsRequest("app_purchase", relativeTime = "5w",
        groupByTime = "1m", dataFunction = "mean", fillType = "none",
        transformFunction = "round,cumulative_sum"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(col("value"), 6))
        .filter(col("value").isNotNull)
    }),

    "a19_top" -> ((s, dir) => {
      // TOP(value, 3) per day bucket — points keep their own timestamps
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "top_3"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a20_integral" -> ((s, dir) => {
      // INTEGRAL(value, 1h) per 6h bucket — trapezoid area over
      // fractional-epoch point times
      Planner.dataPoints(DataPointsRequest("app_signup", relativeTime = "5w",
        groupByTime = "6h", dataFunction = "integral_1h", fillType = "none"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a21_mode" -> ((s, dir) => {
      // MODE per day over floor-quantized values (repeats make the
      // most-frequent-value and ties-to-lowest contract observable)
      Planner.dataPoints(DataPointsRequest("app_click", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "mode", fillType = "none",
        fieldName = "vq"),
        _ => points(s, dir, "app_").withColumn("vq", floor(col("value")).cast("double")), Now)
    }),

    "a22_distinct" -> ((s, dir) => {
      // DISTINCT per day over floor-quantized values (multi-row output)
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "distinct", fieldName = "vq"),
        _ => points(s, dir, "app_").withColumn("vq", floor(col("value")).cast("double")), Now)
    }),

    "a23_elapsed" -> ((s, dir) => {
      // ELAPSED(.., 1m): whole minutes since the previous bucket with
      // data (untagged → blocked scan; integer output)
      Planner.dataPoints(DataPointsRequest("app_purchase", relativeTime = "5w",
        groupByTime = "1m", dataFunction = "mean", fillType = "none",
        transformFunction = "elapsed_1m"),
        _ => points(s, dir, "app_"), Now)
        .filter(col("value").isNotNull)
    }),

    "a24_math_chain" -> ((s, dir) => {
      // scalar math chain ceil(log10(sqrt(mean))) per (6h, location)
      Planner.dataPoints(DataPointsRequest("app_signup", relativeTime = "5w",
        groupByTime = "6h", groupByTag = "location_id",
        dataFunction = "mean", fillType = "none",
        transformFunction = "sqrt,log10,ceil"),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), col("value"))
    }),

    "a25_count_distinct" -> ((s, dir) => {
      // COUNT(DISTINCT(..)) per day over floor-quantized values
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "count_distinct", fillType = "none",
        fieldName = "vq"),
        _ => points(s, dir, "app_").withColumn("vq", floor(col("value")).cast("double")), Now)
    }),

    "a26_nn_derivative" -> ((s, dir) => {
      // NON_NEGATIVE_DERIVATIVE(.., 1h) over a FILL(previous) series per
      // location — negative rates null out; the filled repeats pin the
      // exactly-zero boundary in both engines
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "6h", groupByTag = "location_id",
        dataFunction = "mean", fillType = "previous",
        transformFunction = "non_negative_derivative_1h"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(col("value"), 6))
        .filter(col("value").isNotNull)
        .select(col("location_id"), col("time"), col("value"))
    }),

    "a27_nn_difference" -> ((s, dir) => {
      // NON_NEGATIVE_DIFFERENCE over hourly means, untagged → blocked
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1h", dataFunction = "mean", fillType = "none",
        transformFunction = "non_negative_difference"),
        _ => points(s, dir, "app_"), Now)
        .withColumn("value", round(col("value"), 6))
        .filter(col("value").isNotNull)
    }),

    "a28_bottom" -> ((s, dir) => {
      // BOTTOM(value, 2) per (day, location) — the keyed selector path
      Planner.dataPoints(DataPointsRequest("app_signup", relativeTime = "5w",
        groupByTime = "1d", groupByTag = "location_id",
        dataFunction = "bottom_2"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"), col("location_id"))
    }),

    "a30_ema" -> ((s, dir) => {
      // EXPONENTIAL_MOVING_AVERAGE(mean, 3) per (6h, location) — the
      // keyed sequential fold; α = 2/(3+1) = 0.5 exactly
      Planner.dataPoints(DataPointsRequest("app_purchase", relativeTime = "5w",
        groupByTime = "6h", groupByTag = "location_id",
        dataFunction = "mean", fillType = "none",
        transformFunction = "exponential_moving_average_3"),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a31_ema_blocked" -> ((s, dir) => {
      // untagged EMA over per-minute means — the blocked AFFINE scan,
      // chained after sqrt. The recurrence block-decomposes exactly but
      // its float ops reassociate vs the oracle's sequential fold; the
      // raw 2-decimal data is dyadic under α = 1/2, which lands EMA
      // values exactly on decimal rounding midpoints (measured at both
      // round(6) and round(5) on sf0.01), so the sqrt first makes the
      // inputs irrational — the ~1e-15 reassociation noise then sits a
      // measure-zero distance from any rounding boundary
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1m", dataFunction = "mean", fillType = "none",
        transformFunction = "sqrt,exponential_moving_average_3"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a29_integral_range" -> ((s, dir) => {
      // whole-range INTEGRAL(value, 1h) — no bucket, no tag: the blocked
      // prefix scan feeds a single trapezoid sum. Rounded to 3 decimals:
      // a ~10k-term double sum carries ~1e-8 reassociation noise.
      Planner.dataPoints(DataPointsRequest("app_click", relativeTime = "5w",
        dataFunction = "integral_1h"),
        _ => points(s, dir, "app_"), Now)
        .select(round(col("value"), 3).as("value"))
    }),

    "a32_order_limit" -> ((s, dir) => {
      // ORDER BY time DESC LIMIT 24 OFFSET 2 — the last day of hourly
      // means minus the two newest buckets (untagged: TakeOrdered +
      // a row_number over the limit-bounded frame)
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1h", dataFunction = "mean", fillType = "none",
        orderDesc = true, limit = 24, offset = 2),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a33_limit_per_series" -> ((s, dir) => {
      // LIMIT 3 per series (InfluxQL's per-series cut) with a tag
      // grouping: each location's three OLDEST daily sums
      Planner.dataPoints(DataPointsRequest("app_purchase", relativeTime = "5w",
        groupByTime = "1d", groupByTag = "location_id",
        dataFunction = "sum", fillType = "none", limit = 3),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a34_slimit" -> ((s, dir) => {
      // SLIMIT 2 SOFFSET 1: the series-count cut in key order — the
      // 2nd and 3rd locations' hourly means, composed with a per-series
      // newest-6 point cut
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1h", groupByTag = "location_id",
        dataFunction = "mean", fillType = "none",
        orderDesc = true, limit = 6, sLimit = 2, sOffset = 1),
        _ => points(s, dir, "app_"), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a8_fill_previous" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "5w",
        groupByTime = "1h", fillType = "previous",
        filters = DataPointsFilter(tags = Map("dev_id" -> "7"))),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a9_downsample_cascade" -> ((s, dir) => {
      val casc = Downsampler.cascade(points(s, dir, "sensor_"))
      Planner.dataPoints(DataPointsRequest("sensor_click",
        fromTime = "2024-01-01T00:00:00Z", toTime = "2024-01-31T00:00:00Z",
        groupByTime = "2h", dataFunction = "mean"),
        t => casc(t.name), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "a10_energy" -> ((s, dir) => {
      Planner.energyDataPoints("5w", "", "", "1d", "location_id",
        DataPointsFilter(tags = Map("dir" -> "import")),
        _ => cumPoints(s, dir, "electricity_meter_energy_sampled", None), Now)
        .select(col("location_id"), col("time"), round(col("value"), 6).as("value"))
    }),

    "a11_regroup" -> ((s, dir) => {
      val meta = events(s, dir).select(col("user_id")).distinct().select(
        col("user_id").cast("int").as("device_id"),
        (col("user_id") % 5).cast("int").as("location_id"),
        lit("sensor").as("device_type"))
      val groups = MetadataStore.devicesGroupedBy(meta, "location")
      points(s, dir, "sensor_").filter(col("measurement") === "sensor_view")
        .join(broadcast(groups), "dev_id")
        .groupBy((floor(unix_timestamp(col("time")) / 3600) * 3600).cast("long").as("time"),
          col("group"))
        .agg(round(sum(col("value")), 6).as("value"))
    }),

    "a12_count" -> ((s, dir) => {
      Planner.dataPoints(DataPointsRequest("app_error", relativeTime = "2w",
        groupByTime = "1m", dataFunction = "count", fillType = "none"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), col("value"))
    }),

    "a13_stddev" -> ((s, dir) => {
      // A4 extension: sample standard deviation per daily bucket
      // (InfluxQL STDDEV; open function namespace, influxdb_v1.go:167)
      Planner.dataPoints(DataPointsRequest("app_view", relativeTime = "5w",
        groupByTime = "1d", dataFunction = "stddev", fillType = "none"),
        _ => points(s, dir, "app_"), Now)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    // --- streaming-side aggregation operators, batch-planned (A1, A2) ---

    "a1_stream_agg" -> ((s, dir) => {
      val pts = events(s, dir).select(
        concat(lit("sensor_"), col("event_type")).as("measurement"),
        col("ts").as("time"),
        round(col("value") * 100).cast("long").cast("double").as("value"),
        element_at(array(lit("mean"), lit("min"), lit("max"), lit("sum"), lit("last")),
          (col("user_id") % 5).cast("int") + 1).as("agg_func"),
        concat(lit("sensor_"), col("event_type"), lit(";"),
          col("user_id").cast("string")).as("series_id"))
      Aggregator.aggregate(pts, 30).select(
        col("series_id"), col("measurement"), col("agg_func"),
        unix_timestamp(col("time")).as("time_sec"), round(col("value"), 6).as("value"))
    }),

    "a2_counter_diff" -> ((s, dir) => {
      Aggregator.windowedDifference(
        cumPoints(s, dir, "meter", Some(50.0)), 10)
        .select(col("series_id"), col("measurement"), col("time_sec"), col("value"))
    }),

    // --- text analysis ---

    "text_tokens" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("token_count"),
        TextFunctions.wordCount(col("text")).as("word_count"),
        round(TextFunctions.meanWordLength(col("text")), 6).as("mean_word_len"))
    }),

    "text_bpe" -> ((s, dir) => {
      // BPE pre-tokenizer parity: piece count plus an md5 over the
      // SOH(\u0001)-joined pieces — a hash match proves every token boundary
      // (not just the count) is identical cross-engine
      table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        md5(concat_ws("\u0001", TextFunctions.bpeTokens(col("text"))))
          .as("tok_md5"))
    }),

    "text_langid" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
    }),

    "text_quality" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"), TextFunctions.qualityScore(col("text")).as("score"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents").select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
    }),

    "text_repetition" -> ((s, dir) => {
      // Gopher-style within-document repetition signals; the fractions
      // are integer-quantized (floor(x·1e6+0.5)) for cross-engine hash
      // parity — round() half-case rules differ on raw doubles
      val r = TextFunctions.repetitionSignals(col("text"))
      def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("long")
      table(s, dir, "documents").select(col("doc_id"), r.as("_r"))
        .select(col("doc_id"),
          q6(col("_r.dup_line_frac")).as("dup_line_q6"),
          q6(col("_r.dup_word_frac")).as("dup_word_q6"),
          q6(col("_r.dup_3gram_frac")).as("dup_3gram_q6"))
    }),

    "decon_overlap" -> ((s, dir) => {
      // train/eval decontamination: every 10th document plays the
      // benchmark set; corpus docs sharing any distinct word 4-gram are
      // flagged with their distinct-hit count (portable md5 keys → the
      // DuckDB oracle reproduces the join bit-for-bit)
      val docs = table(s, dir, "documents")
      graft.functions.Decontaminate.flagContaminated(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 4)
    }),

    // --- dedup ---

    "pipe_clean_corpus" -> ((s, dir) => {
      // composite cleanup pipeline: language filter + quality floor +
      // prefix-fingerprint exact dedup (keep lowest id)
      graft.functions.Pipeline.cleanCorpus(table(s, dir, "documents"),
        lang = "en", minQuality = 0.3,
        dedupKey = Some(md5(trim(substring(TextFunctions.normalize(col("text")), 1, 64)))))
    }),

    "text_stats" -> ((s, dir) => {
      // per-source corpus report: volumes + exact-unique count
      graft.functions.Pipeline.corpusStats(table(s, dir, "documents"))
    }),

    "text_dedup_lines" -> ((s, dir) =>
      // C4-style cross-document boilerplate scrub: lines occurring > 2
      // times corpus-wide are dropped, docs reassembled in line order
      graft.functions.Pipeline.dedupLines(table(s, dir, "documents"),
        maxOccurrences = 2)),

    "text_vocab_encode" -> ((s, dir) => {
      // top-100 vocabulary by (count desc, token) + per-doc encoding
      // summary (token/OOV counts, positional id checksum)
      val docs = table(s, dir, "documents")
      val vocab = graft.functions.Vocab.build(docs, 100)
      graft.functions.Vocab.encode(docs, vocab, oovId = 100)
    }),

    "text_tfidf" -> ((s, dir) =>
      // top-5 TF-IDF terms per document; quantized-score ranking with
      // (score, term) tie-break so the order is engine-independent
      graft.functions.Pipeline.topTfidfTerms(table(s, dir, "documents"))),

    "text_lm_score" -> ((s, dir) =>
      // CCNet-style LM quality score: self-trained bigram model with
      // add-one smoothing; mean per-token log-prob in integer 1e-4 nats
      // (each token's ln is quantized BEFORE the order-independent
      // integer sum, so any engine replicates the mean bit-for-bit)
      graft.functions.LanguageModel.scoreSelf(table(s, dir, "documents"))),

    "text_chunks" -> ((s, dir) =>
      // 64-token chunks with 16-token overlap (stride 48); content
      // pinned by md5 of the space-joined token window
      graft.functions.Pipeline.chunkDocuments(table(s, dir, "documents"),
        maxTokens = 64, overlap = 16)),

    "text_clean" -> ((s, dir) => {
      // corpus cleanup chain on doctored rows: every document gets
      // deterministic markup + PII planted (entity-encoded amp, script
      // block, per-doc email/phone/ip/card), then stripHtml → redactPii
      val doctored = table(s, dir, "documents").withColumn("dirty",
        concat(lit("<div class=x>"), col("text"),
          lit("</div><script>var a=1;</script> Contact: user"),
          col("doc_id").cast("string"), lit("@example.com &amp; +47 22 33 44 55, ip 10.0.0."),
          (col("doc_id") % 200).cast("string"), lit(" card 4111 1111 1111 1111.")))
      doctored.select(col("doc_id"),
        TextFunctions.redactPii(TextFunctions.stripHtml(col("dirty"))).as("clean"))
    }),

    "dedup_exact" -> ((s, dir) => {
      val keyed = table(s, dir, "documents")
        .withColumn("text", substring(TextFunctions.normalize(col("text")), 1, 64))
      Dedup.exact(keyed).select(col("fp"), col("doc_id"), col("copies"))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3, threshold = 0.8,
        maxShingleFreq = Int.MaxValue)
    }),

    "dedup_winnow_pairs" -> ((s, dir) =>
      // containment detection: pairs sharing >= 2 winnowing fingerprints
      // (k=4-gram hashes, window 4; portable md5 mode for the oracle)
      Dedup.winnowPairs(table(s, dir, "documents"), k = 4, w = 4, minShared = 2)),

    "dedup_minhash" -> ((s, dir) => {
      Dedup.minhashLshPairs(table(s, dir, "documents"), n = 3, k = 64, bands = 16,
        threshold = 0.8)
    }),

    "dedup_incremental" -> ((s, dir) => {
      // daily-ingest dedup: every 10th document plays the incoming batch,
      // the rest are a PERSISTED MinHash index (band buckets + shingle
      // sets in parquet); the batch joins the index at O(batch) cost.
      // Oracle = exact cross-set Jaccard pairs — banding recall at 0.8
      // with 16×4 bands is what makes them equal
      val docs = table(s, dir, "documents")
      val root = graft.Fixtures.newDir("graft_mhidx")
        .toFile.getAbsolutePath
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 10 =!= 0), root)
      Dedup.queryMinhashIndex(s, docs.filter(col("doc_id") % 10 === 0), root)
    }),

    "dedup_spans" -> ((s, dir) =>
      // exact substring-level dedup (Lee et al. 2022): merged spans of
      // 20-token runs occurring ≥2 times corpus-wide; portable md5-60bit
      // window keys so DuckDB replicates the posting join bit-for-bit
      Dedup.duplicateSpans(table(s, dir, "documents"), w = 20)),

    "dedup_spans_cut" -> ((s, dir) => {
      // detect→cut: documents rewritten with every ≥2-occurrence 20-token
      // run removed (token-stream view); fully-duplicated docs vanish
      val docs = table(s, dir, "documents")
      Dedup.cutSpans(docs, Dedup.duplicateSpans(docs, w = 20))
    }),

    "dedup_clusters" -> ((s, dir) => {
      // near-dup CLUSTERS: connected components over the exact-Jaccard
      // pair list via iterative min-label propagation; every clustered doc
      // labeled with the min doc_id of its component
      val pairs = Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3,
        threshold = 0.8, maxShingleFreq = Int.MaxValue)
      Dedup.clusters(pairs).select(col("id").as("doc_id"), col("cluster"))
    }),

    "samp_bernoulli" -> ((s, dir) => {
      // deterministic hash-gated Bernoulli sample (curation keep-rate)
      graft.functions.Sampling.sampleByHash(table(s, dir, "documents"), "doc_id", 0.25)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    "samp_split" -> ((s, dir) => {
      // deterministic 90/5/5 train/val/test split by doc_id hash
      graft.functions.Sampling.hashSplit(table(s, dir, "documents"),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split"))
    }),

    "samp_mixture" -> ((s, dir) => {
      // domain-mixing rates: src0 kept at 100%, src1 at 50%, others 10%
      graft.functions.Sampling.mixtureByGroup(table(s, dir, "documents"),
        "source", "doc_id", Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.1)
        .select(col("doc_id"), col("source"))
    }),

    "samp_top_quality" -> ((s, dir) => {
      // quantile curation: top 20% of each source by quality score,
      // deterministic (score desc, doc_id) rank
      graft.functions.Sampling.topFractionPerGroup(
        table(s, dir, "documents"), "source",
        TextFunctions.qualityScore(col("text")), frac = 0.2, tieCol = "doc_id")
        .select(col("doc_id"), col("source"))
    }),

    "samp_pack" -> ((s, dir) => {
      // deterministic sequence packing: 8 hash buckets, 512-token budget,
      // concat-then-chop positions (bucket, seq_id, tok_offset) per doc
      graft.functions.Sampling.packSequences(table(s, dir, "documents"),
        "doc_id", TextFunctions.tokenCount(col("text")), budget = 512, nBuckets = 8)
    }),

    "samp_dsir" -> ((s, dir) => {
      // DSIR importance weights: target = src0 documents, raw = the whole
      // corpus; hashed-bigram multinomials, quantized log-ratio sums
      val docs = table(s, dir, "documents")
      graft.functions.Importance.weights(docs,
        docs.filter(col("source") === "src0"), docs, nBuckets = 4096)
    }),

    "samp_cap_source" -> ((s, dir) => {
      // per-source quota: the 10 smallest (hash-uniform, id) docs per
      // source — two-phase pre-filter + exact rank, matched against the
      // oracle's full-window formulation (binds at every SF: 25+ docs/source)
      graft.functions.Sampling.capPerGroup(table(s, dir, "documents"),
        "source", "doc_id", n = 10)
        .select(col("doc_id"), col("source"))
    }),

    "dedup_simhash" -> ((s, dir) => {
      // portable (md5-based, 60-bit) signature mode so DuckDB reproduces
      // the hash bits exactly; blocking/verification identical to the
      // xxhash64 scale default. Docs with no tokens are excluded (their
      // empty-vote signature is 0, which is not a meaningful near-dup key).
      Dedup.simhashPairs(
        table(s, dir, "documents")
          .filter(size(TextFunctions.tokens(col("text"))) > 0),
        maxDist = 3, portable = true)
    }),

    // --- similarity search ---

    "sim_cosine_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
    }),

    "sim_cosine_pairs" -> ((s, dir) => {
      Similarity.bruteForcePairs(table(s, dir, "embeddings"), threshold = 0.4)
    }),

    "sim_lsh_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10, nPlanes = 6)
    }),

    "sim_lsh_pairs" -> ((s, dir) => {
      // LSH-blocked near-dup pairs — the SCALE path for sim_cosine_pairs
      // (bucketed equi-join instead of a broadcast cross join); portable
      // plane generator → exact DuckDB oracle of the blocked result
      Similarity.cosineNearDupPairs(table(s, dir, "embeddings"),
        threshold = 0.4, nPlanes = 6)
    }),

    "sim_quantize" -> ((s, dir) => {
      // int8 embedding quantization, verified via a positional checksum
      // (Σ (i+1)·qᵢ) + scale — scalar columns because the compare layer
      // sorts rows by value (list columns don't sort). The scale is
      // integer-quantized with floor(x·1e6+0.5) rather than round(x, 6):
      // round() half-case rules on raw doubles differ between engines
      // (Spark BigDecimal HALF_UP vs DuckDB), while floor on the shared
      // IEEE product is bit-identical.
      val quant = Similarity.quantizeInt8(col("embedding"))
      table(s, dir, "embeddings")
        .select(col("vec_id"), quant.as("_qt"))
        .select(col("vec_id"),
          floor(col("_qt.scale") * lit(1e6) + lit(0.5)).cast("long").as("scale_q6"),
          aggregate(
            transform(col("_qt.q"), (x, i) => x.cast("long") * (i + lit(1)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("qsum"))
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      // full-probe IVF ≡ brute force → shares the brute-force oracle
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
        nLists = 16, nProbes = 16)
    }),

    "sim_ivf_stream" -> ((s, dir) => {
      // STREAMING IVF index maintenance e2e (Similarity.
      // streamingIvfAppend): build the index on the even half of the
      // corpus, stream the odd half in micro-batches onto the frozen
      // centroids (EXACTLY-ONCE per batch via the index ledger), run
      // the selective small-file fold, then probe with
      // nProbes = nLists — a full probe ≡ brute force over the FULL
      // corpus, so the oracle pins that the streamed index holds
      // exactly every vector (none lost, none duplicated, scored
      // exactly); the embedding counterpart of dedup_incremental
      val work = graft.Fixtures.newDir("graft_ivfs")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings")
      val incoming = emb.filter(col("vec_id") % 2 === 1)
      // stream input is immutable and whole-in — written once per JVM
      // (cachedInput, the monitor idiom); checkpoint stays per-run
      val in = cachedInput(s"ivfs:$dir")(p => incoming.write.parquet(p))
      graft.functions.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
        // 1 train iter: centroid quality is fixture setup here — the
        // full-probe query is centroid-independent (≡ brute force)
        nLists = 8, trainIters = 1)
      val q = graft.functions.Similarity.streamingIvfAppend(
        s.readStream.schema(incoming.schema).parquet(in),
        s"$work/idx", s"$work/ckpt")
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      graft.functions.Similarity.compactIvfLists(s, s"$work/idx", minFiles = 2)
      graft.functions.Similarity.queryIvfIndex(s, s"$work/idx",
        emb.filter(col("vec_id") < 5), k = 10, nProbes = 8)
    }),

    "sim_ivf_asof" -> ((s, dir) => {
      // AS-OF PINNED ANN (round-11 ask #2): build on the evens, stream
      // phase A (vec_id % 4 == 1) onto the frozen centroids, PIN the
      // index from its own storage records (pinIvfIndex), stream phase
      // B (vec_id % 4 == 3), then run a HISTORY-RETAINING fold — and
      // probe the pin at full probes. Full probe ≡ brute force, so the
      // oracle pins that the as-of read resolves EXACTLY the pinned
      // corpus (evens + phase A): phase B's ledgered appends and the
      // fold's rewrite are both invisible to the pin, which is the
      // training-run reproducibility contract the tier store already
      // carries, extended to the streamed index
      val work = graft.Fixtures.newDir("graft_ivfp")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings")
      val phaseA = emb.filter(col("vec_id") % 4 === 1)
      // index build and phase-A landing are independent — overlap them
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => graft.functions.Similarity.buildIvfIndex(
          emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
          nLists = 8, trainIters = 1),
        () => phaseA.write.parquet(s"$work/in"))): Unit
      val q = graft.functions.Similarity.streamingIvfAppend(
        s.readStream.schema(phaseA.schema).parquet(s"$work/in"),
        s"$work/idx", s"$work/ckpt")
      q.processAllAvailable()
      val pin = graft.functions.Similarity.pinIvfIndex(s, s"$work/idx")
      emb.filter(col("vec_id") % 4 === 3).write.mode("append")
        .parquet(s"$work/in")
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      graft.functions.Similarity.compactIvfLists(s, s"$work/idx",
        minFiles = 2, retainHistory = true)
      graft.functions.Similarity.queryIvfIndex(s, s"$work/idx",
        emb.filter(col("vec_id") < 5), k = 10, nProbes = 8,
        asOf = Some(pin))
    }),

    "sim_ivf_rebuild" -> ((s, dir) => {
      // ATOMIC REBUILD e2e (round-11): build on the evens (8 lists),
      // ledger-append the odds, then RETRAIN AND REBUILD the whole
      // index as generation 1 with a DIFFERENT list count — and probe
      // the new generation at full probes. Full probe ≡ brute force
      // over the full corpus, so the oracle pins that the retrain/
      // re-assign/swap cycle lost nothing and duplicated nothing; the
      // pre-rebuild batch is replayed after the swap and must SKIP
      // (the generation-shared ledger), which the row count makes
      // hash-visible
      val work = graft.Fixtures.newDir("graft_ivfr")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings")
      graft.functions.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
        nLists = 8, trainIters = 1)
      val odds = emb.filter(col("vec_id") % 2 === 1)
      graft.functions.Similarity.appendIvfBatch(odds, s"$work/idx", 0L): Unit
      graft.functions.Similarity.rebuildIvfIndex(s, s"$work/idx",
        nLists = 4, trainIters = 1)
      // a crash replay of the pre-rebuild batch must skip, not re-append
      require(!graft.functions.Similarity.appendIvfBatch(odds, s"$work/idx", 0L),
        "pre-rebuild batch replayed into the new generation")
      graft.functions.Similarity.queryIvfIndex(s, s"$work/idx",
        emb.filter(col("vec_id") < 5), k = 10, nProbes = 4)
    }),

    "sim_ivf_erase" -> ((s, dir) => {
      // RIGHT-TO-BE-FORGOTTEN through the ANN index (round-11): build
      // on the evens, ledger-append the odds, then ERASE every
      // vec_id % 7 == 3 — reader-atomic manifest folds of exactly the
      // touched list files, unconditional history vacuum — and probe
      // at full probes. Full probe ≡ brute force over the SURVIVING
      // corpus, so the oracle pins that the erase removed exactly the
      // requested vectors (from both the built and the appended halves)
      // and nothing else
      val work = graft.Fixtures.newDir("graft_ivfe")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings")
      graft.functions.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
        nLists = 8, trainIters = 1)
      graft.functions.Similarity.appendIvfBatch(
        emb.filter(col("vec_id") % 2 === 1), s"$work/idx", 0L): Unit
      val ids = emb.filter(col("vec_id") % 7 === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      graft.functions.Similarity.eraseFromIvfIndex(s, s"$work/idx", ids): Unit
      graft.functions.Similarity.queryIvfIndex(s, s"$work/idx",
        emb.filter(col("vec_id") < 6 && col("vec_id") % 7 =!= 3),
        k = 10, nProbes = 8)
    }),

    "sim_ivf_drift" -> ((s, dir) => {
      // INDEX DRIFT STATS (the "when to rebuild" signal): build a
      // PORTABLE index on the evens (md5 seed order, 6-dp assignment —
      // every step replicable in SQL, the sim_kmeans_train contract
      // extended to the stored assignment), ledger-append the odds
      // onto the frozen centroids, then read per-list health: row
      // count, micro-unit cosine sum, and worst-member cosine per
      // centroid. The oracle recomputes train → assign → aggregate
      // bit-for-bit, so the stats are pinned exact — including that
      // the appended half's drift shows up in the same lists the
      // engine assigned them to
      val work = graft.Fixtures.newDir("graft_ivfd")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings")
      graft.functions.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
        nLists = 4, trainIters = 1, portable = true)
      graft.functions.Similarity.appendIvfBatch(
        emb.filter(col("vec_id") % 2 === 1), s"$work/idx", 0L,
        portable = true): Unit
      graft.functions.Similarity.ivfListStats(s, s"$work/idx")
    }),

    "dedup_index_rebuild" -> ((s, dir) => {
      // ATOMIC BANDING MIGRATION e2e (round-11): index with (k=64,
      // bands=16), ledger-append a second batch, then REBUILD to
      // (k=32, bands=16) from the stored shingle sets alone — and
      // query under the NEW parameters. r drops 4 → 2, so banding
      // recall at the 0.8 threshold can only widen the candidate set;
      // every candidate is exact-verified, so the result still equals
      // the exact cross-set Jaccard oracle — proving the migration
      // re-bucketed the ENTIRE corpus (both the built and the
      // ledger-appended halves) losslessly
      val docs = table(s, dir, "documents")
      val root = graft.Fixtures.newDir("graft_mhrb")
        .toFile.getAbsolutePath
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 10 >= 1 &&
        col("doc_id") % 10 <= 4), root)
      Dedup.appendShingledToIndexBatch(
        graft.functions.Dedup.shingledDocs(
          docs.filter(col("doc_id") % 10 >= 5), 3, 64, "doc_id", "text"),
        root, 3, 64, 16, 0L): Unit
      Dedup.rebuildMinhashIndex(s, root, n = 3, k = 32, bands = 16)
      Dedup.queryMinhashIndex(s, docs.filter(col("doc_id") % 10 === 0),
        root, n = 3, k = 32, bands = 16)
    }),

    "dedup_index_asof" -> ((s, dir) => {
      // AS-OF PINNED DEDUP (round-11 ask #2): index phase A (doc_id
      // % 10 in 1..4), pin, ledger-append phase B (% 10 in 5..9),
      // history-retaining fold — then dedup the % 10 == 0 batch AGAINST
      // THE PIN. Oracle = exact cross-set Jaccard against phase A only:
      // a hash match proves the pinned query sees none of phase B and
      // all of phase A through the fold
      val docs = table(s, dir, "documents")
      val root = graft.Fixtures.newDir("graft_mhp")
        .toFile.getAbsolutePath
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 10 >= 1 &&
        col("doc_id") % 10 <= 4), root)
      val pin = Dedup.pinMinhashIndex(s, root)
      Dedup.appendShingledToIndexBatch(
        graft.functions.Dedup.shingledDocs(
          docs.filter(col("doc_id") % 10 >= 5), 3, 64, "doc_id", "text"),
        root, 3, 64, 16, 0L): Unit
      Dedup.compactMinhashIndex(s, root, minFiles = 2,
        retainHistory = true): Unit
      Dedup.queryMinhashIndex(s, docs.filter(col("doc_id") % 10 === 0),
        root, asOf = Some(pin))
    }),

    "dedup_index_erase" -> ((s, dir) => {
      // RIGHT-TO-BE-FORGOTTEN through the dedup index (round-11): the
      // shingles table stores each document's n-gram SETS — essentially
      // the text in shuffled form — so corpus erasure without index
      // erasure leaves content recoverable. Index doc_id % 10 in 1..4
      // (build) and % 10 >= 5 (ledger append), ERASE % 10 in {2, 7}
      // (one slice from each half), then dedup-query the % 10 == 0
      // batch. Oracle = exact cross-set Jaccard against the surviving
      // index members only: a hash match proves the erased docs are
      // gone from BOTH tables and every survivor still answers
      val docs = table(s, dir, "documents")
      val root = graft.Fixtures.newDir("graft_mhe")
        .toFile.getAbsolutePath
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 10 >= 1 &&
        col("doc_id") % 10 <= 4), root)
      Dedup.appendShingledToIndexBatch(
        graft.functions.Dedup.shingledDocs(
          docs.filter(col("doc_id") % 10 >= 5), 3, 64, "doc_id", "text"),
        root, 3, 64, 16, 0L): Unit
      val ids = docs.filter(col("doc_id") % 10 === 2 || col("doc_id") % 10 === 7)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      Dedup.eraseFromMinhashIndex(s, root, ids): Unit
      Dedup.queryMinhashIndex(s, docs.filter(col("doc_id") % 10 === 0), root)
    }),

    "s11_tier_erase_audit" -> ((s, dir) => {
      // CORPUS-store erasure audit e2e: write sensor_click into
      // gen_raw, erase one device through cmd.tsdb.delete_data_points
      // (which vacuums), then cmd.tsdb.verify_tier_erasure — the raw
      // physical walk over EVERY tier. The oracle recomputes the
      // surviving row count independently, so rows_scanned pins that
      // the walk read the whole tier and rows_found == 0 pins that no
      // file on disk still carries the erased device
      val root = graft.Fixtures.newDir("graft_tieraud")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.write(graft.model.Tier.GenRaw, points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click"))
      val ctx = graft.api.Api.Context(s, store, now = () => Now)
      graft.api.Api.dispatch(ctx, "cmd.tsdb.delete_data_points",
        graft.api.Api.GetDataPointsRequest(filters =
          graft.model.DataPointsFilter(devices = Seq("3")))): Unit
      val audit = graft.api.CommandCodec.decode(
        """{"type":"cmd.tsdb.verify_tier_erasure","serv":"ecollector",
          |"uid":"ta-1","val_t":"object","val":{
          |"filters":{"devices":["3"]}}}""".stripMargin)
      graft.api.Api.dispatch(ctx, audit.msgType, audit.payload)
        .select(col("tier"), col("rows_scanned"), col("rows_found"))
    }),

    "s11_erase_audit" -> ((s, dir) => {
      // AUDIT-GRADE erasure verification e2e: build all THREE derived
      // indexes (on the even halves — composite-fixture cost control),
      // erase the % 10 == 6 slice from each through the wire
      // command, then run cmd.tsdb.verify_erasure — a resolver-
      // BYPASSING raw scan of every parquet file left on disk. The
      // oracle recomputes what each index must physically hold for
      // the survivors (IVF: one row per surviving vector; MinHash:
      // bands + 1 rows per surviving shingle-able doc; BM25: one
      // posting per surviving (doc, query-relevant term... all terms)
      // pair), so rows_scanned pins that the walk read EVERYTHING and
      // rows_found == 0 pins that nothing erased remains — the
      // compliance proof as a query
      val work = graft.Fixtures.newDir("graft_audit")
        .toFile.getAbsolutePath
      val emb = table(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)
      val docs = table(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      // the three index builds land in disjoint roots — overlap them
      // (guide §2.6: each build alone underfills the executor pool; the
      // serial order paid the sum of three short job chains)
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => graft.functions.Similarity.buildIvfIndex(emb, s"$work/idx",
          nLists = 8, trainIters = 1),
        () => Dedup.buildMinhashIndex(docs, s"$work/mh"),
        () => graft.functions.Retrieval.buildBm25Index(docs, s"$work/bm"))): Unit
      val store = new graft.store.TierStore(s, s"$work/store")
      val ctx = graft.api.Api.Context(s, store)
      val vecIds = emb.filter(col("vec_id") % 10 === 6)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val docIds = docs.filter(col("doc_id") % 10 === 6)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      // two erase passes over DISJOINT index sets — overlap them too
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => graft.api.Api.dispatch(ctx, "cmd.tsdb.erase_index_ids",
          graft.api.Api.EraseIndexIdsRequest(ids = vecIds,
            ivf = Seq(s"$work/idx"))),
        () => graft.api.Api.dispatch(ctx, "cmd.tsdb.erase_index_ids",
          graft.api.Api.EraseIndexIdsRequest(ids = docIds,
            minhash = Seq(s"$work/mh"), bm25 = Seq(s"$work/bm"))))): Unit
      val audit = graft.api.Api.dispatch(ctx, "cmd.tsdb.verify_erasure",
        graft.api.Api.EraseIndexIdsRequest(ids = (vecIds ++ docIds).distinct,
          ivf = Seq(s"$work/idx"), minhash = Seq(s"$work/mh"),
          bm25 = Seq(s"$work/bm")))
      audit.select(split(col("index"), ":").getItem(0).as("store"),
        col("rows_scanned"), col("rows_found"))
    }),

    "pipe_run_pin" -> ((s, dir) => {
      // CROSS-STORE RUN PIN (round-11): one manifest captures the
      // corpus tier store AND both streamed indexes (derived-first
      // capture order), persists atomically, and is LOADED back to
      // drive every as-of arm after phase-B writes and
      // history-retaining folds land everywhere. The result is the
      // three pinned reads united: an aggregate witness of the pinned
      // corpus (count + order-independent micro-unit value sum per
      // measurement), the pinned full-probe ANN top-k (≡ brute force
      // over the pinned embeddings), and the pinned dedup query
      // (≡ exact Jaccard against the pinned index members). A hash
      // match proves the persisted pin vector reproduces the exact
      // capture-time state of all three stores at once — the
      // "re-run last Tuesday's training job" contract
      val work = graft.Fixtures.newDir("graft_runpin")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, s"$work/store")
      val tier = graft.model.Tier.GenRaw
      val pts = points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click")
      val emb = table(s, dir, "embeddings")
      val docs = table(s, dir, "documents")
      // tier write + two index builds hit disjoint stores — overlap
      // them (guide §2.6); the pin capture below needs all three done
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => store.write(tier, pts.filter(col("dir") === "import")),
        () => graft.functions.Similarity.buildIvfIndex(
          emb.filter(col("vec_id") % 2 === 0), s"$work/idx",
          nLists = 8, trainIters = 1),
        () => Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 10 >= 1 &&
          col("doc_id") % 10 <= 4), s"$work/mh"))): Unit
      val pin = graft.run.RunPin.capture(s, Seq(
        "ann" -> graft.run.RunPin.Ivf(s"$work/idx"),
        "dedup" -> graft.run.RunPin.Minhash(s"$work/mh"),
        "corpus" -> graft.run.RunPin.Tier(store)))
      graft.run.RunPin.save(s, pin, s"$work/run.pin")
      // phase-B appends (disjoint stores) overlap; then the three
      // history-retaining folds (disjoint stores) overlap — same §2.6
      // rationale; order within each store is preserved by the phases
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => store.write(tier, pts.filter(col("dir") === "export")),
        () => graft.functions.Similarity.appendIvfBatch(
          emb.filter(col("vec_id") % 2 === 1), s"$work/idx", 0L): Unit,
        () => Dedup.appendShingledToIndexBatch(
          graft.functions.Dedup.shingledDocs(
            docs.filter(col("doc_id") % 10 >= 5), 3, 64, "doc_id", "text"),
          s"$work/mh", 3, 64, 16, 0L): Unit)): Unit
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => store.compact(tier, minFiles = 1, retainHistory = true): Unit,
        () => graft.functions.Similarity.compactIvfLists(s, s"$work/idx",
          minFiles = 2, retainHistory = true): Unit,
        () => Dedup.compactMinhashIndex(s, s"$work/mh", minFiles = 2,
          retainHistory = true): Unit)): Unit
      val loaded = graft.run.RunPin.load(s, s"$work/run.pin")
      val tierArm = graft.run.RunPin.tierRead(loaded, "corpus", store, tier)
        .groupBy(col("measurement"))
        .agg(count(lit(1)).as("k1"),
          sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")).as("k2"))
        .select(concat(lit("tier:"), col("measurement")).as("part"),
          col("k1"), col("k2"), lit(0.0).as("v"))
      val ivfArm = graft.functions.Similarity.queryIvfIndex(s, s"$work/idx",
          emb.filter(col("vec_id") < 5), k = 10, nProbes = 8,
          asOf = Some(graft.run.RunPin.ivfPin(loaded, "ann", s"$work/idx")))
        .select(lit("ivf").as("part"), col("query_id").as("k1"),
          col("vec_id").as("k2"), col("score").as("v"))
      val mhArm = Dedup.queryMinhashIndex(s,
          docs.filter(col("doc_id") % 10 === 0), s"$work/mh",
          asOf = Some(graft.run.RunPin.minhashPin(loaded, "dedup", s"$work/mh")))
        .select(lit("mh").as("part"), col("id_new").as("k1"),
          col("id_idx").as("k2"), col("jaccard").as("v"))
      tierArm.unionAll(ivfArm).unionAll(mhArm)
    }),

    "sim_semantic_dedup" -> ((s, dir) =>
      // SemDeDup: connected components over the LSH-blocked cosine pairs,
      // min-id representative kept per component; every row tagged
      // (cluster, kept). Portable plane generator → the oracle replicates
      // blocking, closure, and representative choice exactly. The cap is
      // pinned UNCAPPED here because the oracle replicates the exact
      // all-pairs-per-bucket algebra; the chain default is the finite
      // Dedup.DefaultChainMaxBucket.
      Similarity.semanticDedup(table(s, dir, "embeddings"),
        threshold = 0.4, nPlanes = 6, maxBucketSize = Int.MaxValue)
        .select(col("vec_id"), col("cluster"), col("kept"))),

    "export_jsonl" -> ((s, dir) => {
      // sharded-JSONL round trip: write 8 deterministic md5 shards, read
      // them back through the partition-pruned text reader — the oracle
      // sees the original table plus the portable shard assignment, so a
      // hash match proves the encode→shard→decode loop is lossless
      val docs = table(s, dir, "documents")
      val root = graft.Fixtures.newDir("graft_jsonl")
        .toFile.getAbsolutePath
      graft.functions.Export.writeJsonlShards(docs, root, "doc_id", 8)
      graft.functions.Export.readJsonlShards(s, root, docs.schema)
    }),

    "text_bm25" -> ((s, dir) =>
      // BM25 top-20 for a 4-term query; per-term contributions quantized
      // to integer micro-points before the per-doc sum (order-independent
      // long addition), ties at the cut broken by doc_id
      graft.functions.Retrieval.bm25TopK(table(s, dir, "documents"),
        Seq("table", "hash", "merge", "scan"), k = 20)),

    "text_rrf_hybrid" -> ((s, dir) =>
      // hybrid first-stage retrieval: BM25 top-30 fused with cosine
      // top-30 (query = vec 0's embedding) via Reciprocal Rank Fusion;
      // contributions are floor(1e6/(60+rank)) — pure integer
      // arithmetic, so the fused ranking is bit-portable
      graft.functions.Retrieval.hybridTopK(
        table(s, dir, "documents"), table(s, dir, "embeddings"),
        Seq("table", "hash", "merge", "scan"),
        table(s, dir, "embeddings").filter(col("vec_id") === 0),
        k = 20, poolK = 30)),

    "decon_bloom" -> ((s, dir) => {
      // bloom-prefiltered decontamination: same benchmark split as
      // decon_overlap but 3-grams; the bloom stage only prunes what
      // reaches the exact confirm join, so the oracle is the plain
      // n-gram overlap — a hash match proves the bloom path loses nothing
      val docs = table(s, dir, "documents")
      graft.functions.Decontaminate.flagContaminatedBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 3,
        expectedItems = 100000L)
    }),

    "samp_shuffle" -> ((s, dir) =>
      // seeded epoch-order permutation with explicit position, assigned
      // via bucketed rank composition (no global window); the oracle's
      // single ORDER BY row_number must agree exactly
      graft.functions.Sampling.deterministicShuffle(
          table(s, dir, "documents"), "doc_id", seed = "epoch1")
        .select(col("position"), col("doc_id"), col("source"))),

    "prof_columns" -> ((s, dir) =>
      // one-pass column profile of events: counts/nulls/exact distinct +
      // min/max (numerics as integer micro-units, strings raw)
      graft.functions.Profile.columns(events(s, dir),
        Seq("event_id", "user_id", "event_type", "value", "props"))),

    "text_bpe_apply" -> ((s, dir) => {
      // BPE merge application with a fixed 8-merge table (the learned
      // path is trainBpe → applyMerges; a fixed table keeps the oracle
      // static): piece count + md5 over SOH-joined pieces pins every
      // merge decision cross-engine
      // The oracle's GROUP BY over unnested words omits token-free docs.
      // Matching that with a post-hoc filter on size(applyMerges(..))
      // re-evaluated the whole merge chain inside the pushed-down filter
      // (the tracked r5/r6 2x regression), however the projection was
      // staged. Instead pre-filter with the CHEAP equivalent predicate —
      // merges never produce empty pieces, so a doc is piece-free iff
      // lower(text) has no [a-z0-9] character — and let the single
      // projection's subexpression elimination evaluate the chain once
      // per surviving row.
      val pieces = graft.functions.Vocab.applyMerges(col("text"), BpeDemoMerges)
      table(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          size(pieces).cast("long").as("n_pieces"),
          md5(concat_ws("\u0001", pieces)).as("piece_md5"))
    }),

    "text_vocab_coverage" -> ((s, dir) =>
      // coverage curve at candidate vocab sizes — covered token mass
      // over total, micro-unit quantized
      graft.functions.Vocab.coverage(table(s, dir, "documents"),
        Seq(10, 50, 100, 500))),

    "pipe_quality_lr" -> ((s, dir) => {
      // deterministic logistic-regression quality classifier: portable
      // hashed features, 2 full-batch GD steps with quantized gradients
      // (order-independent long sums); label = lang=='en'; the oracle
      // unrolls both iterations as chained CTEs
      val (scores, _) = graft.functions.Classifier.trainQualityLR(
        table(s, dir, "documents"), col("lang") === "en", dims = 64, iters = 2)
      scores
    }),

    "text_bm25_indexed" -> ((s, dir) => {
      // persisted-index BM25: build postings sharded by term hash, query
      // through the partition-pruned read path — must hash-match the
      // direct bm25TopK oracle exactly
      val root = graft.Fixtures.newDir("graft_bm25")
        .toFile.getAbsolutePath
      graft.functions.Retrieval.buildBm25Index(table(s, dir, "documents"), root)
      graft.functions.Retrieval.queryBm25Index(s, root,
        Seq("table", "hash", "merge", "scan"), k = 20)
    }),

    "text_bm25_erased" -> ((s, dir) => {
      // RIGHT-TO-BE-FORGOTTEN through the BM25 index (round-11): the
      // postings table stores each document's full term-frequency bag,
      // the most reconstructable derived content of the three indexes.
      // Build, ERASE every doc_id % 9 == 4 (reader-atomic manifest
      // folds of exactly the posting files carrying them + the
      // corrected stats row), query — must hash-match the oracle's
      // fresh BM25 over the SURVIVING documents only, proving both the
      // postings purge and the stats correction are exact
      val root = graft.Fixtures.newDir("graft_bm25e")
        .toFile.getAbsolutePath
      val docs = table(s, dir, "documents")
      graft.functions.Retrieval.buildBm25Index(docs, root)
      val ids = docs.filter(col("doc_id") % 9 === 4)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      graft.functions.Retrieval.eraseFromBm25Index(s, root, ids): Unit
      graft.functions.Retrieval.queryBm25Index(s, root,
        Seq("table", "hash", "merge", "scan"), k = 20)
    }),

    "text_bm25_streamed" -> ((s, dir) => {
      // STREAMING BM25 index maintenance e2e (round-12 ask #2): build
      // on the even half, stream the odd half in micro-batches — each
      // batch's postings, stats delta, and zero-doc ids commit under
      // ONE exactly-once ledger marker — run the selective shard/stats
      // folds, then query. Must hash-match the direct-BM25 oracle over
      // the WHOLE corpus, proving the streamed index holds exactly
      // every document (none lost, none double-counted in either the
      // postings or the corpus stats); the lexical counterpart of
      // sim_ivf_stream. Batch count is PINNED (4 input files, 2 per
      // trigger = 2 batches) so the bench entry measures the plan.
      val work = graft.Fixtures.newDir("graft_bm25s")
        .toFile.getAbsolutePath
      val docs = table(s, dir, "documents")
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      // stream input is immutable and whole-in — written once per JVM
      // (cachedInput, the monitor idiom); checkpoint stays per-run
      val in = cachedInput(s"bm25s:$dir")(p =>
        incoming.repartition(4).write.parquet(p))
      graft.functions.Retrieval.buildBm25Index(
        docs.filter(col("doc_id") % 2 === 0), s"$work/idx")
      val q = graft.functions.Retrieval.streamingBm25Append(
        s.readStream.schema(incoming.schema)
          .option("maxFilesPerTrigger", "2").parquet(in),
        s"$work/idx", s"$work/ckpt")
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      graft.functions.Retrieval.compactBm25Index(s, s"$work/idx", minFiles = 2)
      graft.functions.Retrieval.queryBm25Index(s, s"$work/idx",
        Seq("table", "hash", "merge", "scan"), k = 20)
    }),

    "text_bm25_asof" -> ((s, dir) => {
      // AS-OF PINNED lexical retrieval (round-12): build on the evens,
      // stream phase A (doc_id % 4 == 1), PIN the index from its own
      // storage records (pinBm25Index), stream phase B (doc_id % 4 ==
      // 3), run a HISTORY-RETAINING fold — and query the pin. Must
      // hash-match a fresh BM25 over evens + phase A only: phase B's
      // ledgered appends (postings AND stats deltas) and the fold's
      // rewrite are both invisible to the pin — the training-run
      // reproducibility contract, extended to the lexical index.
      val work = graft.Fixtures.newDir("graft_bm25p")
        .toFile.getAbsolutePath
      val docs = table(s, dir, "documents")
      val phaseA = docs.filter(col("doc_id") % 4 === 1)
        .select("doc_id", "text")
      // index build and phase-A landing are independent — overlap
      graft.store.Concurrent.eval(s.sparkContext, Seq(
        () => graft.functions.Retrieval.buildBm25Index(
          docs.filter(col("doc_id") % 2 === 0), s"$work/idx"),
        () => phaseA.repartition(2).write.parquet(s"$work/in"))): Unit
      val q = graft.functions.Retrieval.streamingBm25Append(
        s.readStream.schema(phaseA.schema)
          .option("maxFilesPerTrigger", "2").parquet(s"$work/in"),
        s"$work/idx", s"$work/ckpt")
      q.processAllAvailable()
      val pin = graft.functions.Retrieval.pinBm25Index(s, s"$work/idx")
      docs.filter(col("doc_id") % 4 === 3).select("doc_id", "text")
        .repartition(2).write.mode("append").parquet(s"$work/in")
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      graft.functions.Retrieval.compactBm25Index(s, s"$work/idx",
        minFiles = 2, retainHistory = true)
      graft.functions.Retrieval.queryBm25Index(s, s"$work/idx",
        Seq("table", "hash", "merge", "scan"), k = 20, asOf = Some(pin))
    }),

    "pipe_blocklist" -> ((s, dir) =>
      // token blocklist: survivors contain none of the listed tokens
      // (predicate form; the broadcast semi-join twin is spec-asserted
      // equal for large lists)
      graft.functions.RuleFilters.blocklistFilter(
          table(s, dir, "documents"), Seq("merge", "spill"))
        .select(col("doc_id"), col("source"), col("n_chars"))),

    "text_nfc" -> ((s, dir) =>
      // Unicode NFC canonicalization on doctored rows (combining acute /
      // tilde sequences planted per doc): both the JVM and DuckDB
      // implement the same Unicode composition, so the md5 of the
      // normalized text pins every code point
      table(s, dir, "documents").select(col("doc_id"),
        md5(graft.functions.expressions.VectorExpressions.nfcNormalize(
          concat(col("text"), lit(" cafe\u0301 ma\u00f1ana na\u0303ive"))))
          .as("nfc_md5"),
        length(graft.functions.expressions.VectorExpressions.nfcNormalize(
          concat(col("text"), lit(" cafe\u0301 ma\u00f1ana na\u0303ive"))))
          .cast("long").as("len_nfc"))),

    "prof_histogram" -> ((s, dir) =>
      // 10-bucket histogram of the quality score over [0, 1): exact
      // integer micro-unit bucket edges, one hash-aggregate
      graft.functions.Profile.histogram(table(s, dir, "documents"),
        TextFunctions.qualityScore(col("text")), lo = 0.0, hi = 1.0,
        nBuckets = 10)),

    "dedup_corpus_diff" -> ((s, dir) => {
      // recrawl diff on doctored snapshots: prev drops ids ≡0 (mod 7)
      // (→ added in next), next drops ids ≡1 (→ removed), ids ≡2 get
      // edited text (→ changed), everything else unchanged
      val docs = table(s, dir, "documents")
      val prev = docs.filter(col("doc_id") % 7 =!= 0)
      val next = docs.filter(col("doc_id") % 7 =!= 1)
        .withColumn("text", when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
      Dedup.corpusDiff(prev, next)
    }),

    "samp_token_budget" -> ((s, dir) =>
      // token-budget data recipe: keep rates derived from per-source
      // token totals, then the deterministic hash gate; rate = exact
      // IEEE long/long division, identical cross-engine
      graft.functions.Sampling.mixtureToTokenBudget(
          table(s, dir, "documents"), "source", "doc_id",
          TextFunctions.tokenCount(col("text")),
          Map("src0" -> 2000L, "src1" -> 5000L, "src2" -> 100L))
        .select(col("doc_id"), col("source"), round(col("keep_rate"), 6).as("keep_rate"))),

    "samp_exact_k" -> ((s, dir) =>
      // exactly-k deterministic subsample (TakeOrderedAndProject — no
      // global sort); same rows every run/layout, ties by doc_id
      graft.functions.Sampling.exactK(table(s, dir, "documents"), "doc_id",
          k = 150, seed = "eval1")
        .select(col("doc_id"), col("source"), col("n_chars"))),

    "sim_assign" -> ((s, dir) => {
      // nearest-centroid classification against the label prototypes:
      // centroids from the exact micro-unit sums, cosine rounded to 6 dp
      // before the argmax, ties by label — deterministic cross-engine
      val emb = table(s, dir, "embeddings")
      val cents = graft.functions.Similarity.labelCentroids(emb)
        .select(col("group"),
          transform(col("sum_q6"), x =>
            x.cast("double") / lit(1e6) / col("n")).as("centroid"))
      graft.functions.Similarity.assignToCentroids(emb, cents)
    }),

    "sim_project" -> ((s, dir) =>
      // JL random projection to 8 dims in integer micro-units (native
      // one-pass expression; the LSH signature is this projection's sign
      // bit) — exploded to (vec_id, p, y_q6) rows for the exact compare
      graft.functions.Similarity.projectVectors(table(s, dir, "embeddings"), k = 8)
        .select(col("vec_id"), posexplode(col("proj_q6")))
        .select(col("vec_id"), col("pos").cast("long").as("p"),
          col("col").as("y_q6"))),

    "sim_centroids" -> ((s, dir) =>
      // per-label mean embedding via the native VectorSumQ6 partial
      // aggregate (groups × dims longs through the shuffle); exploded to
      // (label, n, dim, qsum) rows — integer micro-unit sums are
      // order-independent, so any engine reproduces them exactly
      graft.functions.Similarity.labelCentroids(table(s, dir, "embeddings"))
        .select(col("group"), col("n"), posexplode(col("sum_q6")))
        .select(col("group").as("label"), col("n"),
          (col("pos") + 1).cast("long").as("dim"), col("col").as("qsum"))),

    "sim_kmeans_train" -> ((s, dir) =>
      // the Lloyd trainer behind every IVF index, in portable mode (md5
      // seed order, 6-dp-rounded assignment cosine, micro-unit mean
      // recompute) — the oracle replays seed → assign → recompute →
      // assign → recompute bit-for-bit; centroids exploded to
      // (list_id, dim, c_q9) nano-unit rows for the exact compare
      graft.functions.Similarity.trainCentroids(table(s, dir, "embeddings"),
        k = 4, iters = 2, portable = true)
        .select(col("list_id"), posexplode(col("centroid")))
        .select(col("list_id"), (col("pos") + 1).cast("long").as("dim"),
          floor(col("col") * lit(1e9) + lit(0.5)).cast("long").as("c_q9"))),

    "sim_hard_negatives" -> ((s, dir) => {
      // contrastive-training negative mining: for each anchor, the 10
      // most-similar vectors with a DIFFERENT label (the negatives that
      // actually move the loss); exact broadcast form = the recall
      // oracle for the LSH-bucketed scale path
      val emb = table(s, dir, "embeddings")
      graft.functions.Similarity.hardNegatives(emb,
        emb.filter(col("vec_id") < 5), k = 10)
    }),

    "prof_psi_drift" -> ((s, dir) => {
      // Population Stability Index between two corpus snapshots (even /
      // odd doc_id halves) over the n_chars distribution — per-bucket
      // contributions in integer 1e-4 nats, quantized before any sum
      val docs = table(s, dir, "documents")
      graft.functions.Profile.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        col("n_chars"), lo = 0.0, hi = 2000.0, nBuckets = 20)
    }),

    "prof_heavy_hitters" -> ((s, dir) => {
      // exact frequent items above 5000 ppm support via per-partition
      // Misra-Gries candidate pruning + broadcast semi-join recount
      // (capacity 200 < the composite key's ~217 distinct values, so
      // the sketch's decrement path runs INSIDE the oracled plan); the
      // published counts are exact, bit-identical to the naive
      // GROUP BY/HAVING the oracle runs
      val toks = table(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("tok"), (col("doc_id") % 7).cast("string").as("b"))
        .select(concat(col("tok"), lit("_"), col("b")).as("key"))
      graft.functions.Profile.frequentItems(toks, col("key"), 5000L)
    }),

    "prof_top_devices" -> ((s, dir) =>
      // exact top-10 hottest devices by event count — distributed
      // TakeOrdered with a deterministic (n desc, key asc) tie-break,
      // no global sort; the hot-key report that decides where the
      // salted-aggregation path (functions.Salting) is worth applying
      graft.functions.Profile.topKeys(
        events(s, dir), col("user_id"), k = 10)),

    "prof_streaming_psi" -> ((s, dir) => {
      // the streaming drift monitor end-to-end (VERDICT r8 ask #2):
      // a REAL file-source micro-batch run of Profile.streamingHistogram
      // (watermark-bounded per-window bucket counts, append mode — a
      // window's counts emit exactly once when the final watermark
      // [max event time − 2 h] seals it), then finalizePsi folds the
      // sealed windows against the batch reference histogram of the
      // full corpus. The oracle recomputes the sealed 6 h windows, the
      // integer-edge buckets and the quantized-before-sum PSI terms
      // with the same cutoff — pinning watermark sealing, bucket rule
      // and term arithmetic in one hash
      val work = graft.Fixtures.newDir("graft_psis")
        .toFile.getAbsolutePath
      val pts = events(s, dir).select(col("ts").as("time"),
        round(col("value") * 100).cast("long").cast("double").as("cents"))
      // batch-DETERMINISTIC (r11 ask #3): every input file in ONE data
      // batch (+ the final watermark-advance batch) on every run — a
      // 2-per-trigger split left the empty-batch count hostage to the
      // file order's effect on watermark progression; the input parquet
      // is written ONCE per JVM (cachedInput — r13 ask #4)
      val in = cachedInput(s"psi:$dir")(p => pts.repartition(4).write.parquet(p))
      val sealedQ = graft.functions.Profile.streamingHistogram(
        s.readStream.schema(pts.schema)
          .option("maxFilesPerTrigger", "100000").parquet(in),
        "time", col("cents"), lo = 0.0, hi = 50000.0, nBuckets = 20,
        windowDur = "6 hours", watermarkDelay = "2 hours")
      val q = sealedQ.writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .format("parquet").option("path", s"$work/out").start()
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      val ref = graft.functions.Profile.histogram(
        pts, col("cents"), lo = 0.0, hi = 50000.0, nBuckets = 20)
      graft.functions.Profile.finalizePsi(s.read.parquet(s"$work/out"), ref)
        .select(unix_timestamp(col("window_start")).as("window_start"),
          col("psi_q4"))
    }),

    "prof_streaming_topk" -> ((s, dir) => {
      // the streaming hot-key monitor end-to-end (VERDICT r8 ask #2):
      // Profile.streamingKeyCounts through a real file-source run (one
      // watermark-bounded aggregation; sealed 6 h windows emit once),
      // then finalizeTopKeys ranks each sealed window's keys with the
      // deterministic (n desc, key asc) tie-break. The oracle
      // recomputes windows, counts and row_number ranks from the raw
      // events under the same watermark cutoff
      val work = graft.Fixtures.newDir("graft_topks")
        .toFile.getAbsolutePath
      val pts = events(s, dir).select(col("ts").as("time"), col("user_id"))
      // batch-DETERMINISTIC (r11 ask #3): one data batch + the final
      // watermark-advance batch (see prof_streaming_psi); input written
      // once per JVM (cachedInput — r13 ask #4)
      val in = cachedInput(s"topk:$dir")(p => pts.repartition(4).write.parquet(p))
      val sealedQ = graft.functions.Profile.streamingKeyCounts(
        s.readStream.schema(pts.schema)
          .option("maxFilesPerTrigger", "100000").parquet(in),
        "time", col("user_id"), windowDur = "6 hours",
        watermarkDelay = "2 hours")
      val q = sealedQ.writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .format("parquet").option("path", s"$work/out").start()
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      graft.functions.Profile.finalizeTopKeys(
          s.read.parquet(s"$work/out"), k = 5)
        .select(unix_timestamp(col("window_start")).as("window_start"),
          col("rank").cast("long").as("rank"), col("key"), col("n"))
    }),

    "s9_backfill" -> ((s, dir) => {
      // historical rollup repair (Downsampler.backfill): route the raw
      // stream in, POISON the (empty) gen_day tier with garbage rows,
      // then backfill the whole window from gen_raw — the explicit-
      // window counterpart of maintain's recent-days increment. The
      // read-back hash-equals the oracle's clean 1-min recompute from
      // the original events, which proves the backfill both rebuilt
      // every window date and replaced the poison (a survivor would
      // break the hash)
      val root = graft.Fixtures.newDir("graft_s9b")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val raw = points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click")
      store.writeRouted(raw)
      store.write(graft.model.Tier.GenDay, raw
        .filter(to_date(col("time")) === "2024-01-10")
        .select(col("measurement"), col("time"), lit(999.0).as("value"),
          col("dev_id"), col("location_id"), col("dev_type"), col("dir")))
      // one week exercises the whole path (window recompute, poison
      // replacement, per-date publish × 4 hops) at 1/4 the per-partition
      // filesystem ceremony of a full month — the bench measures the
      // path, not 31 copies of it (the s9_rollup_maintain principle)
      Downsampler.backfill(store, "2024-01-08", "2024-01-14")
      store.read(graft.model.Tier.GenDay).select(
        col("measurement"), col("dev_id"), col("dev_type"), col("dir"),
        col("location_id"), unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "s9_rollup_verify" -> ((s, dir) => {
      // the rollup consistency audit (Downsampler.verifyRollups): build
      // a CORRECT gen_day via backfill, then plant both defect shapes —
      // 10 extra never-downsampled keys on one date, a +1.0 value shift
      // across another date's whole partition — and audit a 3-date
      // window. The report must count exactly the planted defects and
      // certify the clean date with all-zero mismatch columns; the
      // oracle recomputes expected row counts per date from the events
      val root = graft.Fixtures.newDir("graft_s9v")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val raw = points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click")
      store.writeRouted(raw)
      // the audit reads only its [10th, 12th] window — building gen_day
      // for exactly that window keeps the fixture cost proportional to
      // what the audit exercises
      Downsampler.backfill(store, "2024-01-10", "2024-01-12")
      // defect 1: extra keys on 2024-01-10 (devices that never existed)
      store.write(graft.model.Tier.GenDay,
        s.range(10).select(lit("sensor_click").as("measurement"),
          // 1704844800 = 2024-01-10T00:00:00Z; one ghost key per minute
          timestamp_seconds(lit(1704844800L) + col("id") * 60).as("time"),
          lit(999.0).as("value"),
          concat(lit("ghost_"), col("id")).as("dev_id"),
          lit("0").as("location_id"), lit("sensor").as("dev_type"),
          lit("import").as("dir")))
      // defect 2: shift every value of 2024-01-11's partition by +1
      val d2 = store.read(graft.model.Tier.GenRaw)
        .filter(col("date") === "2024-01-11").drop("date")
      store.replaceDatePartitions(graft.model.Tier.GenDay,
        Downsampler.downsample(d2, 1)
          .withColumn("value", col("value") + lit(1.0)),
        Seq("2024-01-11"))
      Downsampler.verifyRollups(store, "2024-01-10", "2024-01-12",
        hops = Seq(graft.model.Tier.cascade.head))
    }),

    "s9_custom_cq" -> ((s, dir) => {
      // user-registered continuous query (the reference's AddCQ surface,
      // ds.go:23 / influxdb_v1.go:333-354): a custom 5-minute retention
      // policy beside the fixed gen_* hierarchy, fed from gen_raw by a
      // registered CQ that the SAME maintenance pass executes after the
      // built-in cascade. The read-back hash-equals the oracle's 5-min
      // recompute — pinning that registration, routing, resolution
      // parsing and the maintenance hop all compose
      val root = graft.Fixtures.newDir("graft_s9cq")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.addRetentionPolicy(graft.model.Tier("gen_fast", "12 weeks", "5 minutes"))
      store.addCq("raw_to_fast", "gen_raw", "gen_fast", "5m")
      store.writeRouted(points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click" &&
          to_date(col("time")).between("2024-01-08", "2024-01-14")))
      Downsampler.maintain(store, Now, sinceDays = 60)
      store.read(store.tierByName("gen_fast").get).select(
        col("measurement"), col("dev_id"), col("dev_type"), col("dir"),
        col("location_id"), unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "s9_asof_diff" -> ((s, dir) => {
      // corpus diff between two pins (TierStore.diffAsOf): batch A
      // (import-direction clicks) lands and is pinned; then a retained-
      // history maintenance rewrite REMOVES device 7 everywhere and
      // batch B (export-direction clicks) is appended; the diff between
      // the pins must be exactly {added: B, removed: A's device-7 rows}
      // — the audit a training run uses to answer "what changed since
      // my last corpus pin". Oracle recomputes both legs from events
      val root = graft.Fixtures.newDir("graft_s9d")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      // one week of clicks: the diff semantics are date-count-invariant
      // and the replace publish is per-partition — 7 dates measure the
      // path at 1/4 the filesystem ceremony of the full month
      val app = points(s, dir, "app_")
        .filter(col("measurement") === "app_click" &&
          to_date(col("time")).between("2024-01-08", "2024-01-14"))
      val batchA = app.filter(col("dir") === "import")
      store.writeRouted(batchA)
      val t1 = store.pinNow() // logical: no clock, no sleep
      val dates = batchA.select(to_date(col("time")).cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq
      store.replaceDatePartitions(graft.model.Tier.GenDefault,
        batchA.filter(col("dev_id") =!= "7"), dates, retainHistory = true)
      store.writeRouted(app.filter(col("dir") === "export"))
      val t2 = store.pinNow()
      store.diffAsOf(graft.model.Tier.GenDefault, t1, t2).select(
        col("change"), col("dev_id"), unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "s9_delete_where" -> ((s, dir) => {
      // erasure round trip: route the stream into the store, erase one
      // device everywhere (partition-scoped rewrite + snapshot publish),
      // read back — equality with the oracle's complement filter proves
      // the pass removed exactly the device's rows and nothing else
      val root = graft.Fixtures.newDir("graft_del")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val tier = store.tierByName("gen_default").get
      // only the measurement the oracle reads — the routing machinery
      // itself is covered by s3_roundtrip
      store.writeRouted(points(s, dir, "app_")
        .filter(col("measurement") === "app_click"))
      store.deleteWhere(tier, col("dev_id") === "7")
      store.read(tier)
        .filter(col("measurement") === "app_click")
        .select(unix_timestamp(col("time")).as("tsec"),
          round(col("value"), 6).as("value"), col("dev_id"))
    }),

    "s9_zorder_read" -> ((s, dir) => {
      // Z-order round trip: write → curve-ordered rewrite → device +
      // intra-day-window read. Equality with the oracle proves the
      // curve layout reorders but never loses/dups rows and both
      // predicate shapes still bind; the pruning wins are plan-metric
      // asserted in StorePublishSpec's zorder test.
      val root = graft.Fixtures.newDir("graft_zo")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val tier = store.tierByName("gen_default").get
      store.writeRouted(points(s, dir, "app_")
        .filter(col("measurement") === "app_click"))
      store.compact(tier, targetFileBytes = 64L * 1024, minFiles = 1,
        clusterBy = Seq("dev_id"), zorder = true)
      store.read(tier)
        .filter(col("measurement") === "app_click" &&
          hour(col("time")).between(9, 17))
        .select(unix_timestamp(col("time")).as("tsec"),
          round(col("value"), 6).as("value"), col("dev_id"))
    }),

    "s9_time_travel" -> ((s, dir) => {
      // reproducible-corpus read: write, pin a timestamp, compact with
      // retained history, append poison rows — the as-of read must
      // resolve the PINNED file set (original rows exactly; any poison
      // row or lost original breaks the hash against the oracle, which
      // only sees the original events)
      val root = graft.Fixtures.newDir("graft_tt")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val tier = store.tierByName("gen_default").get
      store.writeRouted(points(s, dir, "app_")
        .filter(col("measurement") === "app_click"))
      val pinned = store.pinNow() // logical: no clock, no sleep
      store.compact(tier, minFiles = 1, retainHistory = true)
      store.writeRouted(points(s, dir, "app_")
        .filter(col("measurement") === "app_click")
        .withColumn("value", col("value") + lit(1e6)))
      store.readAsOf(tier, pinned)
        .filter(col("measurement") === "app_click")
        .select(unix_timestamp(col("time")).as("tsec"),
          round(col("value"), 6).as("value"), col("dev_id"))
    }),

    "s10_pin_scramble" -> ((s, dir) => {
      // round-10 as-of hardening e2e: PLAIN batch writes ledger-commit
      // (writer "batch"), so a pin derived from the store's own records
      // (pinNow — no driver clock anywhere) survives arbitrary
      // data-file mtime scrambling. The pre-pin batch is re-dated far
      // FUTURE (what a rename-by-copy restage does) and the post-pin
      // batch far PAST (a back-dating attack) — mtime-based resolution
      // would get BOTH wrong; the ledger resolves the pin exactly,
      // hash-checked against the oracle's view of the first batch only
      val root = graft.Fixtures.newDir("graft_pinsc")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      val tier = graft.model.Tier.GenRaw
      val pts = points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click")
      store.write(tier, pts.filter(col("dir") === "import"))
      val pin = store.pinNow()
      store.write(tier, pts.filter(col("dir") === "export"))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def scramble(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { e =>
          val n = e.getPath.getName
          if (e.isDirectory && !n.startsWith("_")) scramble(e.getPath)
          else graft.store.TierLayout.batchIdOf(n).foreach { case (_, id) =>
            fs.setTimes(e.getPath,
              if (id == 0L) pin.millis + 3600000L else pin.millis - 3600000L, -1L)
          }
        }
      scramble(new org.apache.hadoop.fs.Path(store.tierPath(tier.name)))
      store.readAsOf(tier, pin)
        .select(unix_timestamp(col("time")).as("tsec"),
          round(col("value"), 6).as("value"), col("dev_id"))
    }),

    "s10_cmd_codec" -> ((s, dir) => {
      // the SERVICE wire path end-to-end (graft.Service's transport):
      // the exact FIMP command-envelope bytes a file-socket/broker
      // client sends, decoded by CommandCodec and dispatched — grammar
      // → DTO → planner with no shortcuts. The oracle recomputes the
      // hourly mean in DuckDB, so a decode defect anywhere in the
      // envelope (field names, defaults, filter nesting) breaks the hash
      val root = graft.Fixtures.newDir("graft_codec")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "app_"))
      val ctx = graft.api.Api.Context(s, store, now = () => Now)
      val cmd = graft.api.CommandCodec.decode(
        """{"type":"cmd.tsdb.get_data_points","serv":"ecollector",
          |"uid":"q-1","val_t":"object","val":{"measurementName":"app_click",
          |"dataFunction":"mean","groupByTime":"1h","relativeTime":"5w",
          |"fillType":"none"}}""".stripMargin)
      graft.api.Api.dispatch(ctx, cmd.msgType, cmd.payload)
        .select(col("time"), round(col("value"), 6).as("value"))
    }),

    "samp_cluster_split" -> ((s, dir) => {
      // leakage-safe train/val/test: plant exact-duplicate clones (every
      // 5th doc re-appears at a derived offset past max(doc_id) — a
      // constant offset collided with real ids on 10x-scaled fixtures
      // whose remapped ids exceed 1e6), connect each group with
      // min-id star pairs, cluster, and split by the CLUSTER hash — a
      // clone can never land on the other side of the train/eval
      // boundary from its original
      val base = table(s, dir, "documents").select("doc_id", "text")
      val off = base.agg(max(col("doc_id")).cast("long")).first.getLong(0) + 1L
      val planted = base.unionByName(base.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + lit(off)))
      val fp = planted.select(col("doc_id"), md5(col("text")).as("fp"))
      val rep = fp.groupBy("fp").agg(min("doc_id").as("rep"))
      val pairs = fp.join(rep, "fp").filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
      graft.functions.Sampling.clusterSafeSplit(
        planted, "doc_id", graft.functions.Dedup.clusters(pairs),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split")
    }),

    "samp_split_leakage" -> ((s, dir) => {
      // the audit the safe split must pass: per unordered split-pair
      // counts of near-dup pairs under a NAIVE doc-level hashSplit —
      // off-diagonal rows are train/eval contamination (the spec pins
      // that clusterSafeSplit drives them to zero)
      val base = table(s, dir, "documents").select("doc_id", "text")
      val off = base.agg(max(col("doc_id")).cast("long")).first.getLong(0) + 1L
      val planted = base.unionByName(base.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + lit(off)))
      val fp = planted.select(col("doc_id"), md5(col("text")).as("fp"))
      val rep = fp.groupBy("fp").agg(min("doc_id").as("rep"))
      val pairs = fp.join(rep, "fp").filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
      val naive = graft.functions.Sampling.hashSplit(planted, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      graft.functions.Sampling.splitLeakage(pairs, naive, "doc_id")
    }),

    "s9_clustered_read" -> ((s, dir) => {
      // device-clustered compaction round trip: routed write → compact
      // with clusterBy=dev_id (hash-bucketed files, (dev_id, time)-sorted
      // row groups, dev_id bloom filters) → planner point-device read.
      // Equality with the oracle's filter over the ORIGINAL events proves
      // the clustered rewrite loses/dups nothing; the layout win (row-
      // group skipping) is plan-asserted in StorePublishSpec.
      val root = graft.Fixtures.newDir("graft_clus")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "app_")
        .filter(col("measurement") === "app_click"))
      val tier = store.tierByName("gen_default").get
      store.compact(tier, targetFileBytes = 4L * 1024 * 1024,
        minFiles = 1, clusterBy = Seq("dev_id"))
      store.read(tier)
        .filter(col("measurement") === "app_click" && col("dev_id") === "7")
        .select(unix_timestamp(col("time")).as("tsec"),
          round(col("value"), 6).as("value"), col("dev_id"))
    }),

    "pipe_c4_rules" -> ((s, dir) => {
      // C4 rule filter on doctored rows: deterministic line structure
      // planted per doc (terminal-punct line, short line, conditionally
      // punctuated line, banned-content line for some ids), then the
      // line+doc rules; the oracle rebuilds the same lines in SQL
      val docs = table(s, dir, "documents").withColumn("text",
        concat_ws("\n",
          concat(substring(col("text"), 1, 80), lit(".")),
          lit("tiny line"),
          concat(substring(col("text"), 81, 80),
            when(col("doc_id") % 2 === 0, "!").otherwise("")),
          when(col("doc_id") % 7 === 0, "lorem ipsum boilerplate here.")
            .otherwise("a normal closing sentence appears here."),
          when(col("doc_id") % 11 === 0, "function() { return 1; }")
            .otherwise("the last line ends properly.")))
      graft.functions.RuleFilters.c4Filter(docs)
    }),

    // --- scale machinery, oracle-verified (previously spec-only) ---

    "q_salted_agg" -> ((s, dir) => {
      // two-phase skew-salted aggregation (Salting.saltedAgg): the hot
      // measurement key is spread over 8 deterministic sub-keys, partials
      // merged per real key. Integer cents make the two-phase sum
      // order-independent — the salted plan is hash-EXACT against
      // DuckDB's flat GROUP BY, not approximately equal
      val df = points(s, dir, "app_").select(col("measurement"),
        round(col("value") * 100).cast("long").as("total"),
        lit(1L).as("n"), col("dev_id"), col("time"))
      graft.functions.Salting.saltedAgg(df, Seq("measurement"), salt = 8,
        partials = Map(
          "total" -> (((c: Column) => sum(c), (c: Column) => sum(c))),
          "n" -> (((c: Column) => sum(c), (c: Column) => sum(c)))),
        saltSource = Seq("dev_id", "time"))
    }),

    "s7_sql_registry" -> ((s, dir) => {
      // the SQL function surface (functions.Registry): engine expressions
      // reached purely through spark.sql strings — the raw-SQL entry
      // point a BI tool uses. lsh_signature's plane generator and
      // nfc_normalize are both replicated bit-for-bit in the oracle
      graft.functions.Registry.registerAll(s)
      table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      table(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql("""SELECT e.vec_id, lsh_signature(e.embedding, 6) AS sig,
        md5(nfc_normalize(d.text)) AS nfc_md5
        FROM embeddings_v e JOIN documents_v d ON d.doc_id = e.vec_id""")
    }),

    "s9_rollup_maintain" -> ((s, dir) => {
      // the FULL maintenance path, round-tripped: routed write → incre-
      // mental cascade rebuild via replaceDatePartitions (manifest-gated
      // snapshot publish) → per-tier retention expiry (gen_day keeps 2
      // weeks before Now = dates >= 2024-01-18, so gen_week only sees the
      // surviving window) → compaction → read back through TierFileIndex.
      // The oracle recomputes gen_week (10-min avg over the 1-min gen_day
      // rollup) from the original events under the same retention cut —
      // loss, duplication, a broken manifest, or a mis-published snapshot
      // anywhere in the chain breaks the hash
      val root = graft.Fixtures.newDir("graft_s9m")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      // one measurement keeps the whole path (routing, date partitions,
      // 4-hop cascade, retention, manifest publish, compaction) at 1/5
      // the per-partition filesystem ceremony — the bench measures the
      // path, not 5 copies of it
      store.writeRouted(points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click"))
      Downsampler.maintain(store, Now, sinceDays = 60)
      store.read(graft.model.Tier.GenWeek).select(
        col("measurement"), col("dev_id"), col("dev_type"), col("dir"),
        col("location_id"), unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "a9_streaming_hop" -> ((s, dir) => {
      // the CONTINUOUS rollup (Downsampler.streamingHop, the reference's
      // CQ analog): routed write → file-source stream over the raw
      // tier's append files → watermarked 1-min windows → append into
      // gen_day → read back. Emission = windows sealed by the final
      // watermark (max event time − 30 min); the oracle recomputes them
      // with the same cutoff
      val root = graft.Fixtures.newDir("graft_a9h")
        .toFile.getAbsolutePath
      val store = new graft.store.TierStore(s, root)
      store.writeRouted(points(s, dir, "sensor_")
        .filter(col("measurement") === "sensor_click"))
      // batch-DETERMINISTIC run (r11 ask #3): one data batch holding
      // every routed file, so the driver's stream_diag batch count
      // measures the plan, never the poll cadence
      val q = Downsampler.streamingHop(store, graft.model.Tier.GenRaw,
        graft.model.Tier.GenDay, s"$root/_ckpt_hop", watermark = "30 minutes",
        maxFilesPerTrigger = Some(100000))
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      store.read(graft.model.Tier.GenDay).select(
        col("measurement"), col("dev_id"), col("dev_type"), col("dir"),
        col("location_id"), unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "q_bucketed_join" -> ((s, dir) => {
      // bucketed-storage round trip (store.Bucketing): both sides written
      // bucketed on the join key (the zero-Exchange plan is pinned by
      // BucketingSpec; the oracle pins that bucketed writes lose, dup, or
      // corrupt nothing). The result is materialized (localCheckpoint)
      // so the catalog entries and files can be dropped before returning
      val root = graft.Fixtures.newDir("graft_bkt")
        .toFile.getAbsolutePath
      graft.store.Bucketing.writeBucketed(
        table(s, dir, "documents").select(col("doc_id"), col("text")),
        "bkt_docs", s"$root/docs", 8, Seq("doc_id"))
      graft.store.Bucketing.writeBucketed(
        table(s, dir, "embeddings"),
        "bkt_embs", s"$root/embs", 8, Seq("vec_id"))
      val out = graft.store.Bucketing.table(s, "bkt_docs")
        .join(graft.store.Bucketing.table(s, "bkt_embs"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          size(col("embedding")).cast("long").as("dims"), col("label"))
        .localCheckpoint()
      graft.store.Bucketing.drop(s, "bkt_docs", purge = true)
      graft.store.Bucketing.drop(s, "bkt_embs", purge = true)
      out
    }),

    "a1_windowed_stream" -> ((s, dir) => {
      // the watermarked windowed-aggregation twin of a1 (Aggregator.
      // streamingWindowed), driven through a REAL file-source micro-batch
      // run: append mode emits exactly the windows the final watermark
      // (max event time − 2 h) has sealed; the oracle computes the same
      // windows with the same cutoff from the original events. Pins the
      // watermark semantics end-to-end, not just the window math
      val work = graft.Fixtures.newDir("graft_a1w")
        .toFile.getAbsolutePath
      val pts = events(s, dir).select(
        concat(lit("sensor_"), col("event_type")).as("measurement"),
        col("ts").as("time"),
        round(col("value") * 100).cast("long").cast("double").as("value"),
        element_at(array(lit("mean"), lit("min"), lit("max"), lit("sum"), lit("last")),
          (col("user_id") % 5).cast("int") + 1).as("agg_func"),
        concat(lit("sensor_"), col("event_type"), lit(";"),
          col("user_id").cast("string")).as("series_id"))
      // batch-DETERMINISTIC (r11 ask #3): one data batch + the final
      // watermark-advance batch (see prof_streaming_psi); input written
      // once per JVM (cachedInput — the r13 ask #4 monitor idiom: the
      // byte-identical input re-write was pure setup variance in the
      // timed window; checkpoint and output stay per-run)
      val in = cachedInput(s"a1w:$dir")(p => pts.repartition(4).write.parquet(p))
      val q = Aggregator.streamingWindowed(
          s.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", "100000").parquet(in))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .format("parquet").option("path", s"$work/out").start()
      q.processAllAvailable(); graft.stream.StreamOps.stopAndUnload(q)
      s.read.parquet(s"$work/out").select(
        col("series_id"), col("measurement"), col("agg_func"),
        unix_timestamp(col("time")).as("time"),
        round(col("value"), 6).as("value"))
    }),

    "mm_image_decode" -> ((s, dir) => {
      // multimodal image decode, oracle-verified CROSS-ENGINE: executors
      // hand-write 8×8 24-bit BMP payloads from doc_id (bit-identical on
      // any JVM — Multimodal.Containers, no encoder library), the REAL
      // javax.imageio codec decodes them inside extractFeatures, and
      // DuckDB recomputes every grayscale value arithmetically from the
      // same keys. dim=64 over an 8×8 image puts exactly one pixel in
      // each grid cell, so the cell mean is lum/255 with no accumulation;
      // ×255 + round(0) recovers the integer exactly (float32 error
      // ≤1.5e-5 against a 0.5 rounding margin)
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") % 11 === 0).select(col("doc_id")).as[Long]
        .map { id =>
          graft.functions.Multimodal.MediaRow(id,
            graft.functions.Multimodal.Containers.grayBmp(8, 8)(
              (x, y) => ((id * 31 + (y * 8 + x) * 7) % 256).toInt),
            graft.functions.Multimodal.MediaMeta("image", "bmp", 8, 8, 0L, 0))
        }
      graft.functions.Multimodal.extractFeatures(media, dim = 64).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("long").as("cell"),
          round(col("col").cast("double") * 255d, 0).as("value"))
    }),

    "mm_audio_decode" -> ((s, dir) => {
      // multimodal audio decode, oracle-verified cross-engine: canonical
      // 44-byte-header PCM16 WAVs hand-written from doc_id, decoded by
      // the REAL javax.sound.sampled codec; each of the 16 RMS windows
      // holds 8 samples of one constant power-of-two amplitude k/32768,
      // so every float step (square, sum, mean, sqrt) is EXACT and the
      // oracle needs no rounding at all
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") % 13 === 0).select(col("doc_id")).as[Long]
        .map { id =>
          val samples = Array.tabulate[Short](128) { i =>
            val e = ((id * 3 + (i / 8) * 5) % 5).toInt
            (if (e == 0) 0 else 1024 << e).toShort
          }
          graft.functions.Multimodal.MediaRow(id,
            graft.functions.Multimodal.Containers.pcmWav(8000, samples),
            graft.functions.Multimodal.MediaMeta("audio", "wav", 0, 0, 16L, 8000))
        }
      graft.functions.Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("long").as("win"),
          col("col").cast("double").as("value"))
    }),

    "mm_resize_roundtrip" -> ((s, dir) => {
      // the full image pipeline: BMP decode → REAL bilinear resize →
      // PNG re-encode → PNG decode → feature. Constant-gray 16×16
      // sources resize to the same constant 8×8 (interpolating equal
      // values), so the oracle pins the whole chain with one exact
      // integer per doc×cell
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") % 17 === 0).select(col("doc_id")).as[Long]
        .map { id =>
          val v = ((id * 19 + 7) % 256).toInt
          graft.functions.Multimodal.MediaRow(id,
            graft.functions.Multimodal.Containers.grayBmp(16, 16)((_, _) => v),
            graft.functions.Multimodal.MediaMeta("image", "bmp", 16, 16, 0L, 0))
        }
      val resized = graft.functions.Multimodal.resize(media, 8, 8)
      graft.functions.Multimodal.extractFeatures(resized, dim = 4).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("long").as("cell"),
          round(col("col").cast("double") * 255d, 0).as("value"))
    }),

    "mm_gif_frames" -> ((s, dir) => {
      // the multi-frame video path: 3-frame solid-gray animated GIFs
      // (explicit single-gray palette → palettization exact by
      // construction), sampled at 1 frame/s through sampleFrames (offset
      // → frame index mapping), each PNG-re-encoded frame decoded back
      // to its constant gray. Oracle: one integer per doc×frame
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") % 23 === 0).select(col("doc_id")).as[Long]
        .map { id =>
          val grays = (0 until 3).map(f => ((id * 29 + f * 41) % 256).toInt)
          graft.functions.Multimodal.MediaRow(id,
            graft.functions.Multimodal.Containers.solidGif(8, grays),
            graft.functions.Multimodal.MediaMeta("video", "gif", 8, 8, 3000L, 0))
        }
      graft.functions.Multimodal.sampleFrames(media, everyMs = 1000)
        .map { fr =>
          val f = graft.functions.Multimodal.ImageCodec
            .decodeToFeature(fr.payload, 1).get
          (fr.media_id, fr.frame_idx.toLong, (f(0).toDouble * 255d).round.toDouble)
        }.toDF("media_id", "frame_idx", "value")
    }))

  /**
   * Bench-only twins of the two oracle queries that deliberately run in
   * PORTABLE hash mode for DuckDB parity (md5 simhash bits, arithmetic
   * LSH planes): same blocking/verification pipeline, xxhash64 hashing —
   * the configuration a 100 TB deployment would actually run. Kept out of
   * `queries` because no external engine replicates xxhash64 bit-for-bit
   * (no exact oracle possible); pipeline correctness is covered by the
   * portable twins' oracles.
   */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_simhash_x64" -> ((s, dir) =>
      Dedup.simhashPairs(
        table(s, dir, "documents")
          .filter(size(TextFunctions.tokens(col("text"))) > 0),
        maxDist = 3, portable = false)),
    "sim_lsh_pairs_x64" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(table(s, dir, "embeddings"),
        threshold = 0.4, nPlanes = 6, portable = false)),
    "dedup_winnow_x64" -> ((s, dir) =>
      Dedup.winnowPairs(table(s, dir, "documents"), k = 4, w = 4, minShared = 2,
        portable = false)),
    // capped SCALE-PATH twins of the deliberately-uncapped exact pair
    // queries: the oracled variants keep every posting row so DuckDB can
    // replicate them bit-for-bit, which makes their join cost Σ n_h² in
    // the per-key posting length n_h — superlinear whenever common keys
    // grow with the corpus (measured at sf1: BENCH_SF1.md). These twins
    // measure the documented production setting, where the frequency cap
    // bounds every posting list before the join can square on it.
    "dedup_winnow_pruned" -> ((s, dir) =>
      Dedup.winnowPairs(table(s, dir, "documents"), k = 4, w = 4, minShared = 2,
        maxFpFreq = 16, portable = false)),
    "dedup_clusters_pruned" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3,
        threshold = 0.8, maxShingleFreq = 16)
      Dedup.clusters(pairs).select(col("id").as("doc_id"), col("cluster"))
    }),
    "decon_overlap_x64" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.functions.Decontaminate.flagContaminated(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 4, portable = false)
    }),
    "dedup_spans_x64" -> ((s, dir) =>
      Dedup.duplicateSpans(table(s, dir, "documents"), w = 20,
        portable = false)),
    // the full curation chain (scrub → clean → LM band → near-dup →
    // span cut → decontaminate → pack); every stage individually
    // oracled, the composition timed here
    "pipe_prepare_full" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.functions.Pipeline.prepareTrainingData(
        docs.filter(col("doc_id") % 10 =!= 0),
        Some(docs.filter(col("doc_id") % 10 === 0)), packBudget = 2048)
    }),
    // sketch twin of the oracle'd text_stats: HLL unique + KLL p50/p95 —
    // deterministic but not bit-portable, so bench-only
    "text_stats_approx" -> ((s, dir) =>
      graft.functions.Pipeline.corpusStatsApprox(table(s, dir, "documents"))),
    // the LM score joins on xxhash64 longs instead of raw token text —
    // the shuffle-width configuration a 100 TB run uses (values are
    // identical unless a 2^-64 hash collision merges two counts, which
    // is why the twin is bench-only)
    "text_lm_x64" -> ((s, dir) =>
      graft.functions.LanguageModel.scoreSelf(table(s, dir, "documents"),
        hashKeys = true)),
    // the oracle config runs the n-gram join with pruning DISABLED
    // (worst case, exactly comparable to DuckDB); this twin times the
    // pruning path. At sf0.1 the hottest shingle reaches only 25 docs,
    // so a scale threshold (128+) never binds — 16 binds on the top
    // percentile here, demonstrating the mechanism's cost: one extra
    // aggregate + anti-join, a LINEAR overhead that buys off the
    // QUADRATIC candidate blowup of a 10^6-doc boilerplate shingle at
    // the 100 TB scale the knob exists for
    "dedup_ngram_pruned" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3, threshold = 0.8,
        maxShingleFreq = 16)))

  /** Lighter FIMP binding (no val_json) for filter/topic/enrich queries. */
  private def fimpLite(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      concat(lit("pt:j1/mt:evt/rt:dev/rn:t/ad:1/sv:serv_"), col("event_type"),
        lit("/ad:"), col("user_id").cast("string")).as("topic"),
      concat(lit("serv_"), col("event_type")).as("serv"),
      when(col("event_id") % 3 === 0, "evt.sensor.report")
        .otherwise("cmd.sensor.get_report").as("msg_type"),
      lit("x").as("domain"))

  /** BM25 oracle — shared by the direct and persisted-index paths. */
  private val Bm25OracleSql: String = bm25OracleSql("TRUE")

  /** The BM25 oracle over the documents satisfying `docPred` — the
   *  erased-index oracle reuses the exact formula with the erased ids
   *  filtered out of BOTH the postings and the corpus stats. */
  private def bm25OracleSql(docPred: String): String =
      s"""WITH corpus AS (SELECT * FROM documents WHERE $docPred),
        |toks AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM corpus),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks
        |       WHERE term IN ('table', 'hash', 'merge', 'scan')
        |       GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs,
        |    sum(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)) AS total_dl
        |  FROM corpus),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(
        |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) *
        |        (CAST(tf AS DOUBLE) * 2.2) /
        |        (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total_dl AS DOUBLE) / n_docs)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS contrib_q6
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
        |SELECT doc_id, CAST(sum(contrib_q6) AS BIGINT) AS score_q6
        |FROM contrib GROUP BY doc_id
        |ORDER BY score_q6 DESC, doc_id LIMIT 20""".stripMargin

  // ======================================================== oracle SQL ==

  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_quantity > 5
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_agg" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
        |  count(*) AS n_lines
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,

    "q_sessions" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq FROM events),
        |i AS (SELECT user_id, t, vq,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) <= 1800
        |      THEN 0 ELSE 1 END AS nw FROM e),
        |s AS (SELECT user_id, t, vq,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY t) AS sess FROM i)
        |SELECT user_id, min(t) AS session_start, max(t) AS session_end,
        |  count(*) AS n_events, CAST(sum(vq) AS BIGINT) AS value_q2
        |FROM s GROUP BY user_id, sess""".stripMargin,

    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) t
        |           FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) t, max(value) AS v
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, r.v AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t""".stripMargin,

    // identical oracle — the bucketed execution must be indistinguishable
    "q_asof_bucketed" ->
      """WITH l AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) t
        |           FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) t, max(value) AS v
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, r.v AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t""".stripMargin,

    "q_region_rollup" ->
      """SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "s7_raw_sql" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type""".stripMargin,

    // computed from the ORIGINAL events — equality proves the store
    // write→read round trip is lossless and correctly routed
    "s3_roundtrip" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) AS time,
         |  round(sum(v), 6) AS value
         |FROM pts
         |WHERE m = 'app_click' AND tsec >= 1704067200 AND tsec <= 1706659200
         |GROUP BY 1""".stripMargin,

    // identical oracle to a5_time_bucket: the InfluxQL string path must
    // produce the exact plan the structured request produces
    "s7_influxql" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1703721600, 1706745600, 3600)) t)
         |SELECT s.t AS time, round(a.val, 6) AS value
         |FROM spine s LEFT JOIN agg a USING (t)""".stripMargin,

    "s7_subquery" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1)
         |SELECT CAST(floor(t / 86400) * 86400 AS BIGINT) AS time,
         |  round(max(val), 6) AS value
         |FROM agg GROUP BY 1""".stripMargin,

    "s7_multi_heavy" ->
      s"""WITH ${ptsCte("app_")},
         |c AS (SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) t,
         |        floor(v) val, count(*) cnt
         |      FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1, 2),
         |md AS (SELECT t, val FROM (SELECT t, val, row_number() OVER (
         |         PARTITION BY t ORDER BY cnt DESC, val ASC) rn FROM c) WHERE rn = 1),
         |p AS (SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) b, epoch(ts) et, v
         |      FROM pts WHERE m = 'app_click' AND tsec > 1703721600),
         |w AS (SELECT b, v, lag(v) OVER pw AS pv, et, lag(et) OVER pw AS pt
         |      FROM p WINDOW pw AS (PARTITION BY b ORDER BY et)),
         |ig AS (SELECT b AS t, round(sum((v + pv) / 2 * (et - pt) / 3600), 6) AS igv
         |       FROM w GROUP BY 1),
         |mu AS (SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) t,
         |         round(avg(v), 6) AS muv
         |       FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1)
         |SELECT mu.t AS time, md.val AS md, ig.igv AS ig, mu.muv AS mu
         |FROM mu LEFT JOIN md ON md.t = mu.t LEFT JOIN ig ON ig.t = mu.t""".stripMargin,

    "s7_subquery_multi" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t,
         |          avg(v) AS mu, max(v) AS mx
         |        FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1)
         |SELECT CAST(floor(t / 86400) * 86400 AS BIGINT) AS time,
         |  round(max(mu), 6) AS dmu, min(mx) AS dmx
         |FROM agg GROUP BY 1""".stripMargin,

    "s7_multi_select" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS avg_v, max(v) AS max_v, count(v) AS n,
         |  loc AS location_id
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |GROUP BY 1, 5""".stripMargin,

    "s7_where_or" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |  AND (loc = '1' OR loc = '3' OR v > 95)
         |GROUP BY 1""".stripMargin,

    "s7_where_and_or" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |  AND ((loc = '1' AND dir = 'export') OR (loc = '3' AND v > 50))
         |GROUP BY 1""".stripMargin,

    "s7_where_dnf" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |  AND ((loc = '1' AND (dir = 'export' OR v > 80))
         |    OR (loc = '3' AND v > 50))
         |GROUP BY 1""".stripMargin,

    "s7_where_field" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |  AND v > 30 AND v <= 95.5
         |GROUP BY 1""".stripMargin,

    "s7_where_regex" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value, loc AS location_id
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |  AND regexp_matches(loc, '^[12]$$') AND dir <> 'import'
         |GROUP BY 1, 3""".stripMargin,

    "s7_subquery_deep" ->
      s"""WITH ${ptsCte("app_")},
         |h AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) mu
         |      FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1),
         |d AS (SELECT CAST(floor(t / 86400) * 86400 AS BIGINT) t, max(mu) dmx
         |      FROM h GROUP BY 1)
         |SELECT CAST(floor(t / 604800) * 604800 AS BIGINT) AS time,
         |  round(min(dmx), 6) AS value
         |FROM d GROUP BY 1""".stripMargin,

    "s7_multi_tag" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value, loc AS location_id, dir
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |GROUP BY 1, 3, 4""".stripMargin,

    "s7_regex_from" ->
      s"""WITH ${ptsCte("sensor_")}
         |SELECT m AS measurement,
         |  CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  round(sum(v), 6) AS value
         |FROM pts WHERE m IN ('sensor_click', 'sensor_view')
         |  AND tsec > 1703721600
         |GROUP BY 1, 2""".stripMargin,

    // computed from the ORIGINAL events: the INTO write → store → read
    // loop must reproduce the direct hourly aggregation exactly (the
    // +5e-10 matches the engine side's round-tie nudge)
    "s7_select_into" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) AS time,
         |  round(avg(v) + 5e-10, 6) AS value
         |FROM pts
         |WHERE m = 'app_click' AND tsec >= 1704067200 AND tsec <= 1706659200
         |GROUP BY 1""".stripMargin,

    "s2_log_replay" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS time_sec,
        |  value, 'sensor_temp' AS serv, 'j1' AS domain
        |FROM events""".stripMargin,

    // the CSV write→read loop must reproduce this projection of the
    // original events losslessly (value = exact double round trip)
    "s5_csv_roundtrip" ->
      s"""WITH ${ptsCte("sensor_")}
         |SELECT m AS name, tsec AS time_sec, dev_id, dev_type, dir,
         |  loc AS location_id, m AS service, 'app' AS src,
         |  'rt:dev/sv:' || m AS topic, v AS value, 'W' AS unit
         |FROM pts""".stripMargin,

    "f2_filter_chain" ->
      """SELECT event_id FROM events
        |WHERE ('serv_' || event_type) <> 'ecollector'
        |  AND ('serv_' || event_type) <> 'serv_error'
        |  AND ((CASE WHEN event_id % 3 = 0 THEN 'evt.sensor.report'
        |             ELSE 'cmd.sensor.get_report' END) = 'evt.sensor.report'
        |       OR ('serv_' || event_type) = 'serv_click')""".stripMargin,

    "f3_topic_wildcard" ->
      """SELECT event_id FROM events WHERE event_type = 'click'""".stripMargin,

    "p3_metadata_enrich" ->
      """SELECT event_id,
        |  CAST(user_id AS VARCHAR) AS dev_id,
        |  CAST(user_id % 5 AS VARCHAR) AS location_id,
        |  CASE WHEN user_id % 7 = 0 THEN 'meter.main_elec' ELSE 'sensor' END AS dev_type
        |FROM events WHERE event_type = 'view'""".stripMargin,

    "p5_transform" ->
      """WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) tsec,
        |                  user_id, event_type, value FROM events)
        |SELECT 'electricity_meter_power' AS measurement, tsec AS time_sec,
        |  'import' AS dir, round(value * 100, 6) AS value, 'W' AS unit,
        |  'mean' AS agg_func,
        |  'electricity_meter_power;electricity_meter_power;;import' AS series_id
        |FROM e WHERE event_type = 'purchase' AND user_id % 2 = 0 AND value * 100 <= 30000
        |UNION ALL
        |SELECT 'electricity_meter_power', tsec, 'import', round(value * 1000, 6), 'kW',
        |  'mean', 'electricity_meter_power;electricity_meter_power;;import'
        |FROM e WHERE event_type = 'purchase' AND user_id % 2 = 1 AND value * 1000 <= 30000
        |UNION ALL
        |SELECT 'electricity_meter_energy', tsec, 'import', round(value, 6), 'kWh',
        |  'mean', 'electricity_meter_energy;electricity_meter_energy;;import'
        |FROM e WHERE event_type = 'click'
        |UNION ALL
        |SELECT 'electricity_meter_energy_sampled', tsec, 'import', round(value, 6), 'kWh',
        |  'difference', 'electricity_meter_energy;;import'
        |FROM e WHERE event_type = 'click'
        |UNION ALL
        |SELECT 'sensor_temp.evt.sensor.report', tsec, NULL, round(value, 6), 'C',
        |  'mean', 'sensor_temp.evt.sensor.report;'
        |FROM e WHERE event_type = 'view'
        |UNION ALL
        |SELECT 'thermostat.cmd.setpoint.set', tsec, NULL, round(value, 6), 'C',
        |  'mean', 'thermostat.cmd.setpoint.set;'
        |FROM e WHERE event_type = 'signup'""".stripMargin,

    "p6_typed_extraction" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |  CASE CAST(event_id % 6 AS INT) WHEN 0 THEN 'float' WHEN 1 THEN 'int'
        |    WHEN 2 THEN 'bool' WHEN 3 THEN 'string' WHEN 4 THEN 'null'
        |    ELSE 'object' END AS vt
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN vt = 'float' THEN value
        |       WHEN vt = 'int' THEN CAST(CAST(floor(value) AS BIGINT) AS DOUBLE)
        |       WHEN vt = 'null' THEN 0.0 END AS value,
        |  CASE WHEN vt = 'bool' THEN (event_id % 2 = 0) END AS value_bool,
        |  CASE WHEN vt = 'string' THEN event_type
        |       WHEN vt = 'object' THEN 'object' END AS value_str,
        |  CASE WHEN vt = 'float' THEN 'u' END AS unit
        |FROM e""".stripMargin,

    "p10_transform_fn" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1),
         |d AS (SELECT t, val - lag(val) OVER (ORDER BY t) AS dv FROM agg)
         |SELECT t AS time, round(abs(dv), 6) AS value FROM d WHERE dv IS NOT NULL""".stripMargin,

    "f8_iqr_outliers" ->
      """WITH e AS (SELECT event_id, user_id, value*value*value*value*value AS v
        |           FROM events WHERE event_type = 'view'),
        |st AS (SELECT user_id, quantile_cont(v, 0.25) q1, quantile_cont(v, 0.75) q3
        |       FROM e GROUP BY user_id)
        |SELECT event_id FROM e JOIN st USING (user_id)
        |WHERE v < q1 - 3 * (q3 - q1) OR v > q3 + 3 * (q3 - q1)""".stripMargin,

    "a5_time_bucket" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1703721600, 1706745600, 3600)) t)
         |SELECT s.t AS time, round(a.val, 6) AS value
         |FROM spine s LEFT JOIN agg a USING (t)""".stripMargin,

    "a4_agg_last" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) AS time,
         |  round(arg_max(v, ts), 6) AS value
         |FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1""".stripMargin,

    "a6_group_by_tag" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT tsec AS time, v AS value, loc AS location_id
         |FROM pts WHERE m = 'app_purchase' AND tsec > 1703721600""".stripMargin,

    "a7_time_tag_fill_zero" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 21600) * 21600 AS BIGINT) t, sum(v) val
         |        FROM pts WHERE m = 'app_signup' AND tsec > 1703721600 GROUP BY 1, 2),
         |spine AS (SELECT loc, unnest(generate_series(1703721600, 1706745600, 21600)) t
         |          FROM (SELECT DISTINCT loc FROM agg))
         |SELECT s.loc AS location_id, s.t AS time,
         |  round(coalesce(a.val, 0), 6) AS value
         |FROM spine s LEFT JOIN agg a ON s.loc = a.loc AND s.t = a.t""".stripMargin,

    "a15_percentile" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |       round(quantile_cont(v, 0.95), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1""".stripMargin,

    "a16_derivative" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1),
         |d AS (SELECT t, (val - lag(val) OVER w) / (t - lag(t) OVER w) * 60 AS dv
         |      FROM agg WINDOW w AS (ORDER BY t))
         |SELECT t AS time, round(dv, 6) AS value FROM d WHERE dv IS NOT NULL""".stripMargin,

    "a17_moving_average" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) t, round(avg(v)) val
         |        FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1),
         |r AS (SELECT t, row_number() OVER (ORDER BY t) rn,
         |        avg(val) OVER (ORDER BY t ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) mv
         |      FROM agg)
         |SELECT t AS time, round(mv, 6) AS value FROM r WHERE rn >= 7""".stripMargin,

    "a18_cumulative_sum" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) t, round(avg(v)) val
         |        FROM pts WHERE m = 'app_purchase' AND tsec > 1703721600 GROUP BY 1)
         |SELECT t AS time,
         |  round(sum(val) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS value
         |FROM agg""".stripMargin,

    "a19_top" ->
      s"""WITH ${ptsCte("app_")},
         |r AS (SELECT tsec, v, row_number() OVER (
         |        PARTITION BY CAST(floor(tsec / 86400) * 86400 AS BIGINT)
         |        ORDER BY v DESC, tsec ASC) rn
         |      FROM pts WHERE m = 'app_error' AND tsec > 1703721600)
         |SELECT tsec AS time, round(v, 6) AS value FROM r WHERE rn <= 3""".stripMargin,

    "a20_integral" ->
      s"""WITH ${ptsCte("app_")},
         |p AS (SELECT CAST(floor(tsec / 21600) * 21600 AS BIGINT) b, epoch(ts) et, v
         |      FROM pts WHERE m = 'app_signup' AND tsec > 1703721600),
         |w AS (SELECT b, v, lag(v) OVER pw AS pv, et, lag(et) OVER pw AS pt
         |      FROM p WINDOW pw AS (PARTITION BY b ORDER BY et))
         |SELECT b AS time, round(sum((v + pv) / 2 * (et - pt) / 3600), 6) AS value
         |FROM w GROUP BY 1""".stripMargin,

    "a21_mode" ->
      s"""WITH ${ptsCte("app_")},
         |c AS (SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) t, floor(v) val,
         |        count(*) cnt
         |      FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1, 2),
         |r AS (SELECT t, val, row_number() OVER (
         |        PARTITION BY t ORDER BY cnt DESC, val ASC) rn FROM c)
         |SELECT t AS time, val AS value FROM r WHERE rn = 1""".stripMargin,

    "a22_distinct" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT DISTINCT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  floor(v) AS value
         |FROM pts WHERE m = 'app_view' AND tsec > 1703721600""".stripMargin,

    "a23_elapsed" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_purchase' AND tsec > 1703721600 GROUP BY 1),
         |d AS (SELECT t, floor((t - lag(t) OVER (ORDER BY t)) / 60.0) AS dv FROM agg)
         |SELECT t AS time, dv AS value FROM d WHERE dv IS NOT NULL""".stripMargin,

    "a24_math_chain" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 21600) * 21600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_signup' AND tsec > 1703721600 GROUP BY 1, 2)
         |SELECT loc AS location_id, t AS time,
         |  ceil(log10(sqrt(val))) + 0.0 AS value
         |FROM agg""".stripMargin,

    "a25_count_distinct" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |  count(DISTINCT floor(v)) AS value
         |FROM pts WHERE m = 'app_error' AND tsec > 1703721600 GROUP BY 1""".stripMargin,

    "a26_nn_derivative" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 21600) * 21600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1, 2),
         |spine AS (SELECT loc, unnest(generate_series(1703721600, 1706745600, 21600)) t
         |          FROM (SELECT DISTINCT loc FROM agg)),
         |j AS (SELECT s.loc, s.t, a.val FROM spine s LEFT JOIN agg a
         |      ON s.loc = a.loc AND s.t = a.t),
         |f AS (SELECT loc, t, last_value(val IGNORE NULLS) OVER (
         |        PARTITION BY loc ORDER BY t ROWS UNBOUNDED PRECEDING) AS fv
         |      FROM j),
         |d AS (SELECT loc, t, (fv - lag(fv) OVER w) / (t - lag(t) OVER w) * 3600 AS dv
         |      FROM f WINDOW w AS (PARTITION BY loc ORDER BY t))
         |SELECT loc AS location_id, t AS time, round(dv, 6) AS value
         |FROM d WHERE dv IS NOT NULL AND dv >= 0""".stripMargin,

    "a27_nn_difference" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_error' AND tsec > 1703721600 GROUP BY 1),
         |d AS (SELECT t, val - lag(val) OVER (ORDER BY t) AS dv FROM agg)
         |SELECT t AS time, round(dv, 6) AS value
         |FROM d WHERE dv IS NOT NULL AND dv >= 0""".stripMargin,

    "a28_bottom" ->
      s"""WITH ${ptsCte("app_")},
         |r AS (SELECT tsec, v, loc, row_number() OVER (
         |        PARTITION BY CAST(floor(tsec / 86400) * 86400 AS BIGINT), loc
         |        ORDER BY v ASC, tsec ASC) rn
         |      FROM pts WHERE m = 'app_signup' AND tsec > 1703721600)
         |SELECT tsec AS time, round(v, 6) AS value, loc AS location_id
         |FROM r WHERE rn <= 2""".stripMargin,

    "a30_ema" ->
      s"""WITH RECURSIVE ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 21600) * 21600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_purchase' AND tsec > 1703721600 GROUP BY 1, 2),
         |r AS (SELECT loc, t, val,
         |        row_number() OVER (PARTITION BY loc ORDER BY t) rn FROM agg),
         |e AS (SELECT loc, t, rn, val AS ema FROM r WHERE rn = 1
         |      UNION ALL
         |      SELECT r.loc, r.t, r.rn, 0.5 * r.val + 0.5 * e.ema
         |      FROM r JOIN e ON r.loc = e.loc AND r.rn = e.rn + 1)
         |SELECT loc AS location_id, t AS time, round(ema, 6) AS value FROM e""".stripMargin,

    "a31_ema_blocked" ->
      s"""WITH RECURSIVE ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) t, sqrt(avg(v)) val
         |        FROM pts WHERE m = 'app_error' AND tsec > 1703721600 GROUP BY 1),
         |r AS (SELECT t, val, row_number() OVER (ORDER BY t) rn FROM agg),
         |e AS (SELECT t, rn, val AS ema FROM r WHERE rn = 1
         |      UNION ALL
         |      SELECT r.t, r.rn, 0.5 * r.val + 0.5 * e.ema
         |      FROM r JOIN e ON r.rn = e.rn + 1)
         |SELECT t AS time, round(ema, 6) AS value FROM e""".stripMargin,

    "a29_integral_range" ->
      s"""WITH ${ptsCte("app_")},
         |w AS (SELECT v, lag(v) OVER pw AS pv, epoch(ts) et, lag(epoch(ts)) OVER pw AS pt
         |      FROM pts WHERE m = 'app_click' AND tsec > 1703721600
         |      WINDOW pw AS (ORDER BY epoch(ts)))
         |SELECT round(sum((v + pv) / 2 * (et - pt) / 3600), 3) AS value FROM w""".stripMargin,

    "a32_order_limit" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1)
         |SELECT t AS time, round(val, 6) AS value FROM agg
         |ORDER BY t DESC LIMIT 24 OFFSET 2""".stripMargin,

    "a33_limit_per_series" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 86400) * 86400 AS BIGINT) t, sum(v) val
         |        FROM pts WHERE m = 'app_purchase' AND tsec > 1703721600 GROUP BY 1, 2),
         |r AS (SELECT loc, t, val, row_number() OVER (
         |        PARTITION BY loc ORDER BY t ASC) rn FROM agg)
         |SELECT loc AS location_id, t AS time, round(val, 6) AS value
         |FROM r WHERE rn <= 3""".stripMargin,

    "a34_slimit" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_error' AND tsec > 1703721600 GROUP BY 1, 2),
         |keep AS (SELECT DISTINCT loc FROM agg ORDER BY loc LIMIT 2 OFFSET 1),
         |r AS (SELECT loc, t, val, row_number() OVER (
         |        PARTITION BY loc ORDER BY t DESC) rn
         |      FROM agg WHERE loc IN (SELECT loc FROM keep))
         |SELECT loc AS location_id, t AS time, round(val, 6) AS value
         |FROM r WHERE rn <= 6""".stripMargin,

    "a14_fill_linear" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT loc, CAST(floor(tsec / 21600) * 21600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_signup' AND tsec > 1703721600 GROUP BY 1, 2),
         |spine AS (SELECT loc, unnest(generate_series(1703721600, 1706745600, 21600)) t
         |          FROM (SELECT DISTINCT loc FROM agg)),
         |j AS (SELECT s.loc, s.t, a.val
         |      FROM spine s LEFT JOIN agg a ON s.loc = a.loc AND s.t = a.t),
         |f AS (SELECT loc, t, val,
         |        last_value(val IGNORE NULLS) OVER wp AS pv,
         |        last_value(CASE WHEN val IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt,
         |        first_value(val IGNORE NULLS) OVER wn AS nv,
         |        first_value(CASE WHEN val IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nt
         |      FROM j WINDOW
         |        wp AS (PARTITION BY loc ORDER BY t ROWS UNBOUNDED PRECEDING),
         |        wn AS (PARTITION BY loc ORDER BY t
         |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT loc AS location_id, t AS time,
         |  round(CASE WHEN val IS NOT NULL THEN val
         |             WHEN pv IS NOT NULL AND nv IS NOT NULL
         |             THEN pv + (nv - pv) * (t - pt) / (nt - pt) END, 6) AS value
         |FROM f""".stripMargin,

    "a8_fill_previous" ->
      s"""WITH ${ptsCte("app_")},
         |agg AS (SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) t, avg(v) val
         |        FROM pts WHERE m = 'app_error' AND dev_id = '7' AND tsec > 1703721600
         |        GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1703721600, 1706745600, 3600)) t),
         |j AS (SELECT s.t, a.val FROM spine s LEFT JOIN agg a USING (t))
         |SELECT t AS time,
         |  round(last_value(val IGNORE NULLS) OVER (ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
         |FROM j""".stripMargin,

    "a9_downsample_cascade" ->
      s"""WITH ${ptsCte("sensor_")},
         |t1 AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(tsec / 60) * 60 AS BIGINT) b, avg(v) v
         |       FROM pts GROUP BY 1, 2, 3, 4, 5, 6),
         |t2 AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(b / 600) * 600 AS BIGINT) b, avg(v) v
         |       FROM t1 GROUP BY 1, 2, 3, 4, 5, 6),
         |t3 AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(b / 3600) * 3600 AS BIGINT) b, avg(v) v
         |       FROM t2 GROUP BY 1, 2, 3, 4, 5, 6),
         |agg AS (SELECT CAST(floor(b / 7200) * 7200 AS BIGINT) t, avg(v) val
         |        FROM t3 WHERE m = 'sensor_click'
         |          AND b >= 1704067200 AND b <= 1706659200 GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1704067200, 1706659200, 7200)) t)
         |SELECT s.t AS time, round(a.val, 6) AS value
         |FROM spine s LEFT JOIN agg a USING (t)""".stripMargin,

    "a10_energy" ->
      s"""WITH ${cumCte(None)},
         |agg AS (SELECT loc, CAST(floor(tsec / 86400) * 86400 AS BIGINT) t, sum(v) val
         |        FROM cum WHERE dir = 'import' AND tsec > 1703721600 GROUP BY 1, 2),
         |spine AS (SELECT loc, unnest(generate_series(1703721600, 1706745600, 86400)) t
         |          FROM (SELECT DISTINCT loc FROM agg))
         |SELECT s.loc AS location_id, s.t AS time, round(a.val, 6) AS value
         |FROM spine s LEFT JOIN agg a ON s.loc = a.loc AND s.t = a.t""".stripMargin,

    "a11_regroup" ->
      s"""WITH ${ptsCte("sensor_")}
         |SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) AS time,
         |  loc AS "group", round(sum(v), 6) AS value
         |FROM pts WHERE m = 'sensor_view' GROUP BY 1, 2""".stripMargin,

    "a12_count" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 60) * 60 AS BIGINT) AS time, count(v) AS value
         |FROM pts WHERE m = 'app_error' AND tsec > 1705536000 GROUP BY 1""".stripMargin,

    "a13_stddev" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 86400) * 86400 AS BIGINT) AS time,
         |       round(stddev_samp(v), 6) AS value
         |FROM pts WHERE m = 'app_view' AND tsec > 1703721600 GROUP BY 1""".stripMargin,

    "a1_stream_agg" ->
      """WITH pts AS (
        |  SELECT 'sensor_' || event_type AS m,
        |    'sensor_' || event_type || ';' || CAST(user_id AS VARCHAR) AS s,
        |    CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'mean' WHEN 1 THEN 'min'
        |      WHEN 2 THEN 'max' WHEN 3 THEN 'sum' ELSE 'last' END AS f,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec, ts,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events),
        |agg AS (SELECT s, m, f, CAST(floor(tsec / 30) * 30 AS BIGINT) b,
        |    avg(c) mv, min(c) mnv, max(c) mxv, sum(c) sv, arg_max(c, ts) lv
        |  FROM pts GROUP BY 1, 2, 3, 4),
        |v AS (SELECT s, m, f, b, CASE f WHEN 'mean' THEN mv WHEN 'min' THEN mnv
        |    WHEN 'max' THEN mxv WHEN 'sum' THEN sv ELSE lv END val FROM agg),
        |w AS (SELECT *, coalesce(lag(val) OVER (PARTITION BY s ORDER BY b), 0) pv FROM v)
        |SELECT s AS series_id, m AS measurement, f AS agg_func,
        |  b + 30 AS time_sec, round(val, 6) AS value
        |FROM w WHERE val <> pv""".stripMargin,

    "a2_counter_diff" ->
      s"""WITH ${cumCte(Some(50.0))},
         |d AS (SELECT series, tsec,
         |        v - lag(v) OVER (PARTITION BY series ORDER BY ts, v) delta
         |      FROM cum),
         |f AS (SELECT series, CAST(floor(tsec / 600) * 600 AS BIGINT) b,
         |        round(sum(greatest(delta, 0)), 6) val
         |      FROM d WHERE delta IS NOT NULL GROUP BY 1, 2)
         |SELECT 'meter;' || series AS series_id, 'meter' AS measurement,
         |  b + 600 AS time_sec, val AS value FROM f""".stripMargin,

    // the exact stripHtml → redactPii chain, RE2 regexes with 'g'
    "text_clean" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    '<div class=x>' || text || '</div><script>var a=1;</script> Contact: user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com &amp; +47 22 33 44 55, ip 10.0.0.' ||
        |    CAST(doc_id % 200 AS VARCHAR) || ' card 4111 1111 1111 1111.' AS t
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<[^>]+>', ' ', 'g'),
        |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |        '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')
        |    ), '\s+', ' ', 'g') AS t
        |  FROM dirty)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d[ -]?){15}\d\b', '<CARD>', 'g'),
        |    '\+?\d{2,4}(?:[ -]\d{2,4}){2,5}|\b\+?\d{8,12}\b', '<PHONE>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean
        |FROM stripped""".stripMargin,

    "text_tokens" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS token_count,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS word_count,
        |  round(CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0 END, 6) AS mean_word_len
        |FROM t""".stripMargin,

    // same RE2-subset pattern (single quote SQL-doubled); chr(1) = the SOH joiner on the Spark side
    "text_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe,
         |  md5(array_to_string(regexp_extract_all(text, '${TextFunctions.BpePattern.replace("'", "''")}'), chr(1))) AS tok_md5
         |FROM documents""".stripMargin,

    "text_langid" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |           FROM documents),
        |h AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) he,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','von','zu'))) hd,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','pour','dans','que','des'))) hf,
        |  len(list_filter(toks, x -> x IN ('el','la','los','y','es','una','por','con','para','del'))) hs
        |  FROM t)
        |SELECT doc_id, CASE
        |  WHEN he >= hd AND he >= hf AND he >= hs AND he > 0 THEN 'en'
        |  WHEN hd >= hf AND hd >= hs AND hd > 0 THEN 'de'
        |  WHEN hf >= hs AND hf > 0 THEN 'fr'
        |  WHEN hs > 0 THEN 'es'
        |  ELSE 'und' END AS lang_pred
        |FROM h""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |c AS (SELECT doc_id, text, toks,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS wl,
        |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN (
        |    'the','a','of','and','to','in','is','that','it','for',
        |    'der','die','das','und','ist','nicht','ein','mit','von','zu',
        |    'le','la','les','et','est','une','pour','dans','que','des',
        |    'el','los','y','es','una','por','con','para','del'))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS sw,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS pr,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS dr
        |  FROM t)
        |SELECT doc_id, round(
        |  len_score * 0.3 + (CASE WHEN wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |  least(sw * 5.0, 1.0) * 0.2 + (1.0 - least(pr * 5.0, 1.0)) * 0.15 +
        |  (1.0 - least(dr * 5.0, 1.0)) * 0.15, 6) AS score
        |FROM c""".stripMargin,

    "pipe_clean_corpus" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |c AS (SELECT doc_id, text, toks,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS wl,
        |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN (
        |    'the','a','of','and','to','in','is','that','it','for',
        |    'der','die','das','und','ist','nicht','ein','mit','von','zu',
        |    'le','la','les','et','est','une','pour','dans','que','des',
        |    'el','los','y','es','una','por','con','para','del'))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS sw,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS pr,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS dr,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) he,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','von','zu'))) hd,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','pour','dans','que','des'))) hf,
        |  len(list_filter(toks, x -> x IN ('el','la','los','y','es','una','por','con','para','del'))) hs
        |  FROM t),
        |scored AS (SELECT doc_id, text,
        |  CASE WHEN he >= hd AND he >= hf AND he >= hs AND he > 0 THEN 'en'
        |       WHEN hd >= hf AND hd >= hs AND hd > 0 THEN 'de'
        |       WHEN hf >= hs AND hf > 0 THEN 'fr'
        |       WHEN hs > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred,
        |  round(len_score * 0.3 +
        |    (CASE WHEN wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |    least(sw * 5.0, 1.0) * 0.2 + (1.0 - least(pr * 5.0, 1.0)) * 0.15 +
        |    (1.0 - least(dr * 5.0, 1.0)) * 0.15, 6) AS score
        |  FROM c),
        |kept AS (SELECT doc_id, score,
        |    md5(trim(substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 64))) AS fp
        |  FROM scored WHERE lang_pred = 'en' AND score >= 0.3)
        |SELECT fp, min(doc_id) AS doc_id, arg_min(score, doc_id) AS score,
        |  count(*) AS dups
        |FROM kept GROUP BY fp""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |r AS (SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) ls,
        |    toks,
        |    list_transform(range(len(toks) - 2),
        |      i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]) g3
        |  FROM t)
        |SELECT doc_id,
        |  CAST(floor((CASE WHEN len(ls) > 0 THEN
        |      CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
        |    ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS dup_line_q6,
        |  CAST(floor((CASE WHEN len(toks) > 0 THEN
        |      CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |    ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS dup_word_q6,
        |  CAST(floor((CASE WHEN len(g3) > 0 THEN
        |      CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |    ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS dup_3gram_q6
        |FROM r""".stripMargin,

    "decon_overlap" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(len(toks) - 3),
        |      i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
        |           toks[i + 3] || ' ' || toks[i + 4]))) AS gram
        |  FROM t),
        |k AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS k FROM g),
        |b AS (SELECT DISTINCT k FROM k WHERE doc_id % 10 = 0),
        |c AS (SELECT doc_id, k FROM k WHERE doc_id % 10 <> 0)
        |SELECT c.doc_id, count(*) AS hits
        |FROM c JOIN b USING (k) GROUP BY 1""".stripMargin,

    "text_stats" ->
      """SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
        |    AS total_tokens,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  count(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
        |    AS n_unique
        |FROM documents GROUP BY source""".stripMargin,

    "text_tfidf" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term, tf,
        |    CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000.0 + 0.5)
        |      AS BIGINT) AS score_q6
        |  FROM tfq JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score_q6 DESC, term) AS rank FROM s)
        |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, score_q6
        |FROM r WHERE rank <= 5""".stripMargin,

    "text_lm_score" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |d AS (SELECT * FROM t WHERE len(toks) > 0),
        |p AS (SELECT doc_id, toks,
        |    unnest(range(len(toks))) AS pos, unnest(toks) AS cur FROM d),
        |pp AS (SELECT doc_id, pos, cur,
        |    CASE WHEN pos >= 1 THEN toks[pos] END AS prev FROM p),
        |uni AS (SELECT cur AS token, count(*) AS cnt FROM pp GROUP BY 1),
        |bi AS (SELECT prev, cur, count(*) AS cnt FROM pp
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM uni),
        |sc AS (SELECT pp.doc_id,
        |    CASE WHEN pp.pos = 0 THEN
        |      ln(CAST(coalesce(u.cnt, 0) + 1 AS DOUBLE) /
        |         CAST(tot.n + tot.v AS DOUBLE))
        |    ELSE
        |      ln(CAST(coalesce(b.cnt, 0) + 1 AS DOUBLE) /
        |         CAST(coalesce(up.cnt, 0) + tot.v AS DOUBLE))
        |    END AS lp
        |  FROM pp
        |  LEFT JOIN uni u ON u.token = pp.cur
        |  LEFT JOIN uni up ON up.token = pp.prev
        |  LEFT JOIN bi b ON b.prev = pp.prev AND b.cur = pp.cur
        |  CROSS JOIN tot),
        |q AS (SELECT doc_id,
        |    CAST(floor(lp * 10000.0 + 0.5) AS BIGINT) AS lpq FROM sc)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(floor(CAST(sum(lpq) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
        |    AS lp_q4
        |FROM q GROUP BY doc_id""".stripMargin,

    "text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) n,
        |        unnest(range(0, len(toks), 48)) AS start
        |      FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(start / 48 AS BIGINT) AS chunk_idx,
        |  least(64, n - start) AS chunk_tokens,
        |  md5(array_to_string(list_slice(toks, start + 1, least(start + 64, n)), ' '))
        |    AS chunk_fp
        |FROM s""".stripMargin,

    "text_dedup_lines" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    unnest(range(len(string_split(text, chr(10))))) AS pos,
        |    unnest(string_split(text, chr(10))) AS line
        |  FROM documents),
        |hot AS (SELECT line AS hline FROM l WHERE len(trim(line)) > 0
        |        GROUP BY line HAVING count(*) > 2),
        |k AS (SELECT doc_id, pos, line FROM l LEFT JOIN hot ON line = hline
        |      WHERE hline IS NULL OR len(trim(line)) = 0)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |FROM k GROUP BY doc_id""".stripMargin,

    "text_vocab_encode" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |tok AS (SELECT doc_id, unnest(range(len(toks))) AS pos,
        |        unnest(toks) AS token FROM t),
        |cnt AS (SELECT token, count(*) n FROM tok GROUP BY token),
        |v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) - 1 AS id
        |      FROM cnt ORDER BY n DESC, token LIMIT 100),
        |e AS (SELECT doc_id, pos, coalesce(v.id, 100) AS id
        |      FROM tok LEFT JOIN v USING (token))
        |SELECT doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE id = 100) AS n_oov,
        |  CAST(sum((pos + 1) * id) AS BIGINT) AS idsum
        |FROM e GROUP BY doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH k AS (SELECT doc_id,
        |    trim(substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 64)) AS key
        |  FROM documents)
        |SELECT md5(key) AS fp, min(doc_id) AS doc_id, count(*) AS copies
        |FROM k GROUP BY md5(key)""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |        any_value(a.n) na, any_value(b.n) nb
        |      FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= 0.8""".stripMargin,

    // transitive closure of the verified pair list (recursive CTE): min
    // reachable id ≡ the engine's min-label-propagation fixpoint
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |        any_value(a.n) na, any_value(b.n) nb
        |      FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pr AS (SELECT id_a, id_b FROM j
        |       WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= 0.8),
        |e AS (SELECT id_a s, id_b d FROM pr UNION SELECT id_b, id_a FROM pr),
        |walk(s, d) AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT w.s, e.d FROM walk w JOIN e ON w.d = e.s)
        |SELECT s AS doc_id, least(s, min(d)) AS cluster
        |FROM walk GROUP BY s""".stripMargin,

    "samp_bernoulli" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < 0.25""".stripMargin,

    "samp_split" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS uu
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN uu < 0.9 THEN 'train'
        |       WHEN uu < 0.95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM u""".stripMargin,

    "samp_mixture" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS uu
        |  FROM documents)
        |SELECT doc_id, source FROM u
        |WHERE uu < CASE WHEN source = 'src0' THEN 1.0
        |                WHEN source = 'src1' THEN 0.5
        |                ELSE 0.1 END""".stripMargin,

    "samp_top_quality" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |c AS (SELECT doc_id, source,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS wl,
        |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN (
        |    'the','a','of','and','to','in','is','that','it','for',
        |    'der','die','das','und','ist','nicht','ein','mit','von','zu',
        |    'le','la','les','et','est','une','pour','dans','que','des',
        |    'el','los','y','es','una','por','con','para','del'))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS sw,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS pr,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS dr
        |  FROM t),
        |sc AS (SELECT doc_id, source, round(
        |  len_score * 0.3 + (CASE WHEN wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |  least(sw * 5.0, 1.0) * 0.2 + (1.0 - least(pr * 5.0, 1.0)) * 0.15 +
        |  (1.0 - least(dr * 5.0, 1.0)) * 0.15, 6) AS score FROM c),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) rn,
        |        count(*) OVER (PARTITION BY source) n
        |      FROM sc)
        |SELECT doc_id, source FROM r WHERE rn <= ceil(n * 0.2)""".stripMargin,

    // DSIR importance weights: hashed-bigram buckets (md5-60-bit % 4096),
    // add-one-smoothed target (src0) vs raw (whole corpus) multinomials,
    // per-bucket log-ratio quantized to integer 1e-4 nats before the
    // order-independent sum. The outer CASTs keep DuckDB's HUGEINT sums
    // from hash-mismatching Spark's longs.
    "samp_dsir" ->
      """WITH toksrc AS (
        |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') t
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % 4096 AS b
        |  FROM (SELECT doc_id, source,
        |          unnest(list_transform(range(len(t) - 1),
        |            i -> t[i + 1] || ' ' || t[i + 2])) AS g
        |        FROM toksrc WHERE len(t) >= 2)),
        |tcnt AS (SELECT b, count(*) c FROM feat WHERE source = 'src0' GROUP BY 1),
        |rcnt AS (SELECT b, count(*) c FROM feat GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) n FROM tcnt),
        |rt AS (SELECT CAST(sum(c) AS BIGINT) n FROM rcnt),
        |lam AS (
        |  SELECT rc.b,
        |    CAST(floor((ln((coalesce(tc.c, 0) + 1) / (tt.n + 4096.0)) -
        |                ln((rc.c + 1) / (rt.n + 4096.0))) * 10000.0 + 0.5)
        |      AS BIGINT) AS lam_q4
        |  FROM rcnt rc LEFT JOIN tcnt tc ON rc.b = tc.b
        |  CROSS JOIN tt CROSS JOIN rt),
        |sc AS (
        |  SELECT f.doc_id, CAST(count(*) AS BIGINT) n_feat,
        |         CAST(sum(lam.lam_q4) AS BIGINT) iw_q4
        |  FROM feat f JOIN lam ON f.b = lam.b GROUP BY 1)
        |SELECT d.doc_id, coalesce(sc.n_feat, 0) AS n_feat,
        |       coalesce(sc.iw_q4, 0) AS iw_q4
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    "samp_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) tok,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS uu,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS BIGINT)
        |      % 8 AS bucket
        |  FROM documents),
        |c AS (SELECT doc_id, bucket, tok,
        |    CAST(sum(tok) OVER (PARTITION BY bucket ORDER BY uu, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - tok AS bef
        |  FROM t)
        |SELECT doc_id, bucket,
        |  CAST(floor(bef / 512.0) AS BIGINT) AS seq_id,
        |  bef % 512 AS tok_offset, tok AS n_tokens
        |FROM c""".stripMargin,

    // full-window formulation — the engine's two-phase plan must produce
    // exactly this deterministic per-source top-10
    "samp_cap_source" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS uu
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source ORDER BY uu, doc_id) rn
        |      FROM u)
        |SELECT doc_id, source FROM r WHERE rn <= 10""".stripMargin,

    "dedup_winnow_pairs" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |g AS (SELECT doc_id, list_transform(range(len(toks) - 3),
        |        i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
        |             toks[i + 3] || ' ' || toks[i + 4]) AS grams
        |      FROM t WHERE len(toks) >= 4),
        |h AS (SELECT doc_id, list_transform(grams,
        |        s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS hs
        |      FROM g),
        |sel AS (SELECT doc_id,
        |        CASE WHEN len(hs) < 4 THEN [list_min(hs)]
        |          ELSE list_distinct(list_transform(range(len(hs) - 3),
        |            i -> list_min(list_slice(hs, i + 1, i + 4)))) END AS fps
        |        FROM h),
        |f AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM sel),
        |p AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) AS shared
        |      FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, shared FROM p WHERE shared >= 2""".stripMargin,

    "dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |        any_value(a.n) na, any_value(b.n) nb
        |      FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= 0.8""".stripMargin,

    "dedup_spans" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(range(len(toks) - 19)) AS pos,
        |    unnest(list_transform(range(len(toks) - 19),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 20), ' '))) AS g
        |  FROM t WHERE len(toks) >= 20),
        |k AS (SELECT doc_id, pos,
        |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS k FROM w),
        |hot AS (SELECT k FROM k GROUP BY k HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM k JOIN hot USING (k)),
        |i AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
        |      THEN 0 ELSE 1 END AS nw
        |  FROM m),
        |s AS (SELECT doc_id, pos,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 19 AS span_end,
        |  max(pos) + 19 - min(pos) + 1 AS span_tokens
        |FROM s GROUP BY doc_id, island""".stripMargin,

    "dedup_spans_cut" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(range(len(toks) - 19)) AS pos,
        |    unnest(list_transform(range(len(toks) - 19),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 20), ' '))) AS g
        |  FROM t WHERE len(toks) >= 20),
        |k AS (SELECT doc_id, pos,
        |    CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS k FROM w),
        |hot AS (SELECT k FROM k GROUP BY k HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM k JOIN hot USING (k)),
        |i AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
        |      THEN 0 ELSE 1 END AS nw
        |  FROM m),
        |s AS (SELECT doc_id, pos,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i),
        |sp AS (SELECT doc_id, min(pos) AS a, max(pos) + 19 AS b
        |       FROM s GROUP BY doc_id, island),
        |hits AS (SELECT DISTINCT doc_id, unnest(range(a, b + 1)) AS pos FROM sp),
        |tok AS (SELECT doc_id, unnest(range(len(toks))) AS pos,
        |        unnest(toks) AS tk FROM t WHERE len(toks) > 0),
        |keep AS (SELECT tok.doc_id, tok.pos, tok.tk
        |         FROM tok LEFT JOIN hits
        |           ON tok.doc_id = hits.doc_id AND tok.pos = hits.pos
        |         WHERE hits.doc_id IS NULL)
        |SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS text
        |FROM keep GROUP BY doc_id""".stripMargin,

    "dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT b.doc_id id_new, a.doc_id id_idx, count(*) inter,
        |        any_value(a.n) ni, any_value(b.n) nn
        |      FROM p a JOIN p b ON a.g = b.g
        |      WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |      GROUP BY 1, 2)
        |SELECT id_new, id_idx,
        |  round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) >= 0.8""".stripMargin,

    // same arithmetic chain: widen float→double, scale = max|x|/127,
    // q_i = floor(x_i/scale + 0.5); checksum Σ i·q_i (1-based i ≡ Spark's
    // 0-based index + 1). The outer CAST on qsum matters: DuckDB's
    // list_sum over BIGINT widens to HUGEINT, which the compare layer
    // renders as a float ("1234.0") and hash-mismatches Spark's long —
    // the round-3 failure was this type artifact, not the arithmetic.
    "sim_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
        |  FROM embeddings)
        |SELECT vec_id, CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS scale_q6,
        |  CAST(CASE WHEN s = 0 THEN 0 ELSE
        |    list_sum(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(floor(CAST(embedding[i] AS DOUBLE) / s + 0.5) AS BIGINT) * i))
        |  END AS BIGINT) AS qsum
        |FROM q""".stripMargin,

    "sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank FROM r WHERE rnk <= 10""".stripMargin,

    "sim_ivf_topk" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank FROM r WHERE rnk <= 10""".stripMargin,

    // the streamed-then-compacted index at full probe ≡ brute force over
    // the whole corpus — the same equivalence sim_ivf_topk pins for the
    // inline IVF, here proving the incremental maintenance lost nothing
    // and the replay/compaction cycle duplicated nothing
    "sim_ivf_stream" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank
        |FROM r WHERE rnk <= 10""".stripMargin,

    // the PINNED index at full probe ≡ brute force over the PINNED
    // corpus only (evens + phase A): phase B's later ledgered appends
    // and the history-retaining fold must both be invisible to the pin
    "sim_ivf_asof" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q
        |       WHERE e.vec_id <> q.qid
        |         AND (e.vec_id % 2 = 0 OR e.vec_id % 4 = 1)),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank
        |FROM r WHERE rnk <= 10""".stripMargin,

    // the rebuilt (generation-1) index at full probe ≡ brute force over
    // the WHOLE corpus: the retrain/re-assign/atomic-swap cycle and the
    // post-swap replay skip are all pinned by the same equivalence
    // per-list drift stats of the portable index ≡ the full replication
    // of portable train (evens, 1 iter) → 6-dp argmax assignment of the
    // whole corpus → per-list micro-unit aggregates; empty lists kept
    // with n = 0
    "sim_ivf_drift" ->
      """WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |seeds AS (SELECT vec_id FROM (
        |    SELECT vec_id, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) / 4294967296.0 AS u
        |    FROM embeddings WHERE vec_id % 2 = 0 ORDER BY u, vec_id LIMIT 4)),
        |c0 AS (SELECT v.vec_id AS list_id, dim, x AS cx FROM v JOIN seeds USING (vec_id)),
        |d1 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.cx) AS dot,
        |    sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.cx * c.cx)) AS ncn
        |  FROM v JOIN c0 c USING (dim) WHERE v.vec_id % 2 = 0
        |  GROUP BY v.vec_id, c.list_id),
        |a1 AS (SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY round(CASE WHEN nv > 0 AND ncn > 0
        |        THEN dot / (nv * ncn) ELSE 0 END, 6) DESC, list_id) AS rk
        |    FROM d1) WHERE rk = 1),
        |c1 AS (SELECT a.list_id, v.dim,
        |    sum(CAST(floor(v.x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 / count(*) AS cx
        |  FROM v JOIN a1 a USING (vec_id) GROUP BY a.list_id, v.dim),
        |d2 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.cx) AS dot,
        |    sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.cx * c.cx)) AS ncn
        |  FROM v JOIN c1 c USING (dim) GROUP BY v.vec_id, c.list_id),
        |a2 AS (SELECT vec_id, list_id, cosq6 FROM (
        |    SELECT vec_id, list_id,
        |      CAST(floor((CASE WHEN nv > 0 AND ncn > 0
        |        THEN dot / (nv * ncn) ELSE 0 END) * 1000000.0 + 0.5) AS BIGINT) AS cosq6,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(CASE WHEN nv > 0 AND ncn > 0
        |          THEN dot / (nv * ncn) ELSE 0 END, 6) DESC, list_id) AS rk
        |    FROM d2) WHERE rk = 1),
        |st AS (SELECT list_id, count(*) AS n, sum(cosq6) AS s, min(cosq6) AS m
        |       FROM a2 GROUP BY list_id)
        |SELECT l.list_id, CAST(coalesce(st.n, 0) AS BIGINT) AS n,
        |  CAST(st.s AS BIGINT) AS sum_cos_q6, st.m AS min_cos_q6
        |FROM (SELECT DISTINCT list_id FROM c1) l LEFT JOIN st USING (list_id)""".stripMargin,

    // the erased index at full probe ≡ brute force over the SURVIVING
    // corpus only (vec_id % 7 <> 3): the erase removed exactly the
    // requested vectors from both halves and nothing else
    "sim_ivf_erase" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings
        |           WHERE vec_id < 6 AND vec_id % 7 <> 3),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q
        |       WHERE e.vec_id <> q.qid AND e.vec_id % 7 <> 3),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank
        |FROM r WHERE rnk <= 10""".stripMargin,

    "sim_ivf_rebuild" ->
      """WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |z AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, score, CAST(rnk AS INTEGER) AS rank
        |FROM r WHERE rnk <= 10""".stripMargin,

    // the REBUILT index (k 64→32 banding migration from stored
    // shingles) ≡ exact cross-set Jaccard over the whole indexed
    // corpus: banding recall only widened (r 4→2), candidates stay
    // exact-verified
    "dedup_index_rebuild" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT b.doc_id id_new, a.doc_id id_idx, count(*) inter,
        |        any_value(a.n) ni, any_value(b.n) nn
        |      FROM p a JOIN p b ON a.g = b.g
        |      WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |      GROUP BY 1, 2)
        |SELECT id_new, id_idx,
        |  round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) >= 0.8""".stripMargin,

    // the pinned dedup query ≡ exact cross-set Jaccard against the
    // PINNED half of the index only (doc_id % 10 in 1..4) — the
    // appended half (% 10 >= 5) must not leak through the pin
    "dedup_index_asof" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT b.doc_id id_new, a.doc_id id_idx, count(*) inter,
        |        any_value(a.n) ni, any_value(b.n) nn
        |      FROM p a JOIN p b ON a.g = b.g
        |      WHERE a.doc_id % 10 BETWEEN 1 AND 4 AND b.doc_id % 10 = 0
        |      GROUP BY 1, 2)
        |SELECT id_new, id_idx,
        |  round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) >= 0.8""".stripMargin,

    // the corpus-store audit ≡ an independent survivor count: gen_raw
    // physically holds exactly the non-erased sensor_click rows, zero
    // erased-device rows anywhere, every other tier empty
    "s11_tier_erase_audit" ->
      s"""WITH ${ptsCte("sensor_")},
        |surv AS (SELECT count(*) AS n FROM pts
        |         WHERE m = 'sensor_click' AND dev_id <> '3')
        |SELECT 'gen_raw' AS tier, CAST(n AS BIGINT) AS rows_scanned,
        |  CAST(0 AS BIGINT) AS rows_found FROM surv
        |UNION ALL
        |SELECT t, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM (VALUES ('gen_day'), ('gen_week'), ('gen_month'),
        |  ('gen_year'), ('gen_default')) v(t)""".stripMargin,

    // the raw-scan audit ≡ what each index must physically hold for the
    // survivors: IVF one row per surviving vector, MinHash bands+1 rows
    // per surviving shingle-able doc, BM25 one posting per surviving
    // (doc, distinct term) pair — and zero erased rows anywhere
    "s11_erase_audit" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents WHERE doc_id % 2 = 0),
        |u AS (
        |  SELECT 'ivf' AS store, count(*) AS rows_scanned
        |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 <> 6
        |  UNION ALL
        |  SELECT 'minhash', 17 * count(*)
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 <> 6
        |    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3
        |  UNION ALL
        |  SELECT 'bm25', count(*) FROM (
        |    SELECT DISTINCT doc_id, term FROM toks WHERE doc_id % 10 <> 6))
        |SELECT store, CAST(rows_scanned AS BIGINT) AS rows_scanned,
        |  CAST(0 AS BIGINT) AS rows_found
        |FROM u""".stripMargin,

    // the loaded cross-store pin vector reproduces all three stores'
    // exact capture-time state at once: the corpus witness sees only
    // the import half, the ANN arm ≡ brute force over the even
    // embeddings only, the dedup arm ≡ exact Jaccard against the
    // % 10 in 1..4 members only — phase B (export half, odd
    // embeddings, % 10 >= 5 docs) and every fold must be invisible
    "pipe_run_pin" ->
      s"""WITH ${ptsCte("sensor_")},
        |tierarm AS (
        |  SELECT 'tier:' || m AS part, count(*) AS k1,
        |    CAST(sum(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS k2,
        |    0.0 AS v
        |  FROM pts WHERE m = 'sensor_click' AND dir = 'import' GROUP BY m),
        |q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 5),
        |prv AS (SELECT q.qid, e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q
        |       WHERE e.vec_id <> q.qid AND e.vec_id % 2 = 0),
        |zz AS (SELECT qid, vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM prv),
        |ss AS (SELECT qid, vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM zz GROUP BY 1, 2),
        |scs AS (SELECT qid, vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM ss),
        |rr AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM scs),
        |ivfarm AS (SELECT 'ivf' AS part, qid AS k1, vec_id AS k2, score AS v
        |           FROM rr WHERE rnk <= 10),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |pp AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |jj AS (SELECT b.doc_id id_new, a.doc_id id_idx, count(*) inter,
        |        any_value(a.n) ni, any_value(b.n) nn
        |      FROM pp a JOIN pp b ON a.g = b.g
        |      WHERE a.doc_id % 10 BETWEEN 1 AND 4 AND b.doc_id % 10 = 0
        |      GROUP BY 1, 2),
        |mharm AS (SELECT 'mh' AS part, id_new AS k1, id_idx AS k2,
        |    round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) AS v
        |  FROM jj
        |  WHERE round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) >= 0.8)
        |SELECT * FROM tierarm UNION ALL SELECT * FROM ivfarm
        |UNION ALL SELECT * FROM mharm""".stripMargin,

    // the erased dedup index ≡ exact cross-set Jaccard against the
    // SURVIVING index members only (% 10 in 1..9 minus the erased
    // {2, 7} slices) — the erased docs answer from neither table, and
    // every survivor still answers
    "dedup_index_erase" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |    i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])) AS s
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |p AS (SELECT doc_id, len(s) n, unnest(s) g FROM sh WHERE len(s) > 0),
        |j AS (SELECT b.doc_id id_new, a.doc_id id_idx, count(*) inter,
        |        any_value(a.n) ni, any_value(b.n) nn
        |      FROM p a JOIN p b ON a.g = b.g
        |      WHERE a.doc_id % 10 NOT IN (0, 2, 7) AND b.doc_id % 10 = 0
        |      GROUP BY 1, 2)
        |SELECT id_new, id_idx,
        |  round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (ni + nn - inter), 6) >= 0.8""".stripMargin,

    "sim_cosine_pairs" ->
      """WITH pr AS (SELECT a.vec_id id_a, b.vec_id id_b, a.embedding va, b.embedding vb
        |       FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id),
        |z AS (SELECT id_a, id_b, CAST(unnest(va) AS DOUBLE) a,
        |        CAST(unnest(vb) AS DOUBLE) b FROM pr),
        |s AS (SELECT id_a, id_b, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s)
        |SELECT id_a, id_b, score FROM sc WHERE score >= 0.4""".stripMargin,

    // computed from the ORIGINAL events — equality proves the API
    // write→store→planner chain is lossless (s3's recipe, one level up)
    "s6_write_api" ->
      """SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS time,
        |  round(sum(value), 6) AS value
        |FROM events
        |WHERE event_type = 'click' AND user_id % 5 = 0
        |  AND CAST(floor(epoch(ts)) AS BIGINT) > 1703721600
        |GROUP BY 1""".stripMargin,

    // the expected catalog under the routing rule: sensor_* measurements
    // are high-frequency → gen_raw, app_* low-frequency → gen_default
    "s8_catalog" ->
      """SELECT 'gen_raw' AS tier, 'sensor_' || event_type AS measurement
        |FROM events GROUP BY 2
        |UNION ALL
        |SELECT 'gen_default' AS tier, 'app_' || event_type AS measurement
        |FROM events GROUP BY 2""".stripMargin,

    "s12_show_meas_regex" ->
      """SELECT 'gen_raw' AS tier, 'sensor_' || event_type AS measurement
        |FROM events WHERE event_type IN ('click', 'view') GROUP BY 2""".stripMargin,

    "s12_show_keys" ->
      """SELECT 'tag' AS kind, unnest(['dev_id', 'dev_type', 'dir',
        |  'location_id', 'series_id']) AS k, 'app_view' AS v
        |UNION ALL
        |SELECT 'field', 'value', 'float'""".stripMargin,

    "s12_show_tag_values" ->
      """SELECT DISTINCT 'location_id' AS key,
        |  CAST(user_id % 5 AS VARCHAR) AS value
        |FROM events WHERE event_type = 'view'""".stripMargin,

    "s12_show_series" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT DISTINCT 'app_click,dev_id=' || dev_id || ',dev_type=' ||
         |  dev_type || ',dir=' || dir || ',location_id=' || loc ||
         |  ',series_id=' || series AS key
         |FROM pts WHERE m = 'app_click'""".stripMargin,

    // a3's per-pair fold model over a thinned, gap-heavy fixture; the
    // staleness arm (bkt - pt > 7200 → 0) wipes ~82% of pairs here
    "f9_staleness" ->
      """WITH cum0 AS (
        |  SELECT user_id, ts, tsec, v FROM (
        |    SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |           (round(sum(value) OVER w, 6) % 60.0) AS v
        |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
        |cum AS (SELECT user_id, tsec, v FROM cum0 WHERE hour(ts) % 6 < 4),
        |ord AS (
        |  SELECT user_id, tsec, v,
        |         lag(v) OVER w2 AS pv, lag(tsec) OVER w2 AS pt,
        |         (tsec // 600) * 600 AS bkt
        |  FROM cum WINDOW w2 AS (PARTITION BY user_id ORDER BY tsec)),
        |res AS (
        |  SELECT user_id, bkt,
        |         sum(CASE WHEN pt IS NULL THEN 0.0
        |                  WHEN bkt - pt > 7200 THEN 0.0
        |                  WHEN v >= pv THEN v - pv
        |                  ELSE 0.0 END) AS result
        |  FROM ord GROUP BY 1, 2)
        |SELECT 'f9_meter;' || CAST(user_id AS VARCHAR) AS series_id,
        |       (bkt - 3000) - ((bkt - 3000) % 3600) + 3540 AS time_sec,
        |       round(result, 6) AS value
        |FROM res WHERE result <> 0.0 AND result <= 100.0""".stripMargin,

    "f7_tier_routing" ->
      """WITH names AS (
        |  SELECT DISTINCT m AS measurement FROM (
        |    SELECT 'sensor_' || event_type AS m FROM events
        |    UNION ALL SELECT 'app_' || event_type FROM events
        |    UNION ALL SELECT 'electricity_meter_energy_sampled'
        |    UNION ALL SELECT 'sensor_presence.evt.report'
        |    UNION ALL SELECT 'electricity_meter_power')),
        |cls AS (
        |  SELECT measurement,
        |    (measurement IN ('electricity_meter_power', 'electricity_meter_energy',
        |       'electricity_meter_ext', 'electricity_meter_energy_sampled')
        |     OR contains(measurement, 'sensor_'))
        |    AND NOT contains(measurement, 'sensor_presence')
        |    AND NOT contains(measurement, 'sensor_contact') AS high_freq
        |  FROM names)
        |SELECT measurement, high_freq,
        |  CASE WHEN measurement = 'electricity_meter_energy_sampled' THEN 'gen_year'
        |       WHEN high_freq THEN 'gen_raw'
        |       ELSE 'gen_default' END AS tier
        |FROM cls""".stripMargin,

    // A3 hourly-profile difference fold: per-pair positive deltas assigned
    // to the right endpoint's 10-min bucket; a pair is wiped iff the
    // bucket start is >120 min past the left endpoint (= the fold's
    // staleness flush); emit at adjustTimeByOneHour(bucket + 600) when the
    // bucket sum is nonzero and ≤ 100 (agreggator.go:236-310 semantics).
    "a3_hourly_profile" ->
      """WITH cum AS (
        |  SELECT user_id, tsec, v FROM (
        |    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |           (round(sum(value) OVER w, 6) % 80.0) AS v
        |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
        |ord AS (
        |  SELECT user_id, tsec, v,
        |         lag(v) OVER w2 AS pv, lag(tsec) OVER w2 AS pt,
        |         (tsec // 600) * 600 AS bkt
        |  FROM cum WINDOW w2 AS (PARTITION BY user_id ORDER BY tsec)),
        |res AS (
        |  SELECT user_id, bkt,
        |         sum(CASE WHEN pt IS NULL THEN 0.0
        |                  WHEN bkt - pt > 7200 THEN 0.0
        |                  WHEN v >= pv THEN v - pv
        |                  ELSE 0.0 END) AS result
        |  FROM ord GROUP BY 1, 2)
        |SELECT 'electricity_meter_energy_sampled;' || CAST(user_id AS VARCHAR) AS series_id,
        |       (bkt - 3000) - ((bkt - 3000) % 3600) + 3540 AS time_sec,
        |       round(result, 6) AS value
        |FROM res WHERE result <> 0.0 AND result <= 100.0""".stripMargin,

    // portable 60-bit md5 SimHash replicated bit-for-bit; the oracle uses
    // all-pairs Hamming (fine at oracle scale) — equal to the blocked
    // result because 4-chunk pigeonhole blocking has perfect recall ≤ 3
    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
        |           FROM documents),
        |th AS (SELECT doc_id,
        |         CAST(concat('0x', substr(md5(unnest(toks)), 1, 15)) AS BIGINT) AS h
        |       FROM t WHERE len(toks) > 0),
        |votes AS (
        |  SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
        |  FROM th CROSS JOIN (SELECT unnest(range(60)) AS b) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id, sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sh
        |  FROM votes GROUP BY 1)
        |SELECT a.doc_id id_a, b.doc_id id_b, CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,

    // hyperplane-LSH signatures from the portable plane generator
    // comp(p,i) = (((x·x)%1000003)·2654435761%1000000)/1e6−0.5, x=p·65537+i+1
    "sim_lsh_topk" ->
      """WITH el AS (
        |  SELECT vec_id, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT vec_id, p,
        |         sum(CAST(e AS DOUBLE) *
        |             (CAST((((p*65537 + i + 1)*(p*65537 + i + 1)) % 1000003)
        |                   * 2654435761 % 1000000 AS DOUBLE) / 1000000.0 - 0.5)) AS dot
        |  FROM el CROSS JOIN (SELECT unnest(range(6)) AS p) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT vec_id, sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
        |  FROM dots GROUP BY 1),
        |cand AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid
        |  FROM sigs q JOIN sigs c ON q.sig = c.sig AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5),
        |z AS (SELECT qid, vid, CAST(unnest(qe.embedding) AS DOUBLE) a,
        |        CAST(unnest(ce.embedding) AS DOUBLE) b
        |      FROM cand JOIN embeddings qe ON qe.vec_id = cand.qid
        |                JOIN embeddings ce ON ce.vec_id = cand.vid),
        |s AS (SELECT qid, vid, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT qid, vid, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vid) rnk FROM sc)
        |SELECT qid AS query_id, vid AS vec_id, score, CAST(rnk AS INTEGER) AS rank FROM r WHERE rnk <= 10""".stripMargin,

    "sim_lsh_pairs" ->
      """WITH el AS (
        |  SELECT vec_id, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT vec_id, p,
        |         sum(CAST(e AS DOUBLE) *
        |             (CAST((((p*65537 + i + 1)*(p*65537 + i + 1)) % 1000003)
        |                   * 2654435761 % 1000000 AS DOUBLE) / 1000000.0 - 0.5)) AS dot
        |  FROM el CROSS JOIN (SELECT unnest(range(6)) AS p) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT vec_id, sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
        |  FROM dots GROUP BY 1),
        |pairs AS (
        |  SELECT a.vec_id id_a, b.vec_id id_b
        |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id),
        |z AS (SELECT id_a, id_b, CAST(unnest(ae.embedding) AS DOUBLE) a,
        |        CAST(unnest(be.embedding) AS DOUBLE) b
        |      FROM pairs JOIN embeddings ae ON ae.vec_id = pairs.id_a
        |                 JOIN embeddings be ON be.vec_id = pairs.id_b),
        |s AS (SELECT id_a, id_b, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s)
        |SELECT id_a, id_b, score FROM sc WHERE score >= 0.4""".stripMargin,

    // same plane generator + blocked cosine as sim_lsh_pairs, then the
    // recursive-CTE closure from dedup_clusters: component label =
    // min id, kept = (label == own id), singletons kept by the left join
    "sim_semantic_dedup" ->
      """WITH RECURSIVE el AS (
        |  SELECT vec_id, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT vec_id, p,
        |         sum(CAST(e AS DOUBLE) *
        |             (CAST((((p*65537 + i + 1)*(p*65537 + i + 1)) % 1000003)
        |                   * 2654435761 % 1000000 AS DOUBLE) / 1000000.0 - 0.5)) AS dot
        |  FROM el CROSS JOIN (SELECT unnest(range(6)) AS p) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT vec_id, sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS sig
        |  FROM dots GROUP BY 1),
        |cand AS (
        |  SELECT a.vec_id id_a, b.vec_id id_b
        |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id),
        |z AS (SELECT id_a, id_b, CAST(unnest(ae.embedding) AS DOUBLE) a,
        |        CAST(unnest(be.embedding) AS DOUBLE) b
        |      FROM cand JOIN embeddings ae ON ae.vec_id = cand.id_a
        |                JOIN embeddings be ON be.vec_id = cand.id_b),
        |sm AS (SELECT id_a, id_b, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2),
        |pr AS (SELECT id_a, id_b FROM sm
        |       WHERE round(CASE WHEN na > 0 AND nb > 0
        |             THEN dot / (na * nb) ELSE 0 END, 6) >= 0.4),
        |e AS (SELECT id_a s, id_b d FROM pr UNION SELECT id_b, id_a FROM pr),
        |walk(s, d) AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT w.s, e.d FROM walk w JOIN e ON w.d = e.s),
        |lab AS (SELECT s AS id, least(s, min(d)) AS cluster FROM walk GROUP BY s)
        |SELECT v.vec_id, coalesce(l.cluster, v.vec_id) AS cluster,
        |  coalesce(l.cluster, v.vec_id) = v.vec_id AS kept
        |FROM embeddings v LEFT JOIN lab l ON l.id = v.vec_id""".stripMargin,

    // the write→read JSONL round trip must reproduce the source table
    // plus the portable md5 shard assignment
    "export_jsonl" ->
      """SELECT doc_id, text, lang, source, n_chars,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 8 AS shard
        |FROM documents""".stripMargin,

    // BM25 with the exact parenthesization of Retrieval.bm25TopK; the
    // per-term contribution is quantized to integer micro-points BEFORE
    // the per-doc sum so the aggregation is order-independent
    "text_bm25" -> Bm25OracleSql,

    // BM25 CTEs verbatim from Bm25OracleSql (unlimited, ranked then cut
    // at the pool — ≡ limit-then-rank), cosine CTEs from
    // sim_cosine_topk with the single query vec 0; RRF contributions
    // are exact integer floor(1e6/(60+rank))
    "text_rrf_hybrid" ->
      """WITH toks AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks
        |       WHERE term IN ('table', 'hash', 'merge', 'scan')
        |       GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT count(*) AS n_docs,
        |    sum(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)) AS total_dl
        |  FROM documents),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(
        |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) *
        |        (CAST(tf AS DOUBLE) * 2.2) /
        |        (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total_dl AS DOUBLE) / n_docs)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS contrib_q6
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
        |bm AS (SELECT doc_id, CAST(sum(contrib_q6) AS BIGINT) AS score_q6
        |       FROM contrib GROUP BY doc_id),
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY score_q6 DESC, doc_id) r FROM bm),
        |q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0),
        |pr AS (SELECT e.vec_id, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |z AS (SELECT vec_id, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |sd AS (SELECT vec_id, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1),
        |sc AS (SELECT vec_id, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM sd),
        |sem AS (SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY score DESC, vec_id) r FROM sc),
        |u AS (SELECT doc_id, CAST(floor(1000000.0 / (60 + r)) AS BIGINT) c
        |      FROM lex WHERE r <= 30
        |      UNION ALL
        |      SELECT doc_id, CAST(floor(1000000.0 / (60 + r)) AS BIGINT) c
        |      FROM sem WHERE r <= 30)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_q6, count(*) AS n_lists
        |FROM u GROUP BY 1 ORDER BY rrf_q6 DESC, doc_id LIMIT 20""".stripMargin,

    // bloom prefilter is exactness-preserving: the oracle is the plain
    // distinct-3-gram overlap between corpus and benchmark halves
    // (decon_overlap's shape at n = 3)
    "decon_bloom" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(len(toks) - 2),
        |      i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS gram
        |  FROM t),
        |k AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS k FROM g),
        |b AS (SELECT DISTINCT k FROM k WHERE doc_id % 10 = 0),
        |c AS (SELECT doc_id, k FROM k WHERE doc_id % 10 <> 0)
        |SELECT c.doc_id, count(*) AS hits
        |FROM c JOIN b USING (k) GROUP BY 1""".stripMargin,

    // global rank under the seeded portable uniform, 0-based
    "samp_shuffle" ->
      """SELECT row_number() OVER (
        |    ORDER BY CAST(concat('0x', substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0, doc_id) - 1 AS position,
        |  doc_id, source
        |FROM documents""".stripMargin,

    // per-column profile; numeric min/max in integer micro-units
    "prof_columns" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM events)
        |SELECT 'event_id' AS "column", n_rows, n_rows - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct,
        |  CAST(floor(min(event_id) * 1000000.0 + 0.5) AS BIGINT) AS min_q6,
        |  CAST(floor(max(event_id) * 1000000.0 + 0.5) AS BIGINT) AS max_q6,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM events, n GROUP BY n_rows
        |UNION ALL
        |SELECT 'user_id', n_rows, n_rows - count(user_id),
        |  count(DISTINCT user_id),
        |  CAST(floor(min(user_id) * 1000000.0 + 0.5) AS BIGINT),
        |  CAST(floor(max(user_id) * 1000000.0 + 0.5) AS BIGINT), NULL, NULL
        |FROM events, n GROUP BY n_rows
        |UNION ALL
        |SELECT 'event_type', n_rows, n_rows - count(event_type),
        |  count(DISTINCT event_type), NULL, NULL,
        |  min(event_type), max(event_type)
        |FROM events, n GROUP BY n_rows
        |UNION ALL
        |SELECT 'value', n_rows, n_rows - count(value),
        |  count(DISTINCT value),
        |  CAST(floor(min(value) * 1000000.0 + 0.5) AS BIGINT),
        |  CAST(floor(max(value) * 1000000.0 + 0.5) AS BIGINT), NULL, NULL
        |FROM events, n GROUP BY n_rows
        |UNION ALL
        |SELECT 'props', n_rows, n_rows - count(props),
        |  count(DISTINCT props), NULL, NULL, min(props), max(props)
        |FROM events, n GROUP BY n_rows""".stripMargin,

    // the identical bracketed-replace chain, generated from the same
    // merge table the Spark binding uses
    "text_bpe_apply" -> {
      val chain = BpeDemoMerges.foldLeft(
        """regexp_replace(word, '(.)', '(\1)', 'g')""") {
        case (acc, (l, r)) => s"replace($acc, '($l)($r)', '($l$r)')"
      }
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks
         |  FROM documents),
         |w AS (SELECT doc_id, unnest(toks) AS word,
         |    generate_subscripts(toks, 1) AS wi FROM t),
         |p AS (SELECT doc_id, wi,
         |    regexp_extract_all($chain, '\\(([a-z0-9]+)\\)', 1) AS pieces FROM w)
         |SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
         |  md5(string_agg(array_to_string(pieces, chr(1)), chr(1) ORDER BY wi))
         |    AS piece_md5
         |FROM p GROUP BY doc_id""".stripMargin
    },

    "pipe_blocklist" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |  t -> t IN ('merge', 'spill'))) = 0""".stripMargin,

    "text_nfc" ->
      """SELECT doc_id,
        |  md5(nfc_normalize(text || ' cafe' || chr(769) || ' ma' || chr(241) ||
        |    'ana na' || chr(771) || 'ive')) AS nfc_md5,
        |  CAST(length(nfc_normalize(text || ' cafe' || chr(769) || ' ma' || chr(241) ||
        |    'ana na' || chr(771) || 'ive')) AS BIGINT) AS len_nfc
        |FROM documents""".stripMargin,

    // the text_quality score formula feeding exact micro-unit bucket
    // edges: bucket i = [floor(i/10·1e6), floor((i+1)/10·1e6)) on
    // floor(score·1e6)
    "prof_histogram" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents),
        |c AS (SELECT doc_id, text, toks,
        |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS wl,
        |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN (
        |    'the','a','of','and','to','in','is','that','it','for',
        |    'der','die','das','und','ist','nicht','ein','mit','von','zu',
        |    'le','la','les','et','est','une','pour','dans','que','des',
        |    'el','los','y','es','una','por','con','para','del'))) AS DOUBLE) / len(toks)
        |    ELSE 0 END AS sw,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS pr,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE 0 END AS dr
        |  FROM t),
        |s AS (SELECT doc_id, CAST(floor((round(
        |  len_score * 0.3 + (CASE WHEN wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |  least(sw * 5.0, 1.0) * 0.2 + (1.0 - least(pr * 5.0, 1.0)) * 0.15 +
        |  (1.0 - least(dr * 5.0, 1.0)) * 0.15, 6)) * 1000000.0) AS BIGINT) AS q
        |  FROM c),
        |b AS (SELECT doc_id,
        |    CASE WHEN q < 0 THEN -1
        |         WHEN q >= 1000000 THEN 10
        |         ELSE CAST(q // 100000 AS BIGINT) END AS bucket
        |  FROM s)
        |SELECT bucket, count(*) AS n FROM b GROUP BY bucket""".stripMargin,

    // status by id-membership and normalized-text fingerprint equality
    "dedup_corpus_diff" ->
      """WITH p AS (SELECT doc_id,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |    md5(regexp_replace(trim(lower(
        |      CASE WHEN doc_id % 7 = 2 THEN text || ' edited' ELSE text END)),
        |      '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE doc_id % 7 <> 1)
        |SELECT coalesce(p.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN p.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN p.fp = n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM p FULL OUTER JOIN n ON p.doc_id = n.doc_id""".stripMargin,

    "samp_token_budget" ->
      """WITH tot AS (SELECT source,
        |    sum(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)) AS total
        |  FROM documents GROUP BY source),
        |r AS (SELECT d.doc_id, d.source,
        |    CASE d.source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 5000
        |                  WHEN 'src2' THEN 100 ELSE NULL END AS b,
        |    total FROM documents d JOIN tot USING (source)),
        |k AS (SELECT doc_id, source,
        |    CASE WHEN b IS NULL OR b >= total THEN 1.0
        |         ELSE CAST(b AS DOUBLE) / total END AS keep_rate
        |  FROM r)
        |SELECT doc_id, source, round(keep_rate, 6) AS keep_rate FROM k
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < keep_rate""".stripMargin,

    // identical to text_bm25 — the persisted-index path must reproduce
    // the direct computation bit-for-bit
    "text_bm25_indexed" -> Bm25OracleSql,

    // post-erase BM25 ≡ a fresh build over the survivors: postings
    // purged AND the stats row corrected (n_docs, total_dl shrink by
    // exactly the erased docs' contributions)
    "text_bm25_erased" -> bm25OracleSql("doc_id % 9 <> 4"),
    // streamed build+append+fold must reproduce the direct path over
    // the whole corpus exactly (exactly-once postings AND stats)
    "text_bm25_streamed" -> Bm25OracleSql,
    // a pinned read answers against the pinned corpus only (evens +
    // phase A); phase B and the fold are invisible to the pin
    "text_bm25_asof" -> bm25OracleSql("doc_id % 2 = 0 OR doc_id % 4 = 1"),

    "text_vocab_coverage" ->
      """WITH c AS (
        |  SELECT t AS token, count(*) AS n FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |    FROM documents) GROUP BY t),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank,
        |    sum(n) OVER (ORDER BY n DESC, token
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c),
        |tot AS (SELECT sum(n) AS total FROM c),
        |sz AS (SELECT unnest([10, 50, 100, 500]) AS size)
        |SELECT CAST(size AS BIGINT) AS size,
        |  CAST(floor(CAST((SELECT max(cum) FROM r WHERE rank <= size) AS DOUBLE)
        |    / total * 1000000.0 + 0.5) AS BIGINT) AS coverage_q6
        |FROM sz, tot""".stripMargin,

    // two GD iterations unrolled: w0=0 → p=σ(0) exactly 500000 micro-
    // units; every gradient/score is a long sum of quantized residuals/
    // weights, so only σ's exp() can wobble (absorbed by quantization)
    "pipe_quality_lr" ->
      """WITH f AS (
        |  SELECT DISTINCT doc_id, CAST(lang = 'en' AS BIGINT) AS label,
        |    CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 64 AS d
        |  FROM (SELECT doc_id, lang,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |        FROM documents)),
        |n AS (SELECT count(*) AS n FROM documents),
        |r1 AS (SELECT doc_id, label * 1000000 - 500000 AS r_q6
        |  FROM (SELECT DISTINCT doc_id, label FROM f)),
        |g1 AS (SELECT d, sum(r_q6) AS g FROM f JOIN r1 USING (doc_id) GROUP BY d),
        |w1 AS (SELECT d, CAST(floor(0.5 * g / n + 0.5) AS BIGINT) AS w FROM g1, n),
        |z2 AS (SELECT doc_id, label, sum(coalesce(w, 0)) AS z
        |  FROM f LEFT JOIN w1 USING (d) GROUP BY doc_id, label),
        |r2 AS (SELECT doc_id, CAST(label * 1000000 -
        |    floor(1000000.0 / (1.0 + exp(-CAST(z AS DOUBLE) / 1000000.0)) + 0.5)
        |  AS BIGINT) AS r_q6 FROM z2),
        |g2 AS (SELECT d, sum(r_q6) AS g FROM f JOIN r2 USING (doc_id) GROUP BY d),
        |w2 AS (SELECT g2.d,
        |    coalesce(w1.w, 0) + CAST(floor(0.5 * g2.g / n + 0.5) AS BIGINT) AS w
        |  FROM g2 CROSS JOIN n LEFT JOIN w1 ON g2.d = w1.d)
        |SELECT doc_id, label, CAST(sum(coalesce(w, 0)) AS BIGINT) AS score_q6
        |FROM f LEFT JOIN w2 USING (d) GROUP BY doc_id, label""".stripMargin,

    "samp_exact_k" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(concat('0x', substr(md5('eval1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS u
        |  FROM documents ORDER BY u, doc_id LIMIT 150)""".stripMargin,

    // centroids from the exact micro-unit sums; cosine rounded to 6 dp
    // before the argmax (the 1-ulp sum-order wobble is absorbed exactly
    // as in the cosine-pair oracles), ties broken by label
    "sim_assign" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    unnest(embedding) AS x FROM embeddings),
        |s AS (SELECT label, dim,
        |    sum(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS qsum
        |  FROM e GROUP BY label, dim),
        |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
        |c AS (SELECT label, dim, qsum / 1000000.0 / n AS cx
        |  FROM s JOIN n USING (label)),
        |v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS vx FROM embeddings),
        |d AS (SELECT v.vec_id, c.label, sum(v.vx * c.cx) AS dot,
        |    sqrt(sum(v.vx * v.vx)) AS nv, sqrt(sum(c.cx * c.cx)) AS ncn
        |  FROM v JOIN c USING (dim) GROUP BY v.vec_id, c.label),
        |sc AS (SELECT vec_id, label, round(CASE WHEN nv > 0 AND ncn > 0
        |    THEN dot / (nv * ncn) ELSE 0 END, 6) AS sim FROM d),
        |r AS (SELECT vec_id, label, sim, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, label) AS rk FROM sc)
        |SELECT vec_id, label AS centroid_id, sim FROM r WHERE rk = 1""".stripMargin,

    // the LSH oracle's plane generator, summed as quantized micro-terms
    "sim_project" ->
      """WITH el AS (
        |  SELECT vec_id, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
        |  FROM embeddings)
        |SELECT vec_id, p,
        |  CAST(sum(CAST(floor(CAST(e AS DOUBLE) *
        |    (CAST((((p*65537 + i + 1)*(p*65537 + i + 1)) % 1000003)
        |          * 2654435761 % 1000000 AS DOUBLE) / 1000000.0 - 0.5)
        |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS y_q6
        |FROM el CROSS JOIN (SELECT unnest(range(8)) AS p)
        |GROUP BY 1, 2""".stripMargin,

    // element-wise micro-unit sums per label — exact long arithmetic
    "sim_centroids" ->
      """WITH e AS (SELECT label,
        |    generate_subscripts(embedding, 1) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |s AS (SELECT label, CAST(dim AS BIGINT) AS dim,
        |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS qsum
        |  FROM e GROUP BY label, dim),
        |n AS (SELECT label, count(embedding) AS n FROM embeddings GROUP BY label)
        |SELECT label, n, dim, qsum FROM s JOIN n USING (label)""".stripMargin,

    // the Lloyd trainer replayed step by step: md5 seed order → assign
    // (6-dp cosine argmax, ties on list id) → micro-unit mean → assign
    // → mean; centroids exploded to nano-unit rows
    "sim_kmeans_train" ->
      """WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |seeds AS (SELECT vec_id FROM (
        |    SELECT vec_id, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) / 4294967296.0 AS u
        |    FROM embeddings ORDER BY u, vec_id LIMIT 4)),
        |c0 AS (SELECT v.vec_id AS list_id, dim, x AS cx FROM v JOIN seeds USING (vec_id)),
        |d1 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.cx) AS dot,
        |    sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.cx * c.cx)) AS ncn
        |  FROM v JOIN c0 c USING (dim) GROUP BY v.vec_id, c.list_id),
        |a1 AS (SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY round(CASE WHEN nv > 0 AND ncn > 0
        |        THEN dot / (nv * ncn) ELSE 0 END, 6) DESC, list_id) AS rk
        |    FROM d1) WHERE rk = 1),
        |c1 AS (SELECT a.list_id, v.dim,
        |    sum(CAST(floor(v.x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 / count(*) AS cx
        |  FROM v JOIN a1 a USING (vec_id) GROUP BY a.list_id, v.dim),
        |d2 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.cx) AS dot,
        |    sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.cx * c.cx)) AS ncn
        |  FROM v JOIN c1 c USING (dim) GROUP BY v.vec_id, c.list_id),
        |a2 AS (SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY round(CASE WHEN nv > 0 AND ncn > 0
        |        THEN dot / (nv * ncn) ELSE 0 END, 6) DESC, list_id) AS rk
        |    FROM d2) WHERE rk = 1)
        |SELECT a.list_id, CAST(v.dim AS BIGINT) AS dim,
        |  CAST(floor(sum(CAST(floor(v.x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0
        |    / count(*) * 1000000000.0 + 0.5) AS BIGINT) AS c_q9
        |FROM v JOIN a2 a USING (vec_id) GROUP BY a.list_id, v.dim""".stripMargin,

    // sim_cosine_topk with the anchor-label exclusion: nearest
    // DIFFERENT-label vectors per anchor
    "sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id qid, embedding qv, label ql FROM embeddings WHERE vec_id < 5),
        |pr AS (SELECT q.qid, e.vec_id, e.label nl, q.qv, e.embedding cv
        |       FROM embeddings e CROSS JOIN q WHERE e.label <> q.ql),
        |z AS (SELECT qid, vec_id, nl, CAST(unnest(qv) AS DOUBLE) a,
        |        CAST(unnest(cv) AS DOUBLE) b FROM pr),
        |s AS (SELECT qid, vec_id, nl, sum(a * b) dot, sqrt(sum(a * a)) na,
        |        sqrt(sum(b * b)) nb FROM z GROUP BY 1, 2, 3),
        |sc AS (SELECT qid, vec_id, nl, round(CASE WHEN na > 0 AND nb > 0
        |        THEN dot / (na * nb) ELSE 0 END, 6) score FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vec_id) rnk FROM sc)
        |SELECT qid AS query_id, vec_id, nl AS neg_label, score,
        |  CAST(rnk AS INTEGER) AS rank FROM r WHERE rnk <= 10""".stripMargin,

    // PSI drift, even vs odd doc_id snapshots: the bucket rule is the
    // histogram's integer-edge rule, which at these edges reduces to
    // exact integer division; terms quantized to 1e-4 nats BEFORE any
    // sum (the text_lm_score contract for cross-engine ln)
    "prof_psi_drift" ->
      """WITH b AS (SELECT doc_id, CASE WHEN n_chars < 0 THEN -1
        |    WHEN n_chars >= 2000 THEN 20
        |    ELSE CAST(n_chars // 100 AS BIGINT) END AS bucket FROM documents),
        |hr AS (SELECT bucket, count(*) AS n_ref FROM b WHERE doc_id % 2 = 0 GROUP BY bucket),
        |hc AS (SELECT bucket, count(*) AS n_cur FROM b WHERE doc_id % 2 = 1 GROUP BY bucket),
        |j AS (SELECT coalesce(hr.bucket, hc.bucket) AS bucket,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket),
        |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
        |SELECT bucket, n_ref, n_cur,
        |  CAST(floor((greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
        |      - greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6))
        |    * ln(greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
        |      / greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6))
        |    * 10000.0 + 0.5) AS BIGINT) AS term_q4
        |FROM j CROSS JOIN t""".stripMargin,

    // the Misra-Gries + recount plan publishes EXACT counts — its oracle
    // is the naive GROUP BY/HAVING with the identical integer threshold
    "prof_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    || '_' || CAST(doc_id % 7 AS VARCHAR) AS key FROM documents),
        |t AS (SELECT count(*) AS total FROM tok)
        |SELECT key, count(*) AS n FROM tok CROSS JOIN t
        |GROUP BY key, total HAVING count(*) > total * 5000 // 1000000""".stripMargin,

    // deterministic (n desc, key asc) tie-break makes the top-10 cut
    // engine-independent
    "prof_top_devices" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY n DESC, key LIMIT 10""".stripMargin,

    // sealed 6 h windows (window end <= max event time − 2 h; whole-
    // second window ends vs sub-second event times make the floored-
    // seconds cutoff exact), the same integer-edge cents buckets
    // (edges i·2500 exact in micro-units), and the same
    // quantize-before-sum PSI term arithmetic as the engine
    "prof_streaming_psi" ->
      """WITH pts AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |wm AS (SELECT max(tsec) - 7200 AS w FROM pts),
        |cur AS (SELECT CAST(floor(tsec / 21600) * 21600 AS BIGINT) AS ws,
        |    CASE WHEN c < 0 THEN -1 WHEN c >= 50000 THEN 20
        |         ELSE c // 2500 END AS bucket,
        |    count(*) AS n_cur
        |  FROM pts CROSS JOIN wm
        |  WHERE floor(tsec / 21600) * 21600 + 21600 <= w GROUP BY 1, 2),
        |ref AS (SELECT CASE WHEN c < 0 THEN -1 WHEN c >= 50000 THEN 20
        |         ELSE c // 2500 END AS bucket, count(*) AS n_ref
        |  FROM pts GROUP BY 1),
        |grid AS (SELECT ws, bucket, n_ref
        |  FROM (SELECT DISTINCT ws FROM cur) CROSS JOIN ref),
        |j AS (SELECT coalesce(g.ws, c.ws) AS ws,
        |    coalesce(g.bucket, c.bucket) AS bucket,
        |    coalesce(g.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
        |  FROM grid g FULL OUTER JOIN cur c
        |    ON g.ws = c.ws AND g.bucket = c.bucket),
        |t AS (SELECT ws, sum(n_ref) AS tr, sum(n_cur) AS tc FROM j GROUP BY ws)
        |SELECT j.ws AS window_start,
        |  CAST(sum(CAST(floor((greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
        |        - greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6))
        |      * ln(greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
        |        / greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6))
        |      * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS psi_q4
        |FROM j JOIN t ON j.ws = t.ws GROUP BY 1""".stripMargin,

    // same sealed windows; row_number with the engine's (n desc, key
    // asc) tie-break makes each window's top-5 cut engine-independent
    "prof_streaming_topk" ->
      """WITH pts AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(user_id AS VARCHAR) AS key FROM events),
        |wm AS (SELECT max(tsec) - 7200 AS w FROM pts),
        |cnt AS (SELECT CAST(floor(tsec / 21600) * 21600 AS BIGINT) AS ws,
        |    key, count(*) AS n
        |  FROM pts CROSS JOIN wm
        |  WHERE floor(tsec / 21600) * 21600 + 21600 <= w GROUP BY 1, 2),
        |r AS (SELECT ws, key, n,
        |    row_number() OVER (PARTITION BY ws ORDER BY n DESC, key) AS rank
        |  FROM cnt)
        |SELECT ws AS window_start, rank, key, n FROM r
        |WHERE rank <= 5""".stripMargin,

    // backfill must rebuild every window date AND replace the planted
    // poison — a hash match against the clean recompute proves both
    "s9_backfill" ->
      s"""WITH ${ptsCte("sensor_")},
         |f AS (SELECT * FROM pts WHERE m = 'sensor_click'
         |  AND CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-14'),
         |agg AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(tsec / 60) * 60 AS BIGINT) b, avg(v) v
         |       FROM f GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT m AS measurement, dev_id, dev_type, dir,
         |       loc AS location_id, b AS time, round(v, 6) AS value
         |FROM agg""".stripMargin,

    // the audit must count exactly the planted defects: 10 ghost keys on
    // the 10th, a whole-partition value shift on the 11th, and an
    // all-zero clean bill for the 12th; expected row counts per date are
    // recomputed from the events (number of 1-min rollup groups)
    "s9_rollup_verify" ->
      s"""WITH ${ptsCte("sensor_")},
         |f AS (SELECT * FROM pts WHERE m = 'sensor_click'),
         |exp AS (SELECT CAST(CAST(make_timestamp(b * 1000000) AS DATE) AS VARCHAR) AS d,
         |    count(*) AS n
         |  FROM (SELECT DISTINCT dev_id, dev_type, dir, loc,
         |      CAST(floor(tsec / 60) * 60 AS BIGINT) AS b FROM f)
         |  GROUP BY 1)
         |SELECT 'gen_day' AS tier, 'sensor_click' AS measurement, d AS date,
         |  CAST(n AS BIGINT) AS n_expected,
         |  CAST(n + CASE WHEN d = '2024-01-10' THEN 10 ELSE 0 END AS BIGINT) AS n_actual,
         |  CAST(0 AS BIGINT) AS n_missing,
         |  CAST(CASE WHEN d = '2024-01-10' THEN 10 ELSE 0 END AS BIGINT) AS n_extra,
         |  CAST(CASE WHEN d = '2024-01-11' THEN n ELSE 0 END AS BIGINT) AS n_value_mismatch
         |FROM exp WHERE d BETWEEN '2024-01-10' AND '2024-01-12'""".stripMargin,

    // the diff between the pins is exactly {added: batch B, removed:
    // device 7's batch-A rows} — anything else (a lost append, a
    // resurrected erased row, a maintenance row leaking into the diff)
    // breaks the hash
    // the registered CQ's 5-min averages from the raw week — a hash
    // match proves the custom hop ran at its own resolution through the
    // standard maintenance pass
    "s9_custom_cq" ->
      s"""WITH ${ptsCte("sensor_")},
         |f AS (SELECT * FROM pts WHERE m = 'sensor_click'
         |  AND CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-14'),
         |agg AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(tsec / 300) * 300 AS BIGINT) b, avg(v) v
         |       FROM f GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT m AS measurement, dev_id, dev_type, dir,
         |       loc AS location_id, b AS time, round(v, 6) AS value
         |FROM agg""".stripMargin,

    "s9_asof_diff" ->
      s"""WITH ${ptsCte("app_")},
         |f AS (SELECT * FROM pts WHERE m = 'app_click'
         |  AND CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-14')
         |SELECT 'added' AS change, dev_id, tsec AS time, round(v, 6) AS value
         |FROM f WHERE dir = 'export'
         |UNION ALL
         |SELECT 'removed' AS change, dev_id, tsec AS time, round(v, 6) AS value
         |FROM f WHERE dir = 'import' AND dev_id = '7'""".stripMargin,

    // the complement filter: a hash match proves the erasure removed the
    // device's rows everywhere and touched nothing else
    "s9_delete_where" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT tsec, round(v, 6) AS value, dev_id
         |FROM pts WHERE m = 'app_click' AND dev_id <> '7'""".stripMargin,

    // the curve rewrite must be a pure reorder: same rows, both
    // predicate shapes intact
    "s9_zorder_read" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT tsec, round(v, 6) AS value, dev_id
         |FROM pts WHERE m = 'app_click'
         |  AND CAST(hour(ts) AS BIGINT) BETWEEN 9 AND 17""".stripMargin,

    // the oracle sees ONLY the original events: a hash match proves the
    // as-of read excluded every post-pin append and lost nothing
    "s9_time_travel" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT tsec, round(v, 6) AS value, dev_id
         |FROM pts WHERE m = 'app_click'""".stripMargin,

    // the pin resolves exactly the FIRST plain batch (dir = 'import'),
    // whatever the data files' scrambled mtimes claim
    "s10_pin_scramble" ->
      s"""WITH ${ptsCte("sensor_")}
         |SELECT tsec, round(v, 6) AS value, dev_id
         |FROM pts WHERE m = 'sensor_click' AND dir = 'import'""".stripMargin,

    // same aggregation as the a4/a5 family: hourly mean over the
    // relative window, no fill spine (fillType none)
    "s10_cmd_codec" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT CAST(floor(tsec / 3600) * 3600 AS BIGINT) AS time,
         |  round(avg(v), 6) AS value
         |FROM pts WHERE m = 'app_click' AND tsec > 1703721600 GROUP BY 1""".stripMargin,

    // clone groups are cliques, so min-id closure needs no recursion:
    // every planted doc keys by its group's minimum id (its own id when
    // singleton), then the cumulative-range rule of samp_split applies
    "samp_cluster_split" ->
      """WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
        |p AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + (SELECT o FROM off), text
        |  FROM documents WHERE doc_id % 5 = 0),
        |fp AS (SELECT doc_id, md5(text) AS f FROM p),
        |rep AS (SELECT f, min(doc_id) AS rep FROM fp GROUP BY f),
        |u AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(CAST(rep AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS uu
        |  FROM fp JOIN rep USING (f))
        |SELECT doc_id,
        |  CASE WHEN uu < 0.9 THEN 'train'
        |       WHEN uu < 0.95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM u""".stripMargin,

    // the naive split's contamination, counted per unordered split pair
    "samp_split_leakage" ->
      """WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
        |p AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + (SELECT o FROM off), text
        |  FROM documents WHERE doc_id % 5 = 0),
        |fp AS (SELECT doc_id, md5(text) AS f FROM p),
        |rep AS (SELECT f, min(doc_id) AS rep FROM fp GROUP BY f),
        |pr AS (SELECT rep AS id_a, doc_id AS id_b
        |  FROM fp JOIN rep USING (f) WHERE doc_id <> rep),
        |sp AS (SELECT doc_id,
        |    CASE WHEN uu < 0.9 THEN 'train'
        |         WHEN uu < 0.95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        / 4294967296.0 AS uu FROM p))
        |SELECT least(sa.split, sb.split) AS split_a,
        |  greatest(sa.split, sb.split) AS split_b, count(*) AS n_pairs
        |FROM pr JOIN sp sa ON pr.id_a = sa.doc_id
        |        JOIN sp sb ON pr.id_b = sb.doc_id
        |GROUP BY 1, 2""".stripMargin,

    // computed from the ORIGINAL events — equality proves the clustered
    // rewrite is lossless for the point-device read path
    "s9_clustered_read" ->
      s"""WITH ${ptsCte("app_")}
         |SELECT tsec, round(v, 6) AS value, dev_id
         |FROM pts WHERE m = 'app_click' AND dev_id = '7'""".stripMargin,

    // the same doctored line structure, then the C4 line+doc rules
    "pipe_c4_rules" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    substr(text, 1, 80) || '.' || chr(10) ||
        |    'tiny line' || chr(10) ||
        |    substr(text, 81, 80) ||
        |      (CASE WHEN doc_id % 2 = 0 THEN '!' ELSE '' END) || chr(10) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum boilerplate here.'
        |          ELSE 'a normal closing sentence appears here.' END) || chr(10) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN 'function() { return 1; }'
        |          ELSE 'the last line ends properly.' END) AS t
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id,
        |    list_filter(string_split(t, chr(10)), l ->
        |      len(string_split_regex(trim(l), '\s+')) >= 3 AND
        |      regexp_matches(trim(l), '[.!?"'']$')) AS ls
        |  FROM dirty
        |  WHERE strpos(t, '{') = 0 AND strpos(lower(t), 'lorem ipsum') = 0)
        |SELECT doc_id, array_to_string(ls, chr(10)) AS clean_text,
        |  CAST(len(ls) AS BIGINT) AS n_lines
        |FROM kept WHERE len(ls) >= 2""".stripMargin,

    // the salted two-phase plan must be hash-EXACT against the flat
    // group-by — integer cents make sum order-independent
    "q_salted_agg" ->
      """SELECT 'app_' || event_type AS measurement,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    // sim_lsh_pairs' 6-plane generator (signature as a 6-bit long) +
    // text_nfc's normalization, both reached through raw SQL strings
    "s7_sql_registry" ->
      """WITH el AS (
        |  SELECT vec_id, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
        |  FROM embeddings),
        |dots AS (
        |  SELECT vec_id, p,
        |         sum(CAST(e AS DOUBLE) *
        |             (CAST((((p*65537 + i + 1)*(p*65537 + i + 1)) % 1000003)
        |                   * 2654435761 % 1000000 AS DOUBLE) / 1000000.0 - 0.5)) AS dot
        |  FROM el CROSS JOIN (SELECT unnest(range(6)) AS p) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS sig
        |  FROM dots GROUP BY 1)
        |SELECT s.vec_id, s.sig, md5(nfc_normalize(d.text)) AS nfc_md5
        |FROM sigs s JOIN documents d ON d.doc_id = s.vec_id""".stripMargin,

    // gen_week = 10-min avg over gen_day's 1-min avg of the routed raw
    // points, restricted to the dates gen_day's 2-week retention keeps
    // (Now = 2024-02-01 → cutoff 2024-01-18); 600 s divides 86400 so no
    // bucket straddles a date partition
    "s9_rollup_maintain" ->
      s"""WITH ${ptsCte("sensor_")},
         |t1 AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(tsec / 60) * 60 AS BIGINT) b, avg(v) v
         |       FROM pts GROUP BY 1, 2, 3, 4, 5, 6),
         |t1k AS (SELECT * FROM t1
         |        WHERE CAST(to_timestamp(b) AS DATE) >= DATE '2024-01-18'),
         |t2 AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(b / 600) * 600 AS BIGINT) b, avg(v) v
         |       FROM t1k GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT m AS measurement, dev_id, dev_type, dir, loc AS location_id,
         |       b AS time, round(v, 6) AS value FROM t2
         |WHERE m = 'sensor_click'""".stripMargin,

    "q_bucketed_join" ->
      """SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
        |  CAST(len(e.embedding) AS BIGINT) AS dims, e.label
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id""".stripMargin,

    // the continuous-rollup emission: 1-min avg windows per series tag
    // set, restricted to windows sealed by the final watermark
    // (window end <= max event second − 1800); window starts label rows
    "a9_streaming_hop" ->
      s"""WITH ${ptsCte("sensor_")},
         |f AS (SELECT * FROM pts WHERE m = 'sensor_click'),
         |agg AS (SELECT m, dev_id, dev_type, dir, loc,
         |         CAST(floor(tsec / 60) * 60 AS BIGINT) b, avg(v) v
         |       FROM f GROUP BY 1, 2, 3, 4, 5, 6),
         |wm AS (SELECT max(tsec) - 1800 AS w FROM f)
         |SELECT m AS measurement, dev_id, dev_type, dir,
         |       loc AS location_id, b AS time, round(v, 6) AS value
         |FROM agg CROSS JOIN wm WHERE b + 60 <= w""".stripMargin,

    // append-mode emission = windows sealed by the final watermark
    // (max event time − 2 h); window ends are whole 30 s multiples and
    // event times carry sub-second parts, so the floored-seconds cutoff
    // is exact
    "a1_windowed_stream" ->
      """WITH pts AS (
        |  SELECT 'sensor_' || event_type AS m,
        |    'sensor_' || event_type || ';' || CAST(user_id AS VARCHAR) AS sid,
        |    CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'mean' WHEN 1 THEN 'min'
        |      WHEN 2 THEN 'max' WHEN 3 THEN 'sum' ELSE 'last' END AS f,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events),
        |agg AS (SELECT sid, m, f, CAST(floor(tsec / 30) * 30 AS BIGINT) b,
        |    avg(c) mv, min(c) mnv, max(c) mxv, sum(c) sv
        |  FROM pts WHERE f IN ('mean', 'min', 'max', 'sum') GROUP BY 1, 2, 3, 4),
        |wm AS (SELECT max(tsec) - 7200 AS w FROM pts)
        |SELECT sid AS series_id, m AS measurement, f AS agg_func,
        |  b + 30 AS time,
        |  round(CASE f WHEN 'mean' THEN mv WHEN 'min' THEN mnv
        |               WHEN 'max' THEN mxv ELSE sv END, 6) AS value
        |FROM agg CROSS JOIN wm WHERE b + 30 <= w""".stripMargin,

    // the engine decodes hand-written BMP bytes through javax.imageio;
    // the oracle recomputes each pixel's grayscale arithmetically from
    // the same doc_id (cell = y*8+x matches the query's pixel formula)
    "mm_image_decode" ->
      """SELECT d.doc_id AS media_id, t.cell,
        |  CAST((d.doc_id * 31 + t.cell * 7) % 256 AS DOUBLE) AS value
        |FROM documents d CROSS JOIN range(0, 64) t(cell)
        |WHERE d.doc_id % 11 = 0""".stripMargin,

    // PCM16 WAV decode: window w's constant amplitude is
    // 1024·2^e / 32768 with e = (doc_id·3 + w·5) mod 5 (0 → silence) —
    // powers of two, so stream and oracle are bit-equal with no rounding
    "mm_audio_decode" ->
      """SELECT d.doc_id AS media_id, t.win,
        |  CASE WHEN (d.doc_id * 3 + t.win * 5) % 5 = 0 THEN 0.0
        |       ELSE CAST(1024 * (1 << CAST((d.doc_id * 3 + t.win * 5) % 5 AS INTEGER))
        |                 AS DOUBLE) / 32768.0 END AS value
        |FROM documents d CROSS JOIN range(0, 16) t(win)
        |WHERE d.doc_id % 13 = 0""".stripMargin,

    // decode → bilinear resize → PNG re-encode → decode of a constant
    // image is the constant itself, for every grid cell
    "mm_resize_roundtrip" ->
      """SELECT d.doc_id AS media_id, t.cell,
        |  CAST((d.doc_id * 19 + 7) % 256 AS DOUBLE) AS value
        |FROM documents d CROSS JOIN range(0, 4) t(cell)
        |WHERE d.doc_id % 17 = 0""".stripMargin,

    // 1 fps sampling of a 3 s 3-frame GIF maps offset k·1000 ms to
    // frame k; each solid frame decodes back to its palette gray
    "mm_gif_frames" ->
      """SELECT d.doc_id AS media_id, t.f AS frame_idx,
        |  CAST((d.doc_id * 29 + t.f * 41) % 256 AS DOUBLE) AS value
        |FROM documents d CROSS JOIN range(0, 3) t(f)
        |WHERE d.doc_id % 23 = 0""".stripMargin)
}
