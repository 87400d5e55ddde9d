package graft.api

import java.time.Instant

import graft.model._
import graft.query.Planner
import graft.store.TierStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Command API — the reference's MQTT admin surface re-expressed as a
 * transport-agnostic dispatcher (reference: src/api/admin.go:59-416;
 * request DTOs src/api/types.go:8-34). MQTT itself is not the
 * capability — the command set is (SURVEY.md §7 step 9).
 */
object Api {

  /** cmd.tsdb.get_data_points DTO (types.go:8-21). */
  final case class GetDataPointsRequest(
      procId: Int = 1, fieldName: String = "", dataFunction: String = "",
      transformFunction: String = "", measurementName: String = "",
      relativeTime: String = "", fromTime: String = "", toTime: String = "",
      groupByTime: String = "", groupByTag: String = "", fillType: String = "",
      filters: DataPointsFilter = DataPointsFilter()) {
    def toRequest: DataPointsRequest = DataPointsRequest(
      measurement = measurementName, fieldName = fieldName,
      dataFunction = dataFunction, transformFunction = transformFunction,
      relativeTime = relativeTime, fromTime = fromTime, toTime = toTime,
      groupByTime = groupByTime, groupByTag = groupByTag, fillType = fillType,
      filters = filters)
  }

  /** cmd.tsdb.write_data_points DTO (types.go:23-34, admin.go:179-204). */
  final case class WritePoint(name: String, tags: Map[String, String],
      fields: Map[String, Double], ts: java.sql.Timestamp)

  final case class Context(spark: SparkSession, store: TierStore,
      profile: String = Tier.ProfileOptimized, now: () => Instant = () => Instant.now(),
      state: ProcessState = new ProcessState(ProcessConfig(id = 1)))

  /**
   * Mutable filter/selector CRUD — the reference's Process API
   * (reference: src/integration/tsdb/api.go:1-62). Reproduces GetNewID
   * semantics (max id + 1, model.go:113-128) including the reference's
   * quirk that a new SELECTOR id is computed from the FILTERS list
   * (api.go:33 `GetNewID(pr.Config.Filters)`).
   */
  final class ProcessState(initial: ProcessConfig) {
    @volatile var config: ProcessConfig = initial
    private def newId(ids: Seq[Int]): Int = (ids :+ 0).max + 1

    def addFilter(f: Filter): Int = synchronized {
      val id = newId(config.filters.map(_.id))
      config = config.copy(filters = config.filters :+ f.copy(id = id))
      id
    }
    def removeFilter(id: Int): Unit = synchronized {
      config = config.copy(filters = config.filters.filterNot(_.id == id))
    }
    def addSelector(s: Selector): Int = synchronized {
      val id = newId(config.filters.map(_.id)) // reference quirk, api.go:33
      config = config.copy(selectors = config.selectors :+ s.copy(id = id))
      id
    }
    def removeSelector(id: Int): Unit = synchronized {
      config = config.copy(selectors = config.selectors.filterNot(_.id == id))
    }
    def filters: Seq[Filter] = config.filters
    def selectors: Seq[Selector] = config.selectors
  }

  /**
   * Dispatch a command by name — the admin.go onCommand switch. Returns a
   * response DataFrame (query commands) or Unit-like empty frame (admin
   * commands). Raw SQL (S7) goes straight to Spark SQL.
   */
  def dispatch(ctx: Context, command: String, payload: Any): DataFrame = command match {
    case "cmd.tsdb.get_data_points" => // admin.go:206-226
      val req = payload.asInstanceOf[GetDataPointsRequest]
      Planner.dataPoints(req.toRequest, t => ctx.store.read(t), ctx.now())
    case "cmd.tsdb.get_energy_data_points" => // admin.go:229-247
      val req = payload.asInstanceOf[GetDataPointsRequest]
      Planner.energyDataPoints(req.relativeTime, req.fromTime, req.toTime,
        req.groupByTime, req.groupByTag, req.filters, t => ctx.store.read(t), ctx.now())
    case "cmd.tsdb.query" => // S7 raw passthrough (admin.go:156-177)
      ctx.spark.sql(payload.asInstanceOf[String])
    case "cmd.tsdb.write_data_points" => // S6 (admin.go:179-204)
      val points = payload.asInstanceOf[Seq[WritePoint]]
      import ctx.spark.implicits._
      val df = points.map(p => (p.name, p.ts,
          p.tags.getOrElse("dev_id", ""), p.tags.getOrElse("dev_type", ""),
          p.tags.getOrElse("dir", null), p.tags.getOrElse("location_id", ""),
          p.tags.getOrElse("service", null), null: String, p.tags.getOrElse("topic", ""),
          p.fields.getOrElse("value", Double.NaN), p.fields.get("unit").map(_.toString).orNull))
        .toDF("measurement", "time", "dev_id", "dev_type", "dir", "location_id",
          "service", "src", "topic", "value", "unit")
      ctx.store.writeRouted(df, ctx.profile)
      ctx.spark.emptyDataFrame
    case "cmd.tsdb.get_measurements" => // S8 (admin.go / influxdb_v1.go:376-394)
      import ctx.spark.implicits._
      Tier.all.flatMap(t => ctx.store.measurements(t).map(m => (t.name, m)))
        .toDF("tier", "measurement")
    case "cmd.tsdb.get_retention_policies" => // S8 (influxdb_v1.go:396-413)
      import ctx.spark.implicits._
      ctx.store.retentionPolicies.map(t => (t.name, t.retention, t.resolution))
        .toDF("name", "retention", "resolution")
    case "cmd.tsdb.add_retention_policy" => // S9 (admin.go:292-311)
      ctx.store.addRetentionPolicy(payload.asInstanceOf[Tier])
      ctx.spark.emptyDataFrame
    case "cmd.tsdb.update_retention_policy" => // S9 (admin.go:313-332)
      ctx.store.updateRetentionPolicy(payload.asInstanceOf[Tier])
      ctx.spark.emptyDataFrame
    case "cmd.tsdb.delete_object" => // S9 (admin.go:334-370): RP or measurement
      payload match {
        case ("retention_policy", name: String) =>
          ctx.store.deleteRetentionPolicy(name)
        case ("measurement", name: String) =>
          ctx.store.retentionPolicies.foreach(t => ctx.store.dropMeasurement(t, name))
        case other => throw new IllegalArgumentException(s"unknown object: $other")
      }
      ctx.spark.emptyDataFrame
    case "cmd.tsdb.get_configs" => { // admin.go:372-378
      import ctx.spark.implicits._
      val c = ctx.state.config
      Seq((c.id, c.name, c.profile, c.batchMaxSize, c.saveIntervalMs,
        c.filters.size, c.selectors.size))
        .toDF("id", "name", "profile", "batch_max_size", "save_interval_ms",
          "n_filters", "n_selectors")
    }
    case "cmd.tsdb.add_filter" => // api.go:4-12
      ctx.state.addFilter(payload.asInstanceOf[Filter]); filtersDf(ctx)
    case "cmd.tsdb.remove_filter" => // api.go:15-25
      ctx.state.removeFilter(payload.asInstanceOf[Int]); filtersDf(ctx)
    case "cmd.tsdb.add_selector" => // api.go:28-37
      ctx.state.addSelector(payload.asInstanceOf[Selector]); selectorsDf(ctx)
    case "cmd.tsdb.remove_selector" => // api.go:40-50
      ctx.state.removeSelector(payload.asInstanceOf[Int]); selectorsDf(ctx)
    case "cmd.tsdb.get_filters" => filtersDf(ctx) // api.go:54-56
    case "cmd.tsdb.get_selectors" => selectorsDf(ctx) // api.go:59-61
    case other =>
      throw new IllegalArgumentException(s"unknown command: $other")
  }

  private def filtersDf(ctx: Context): DataFrame = {
    import ctx.spark.implicits._
    ctx.state.filters.map(f => (f.id, f.name, f.topic, f.domain, f.service,
      f.msgType, f.negation, f.linkedFilterBooleanOperation, f.linkedFilterId,
      f.isAtomic))
      .toDF("id", "name", "topic", "domain", "service", "msg_type", "negation",
        "link_op", "linked_filter_id", "is_atomic")
  }

  private def selectorsDf(ctx: Context): DataFrame = {
    import ctx.spark.implicits._
    ctx.state.selectors.map(s => (s.id, s.topic, s.inMemory))
      .toDF("id", "topic", "in_memory")
  }

  /**
   * Shape a planner result into the reference's response JSON:
   * `{"Results":[{"Series":[{"name","tags","columns","values"}]}]}`
   * (reference response fixtures: docs/api:26-176, docs/data-exchange;
   * one Series per group-by-tag value, columns ["time","value"]).
   *
   * The driver-side collect is BOUNDED: at most `maxRows` rows are pulled
   * (aggregated queries are naturally small; a raw-points query over a
   * large range would otherwise collect everything — the reference shares
   * that flaw, admin.go:206-226, but at Spark scale it would take the
   * driver down). When the result is truncated and time-shaped, the JSON
   * carries a `"next"` epoch marker; pass it back as `afterTimeSec` for
   * the next page. Rows sharing the marker's exact second may be skipped
   * across a page boundary — acceptable for the dashboard use case.
   */
  def shapeResponse(df: DataFrame, measurement: String, groupByTag: String,
      maxRows: Int = 100000, afterTimeSec: Long = Long.MinValue): String = {
    val hasTime = df.columns.contains("time")
    val page =
      if (hasTime) df.filter(col("time") > afterTimeSec).orderBy(col("time")).limit(maxRows + 1)
      else df.limit(maxRows + 1)
    val all = page.collect()
    val truncated = all.length > maxRows
    val rows = if (truncated) all.take(maxRows) else all
    val nextMarker =
      if (truncated && hasTime) s""","next":${rows.last.getAs[Long]("time")}""" else ""
    val series: Seq[(Map[String, String], Array[Row])] =
      if (groupByTag.nonEmpty)
        rows.groupBy(r => Option(r.getAs[Any](groupByTag)).map(_.toString).getOrElse(""))
          .toSeq.sortBy(_._1)
          .map { case (tv, rs) => (Map(groupByTag -> tv), rs) }
      else Seq((Map.empty[String, String], rows))
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val seriesJson = series.map { case (tags, rs) =>
      val tagJson = tags.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      val values = rs.sortBy(r => if (r.schema.fieldNames.contains("time"))
          r.getAs[Long]("time") else 0L)
        .map { r =>
          val t = if (r.schema.fieldNames.contains("time")) r.getAs[Long]("time").toString else "0"
          val v = Option(r.getAs[Any]("value")).map(_.toString).getOrElse("null")
          s"[$t,$v]"
        }.mkString("[", ",", "]")
      s"""{"name":${jstr(measurement)},"tags":$tagJson,"columns":["time","value"],"values":$values}"""
    }.mkString("[", ",", "]")
    s"""{"Results":[{"Series":$seriesJson}]$nextMarker}"""
  }
}
