package graft.api

import graft.model.{DataPointsFilter, Filter, ProcessConfig, Selector, Tier}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Wire codec for the command surface: decodes a FIMP-enveloped command
 * message (`{"type":"cmd.tsdb...","val":{...},"uid":...,"corid":...}`
 * — docs/data-exchange:6-133) into the typed payload
 * [[Api.dispatch]] expects, so a transport (the [[graft.Service]] file
 * socket, stdin, or a future broker hop) can carry the SAME commands
 * the reference receives over MQTT (admin.go:404-416 onCommand)
 * without any Scala on the caller's side.
 *
 * Decoding is explicit field navigation, not reflective extraction:
 * every command's payload shape is pinned here, unknown fields are
 * ignored (wire-compatible with clients that send extra FIMP fields),
 * and a malformed value fails with a message naming the field.
 */
object CommandCodec {

  /** JSON string literal with escaping — for transports composing raw
   *  error payloads outside [[Api.dispatchShaped]]'s envelope. */
  def q(s: String): String = {
    val b = new StringBuilder("\"")
    Option(s).getOrElse("").foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }

  /** A decoded command message. */
  final case class Command(msgType: String, payload: Any, uid: String,
      corid: String, measurement: String, groupByTag: String)

  private def str(v: JValue, d: String = ""): String = v match {
    case JString(s) => s
    case JNull | JNothing => d
    case other => other.values.toString
  }
  private def int(v: JValue, d: Int): Int = v match {
    case JInt(n) => n.toInt
    case JLong(n) => n.toInt
    case JDouble(n) => n.toInt
    case JNull | JNothing => d
    case JString(s) => s.toInt
    case other => throw new IllegalArgumentException(s"not an int: $other")
  }
  private def long(v: JValue, d: Long): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case JDouble(n) => n.toLong
    case JNull | JNothing => d
    case JString(s) => s.toLong
    case other => throw new IllegalArgumentException(s"not a long: $other")
  }
  private def dbl(v: JValue, d: Double): Double = v match {
    case JDouble(n) => n
    case JInt(n) => n.toDouble
    case JLong(n) => n.toDouble
    case JDecimal(n) => n.toDouble
    case JNull | JNothing => d
    case other => throw new IllegalArgumentException(s"not a double: $other")
  }
  private def bool(v: JValue, d: Boolean): Boolean = v match {
    case JBool(b) => b
    case JNull | JNothing => d
    case other => throw new IllegalArgumentException(s"not a bool: $other")
  }
  private def strSeq(v: JValue): Seq[String] = v match {
    case JArray(xs) => xs.map(str(_))
    case JNull | JNothing => Nil
    case other => throw new IllegalArgumentException(s"not a string array: $other")
  }
  private def strMap(v: JValue): Map[String, String] = v match {
    case JObject(fs) => fs.map { case (k, x) => k -> str(x) }.toMap
    case JNull | JNothing => Map.empty
    case other => throw new IllegalArgumentException(s"not an object: $other")
  }
  private def dblMap(v: JValue): Map[String, Double] = v match {
    case JObject(fs) => fs.map { case (k, x) => k -> dbl(x, 0.0) }.toMap
    case JNull | JNothing => Map.empty
    case other => throw new IllegalArgumentException(s"not an object: $other")
  }

  private def filters(v: JValue): DataPointsFilter = DataPointsFilter(
    tags = strMap(v \ "tags"),
    devices = strSeq(v \ "devices"),
    locations = strSeq(v \ "locations"),
    devTypes = strSeq(v \ "devTypes"))

  private def getDataPoints(v: JValue): Api.GetDataPointsRequest =
    Api.GetDataPointsRequest(
      procId = int(v \ "procId", 1),
      fieldName = str(v \ "fieldName"),
      dataFunction = str(v \ "dataFunction"),
      transformFunction = str(v \ "transformFunction"),
      measurementName = str(v \ "measurementName"),
      relativeTime = str(v \ "relativeTime"),
      fromTime = str(v \ "fromTime"),
      toTime = str(v \ "toTime"),
      groupByTime = str(v \ "groupByTime"),
      groupByTag = str(v \ "groupByTag"),
      fillType = str(v \ "fillType"),
      filters = filters(v \ "filters"),
      asOfMs = long(v \ "asOfMs", 0L))

  private def writePoint(v: JValue): Api.WritePoint = Api.WritePoint(
    name = str(v \ "name"),
    tags = strMap(v \ "tags"),
    fields = dblMap(v \ "fields"),
    ts = java.sql.Timestamp.from(java.time.Instant.parse(str(v \ "ts"))))

  private def processConfig(v: JValue): ProcessConfig = ProcessConfig(
    id = int(v \ "id", 0),
    name = str(v \ "name"),
    batchMaxSize = int(v \ "batchMaxSize", 1000),
    saveIntervalMs = long(v \ "saveIntervalMs", 5000L),
    siteId = str(v \ "siteId"),
    profile = str(v \ "profile", Tier.ProfileOptimized),
    autostart = bool(v \ "autostart", d = false))

  /** Decode one command message. Throws IllegalArgumentException on a
   *  malformed envelope or an unknown command type — the transport
   *  reports it through the standard error envelope. */
  def decode(json: String): Command = {
    val env = JsonMethods.parse(json)
    val msgType = str(env \ "type")
    require(msgType.nonEmpty, "command message has no 'type'")
    val v = env \ "val"
    val payload: Any = msgType match {
      case "cmd.tsdb.get_data_points" | "cmd.tsdb.get_energy_data_points" |
           "cmd.tsdb.delete_data_points" => getDataPoints(v)
      case "cmd.tsdb.write_data_points" => Api.WriteDataPointsRequest(
        procId = int(v \ "procId", 1), bucket = str(v \ "bucket"),
        dp = (v \ "dp") match {
          case JArray(xs) => xs.map(writePoint)
          case _ => throw new IllegalArgumentException("write: 'dp' must be an array")
        })
      case "cmd.tsdb.compact" => Api.CompactRequest(
        procId = int(v \ "procId", 1), tier = str(v \ "tier"),
        targetFileBytes = long(v \ "targetFileBytes", 128L * 1024 * 1024),
        minFiles = int(v \ "minFiles", 4),
        clusterBy = strSeq(v \ "clusterBy"),
        zorder = bool(v \ "zorder", d = false),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.vacuum" => Api.VacuumRequest(
        procId = int(v \ "procId", 1), tier = str(v \ "tier"),
        foldBatchMarkers = bool(v \ "foldBatchMarkers", d = true))
      case "cmd.tsdb.run_maintenance" => Api.MaintenanceRequest(
        procId = int(v \ "procId", 1), sinceDays = int(v \ "sinceDays", 3),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.backfill" => Api.BackfillRequest(
        procId = int(v \ "procId", 1), fromDate = str(v \ "fromDate"),
        toDate = str(v \ "toDate"),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.verify_rollup" => Api.VerifyRollupRequest(
        procId = int(v \ "procId", 1), fromDate = str(v \ "fromDate"),
        toDate = str(v \ "toDate"), tolerance = dbl(v \ "tolerance", 1e-6))
      case "cmd.tsdb.diff_data_points" => Api.DiffRequest(
        procId = int(v \ "procId", 1), tier = str(v \ "tier"),
        fromAsOfMs = long(v \ "fromAsOfMs", 0L),
        toAsOfMs = long(v \ "toAsOfMs", 0L))
      case "cmd.tsdb.query" => v match {
        case JString(sql) => sql
        case o => (int(o \ "procId", 1), str(o \ "sql"))
      }
      case "cmd.ecprocess.add" =>
        if (v == JNothing || v == JNull) null else processConfig(v)
      case "cmd.ecprocess.ctrl" => (int(v \ "procId", 1), str(v \ "op"))
      case "cmd.ecprocess.update_config" => processConfig(v)
      case "cmd.log.set_level" => str(v)
      case "cmd.tsdb.add_retention_policy" | "cmd.tsdb.update_retention_policy" =>
        Tier(str(v \ "name"), str(v \ "retention"), str(v \ "resolution"))
      case "cmd.tsdb.add_cq" =>
        (str(v \ "name"), str(v \ "src"), str(v \ "target"), str(v \ "every"))
      case "cmd.tsdb.delete_object" => (str(v \ "objectType"), str(v \ "name"))
      case "cmd.tsdb.add_filter" => Filter(
        id = int(v \ "id", 0), name = str(v \ "name"),
        topic = str(v \ "topic"), domain = str(v \ "domain"),
        service = str(v \ "service"), msgType = str(v \ "msgType"),
        negation = bool(v \ "negation", d = false),
        linkedFilterBooleanOperation = str(v \ "linkedFilterBooleanOperation"),
        linkedFilterId = int(v \ "linkedFilterId", 0),
        isAtomic = bool(v \ "isAtomic", d = true),
        tags = strMap(v \ "tags"),
        measurementId = str(v \ "measurementId"))
      case "cmd.tsdb.remove_filter" | "cmd.tsdb.remove_selector" => int(v, 0)
      case "cmd.tsdb.add_selector" => Selector(
        id = int(v \ "id", 0), topic = str(v \ "topic"),
        inMemory = bool(v \ "inMemory", d = false))
      // payload-free commands
      case "cmd.ecprocess.get_list" | "cmd.ecprocess.reset_to_default" |
           "cmd.ecprocess.check_storage" | "cmd.tsdb.get_measurements" |
           "cmd.tsdb.get_retention_policies" | "cmd.tsdb.get_cqs" |
           "cmd.tsdb.get_configs" | "cmd.tsdb.get_filters" |
           "cmd.tsdb.get_selectors" => null
      case other =>
        throw new IllegalArgumentException(s"unknown command: $other")
    }
    Command(msgType, payload, str(env \ "uid"), str(env \ "corid"),
      measurement = str(v \ "measurementName"),
      groupByTag = str(v \ "groupByTag"))
  }
}
