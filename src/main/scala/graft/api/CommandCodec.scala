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
  private def longSeq(v: JValue): Seq[Long] = v match {
    // elements are STRICT (no null→0 default): these arrays carry
    // destructive-command id sets (cmd.tsdb.erase_index_ids), and a
    // malformed [1, null, 3] must fail loudly, not erase id 0
    case JArray(xs) => xs.map {
      case JNull | JNothing => throw new IllegalArgumentException(
        "null element in long array")
      case x => long(x, 0L)
    }
    case JNull | JNothing => Nil
    case other => throw new IllegalArgumentException(s"not a long array: $other")
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

  /** First present (non-null) field among aliases — the wire-parity
   *  seam: the reference's payloads are snake_case for the query/write
   *  surface (api/types.go:9-34 — proc_id, measurement_name,
   *  data_function, relative_time, group_by_time, fill_type, dev_types;
   *  docs/api:449-477 examples confirm) and Go-default EXPORTED field
   *  names (ID, Name, BatchMaxSize, ...) for the untagged config
   *  structs (integration/tsdb/model.go:51-108). Decoding camelCase
   *  only — the round-10 shape — silently defaulted every reference
   *  field to "" and returned a WRONG result instead of an error. */
  private def field(v: JValue, names: String*): JValue =
    names.iterator.map(v \ _)
      .find(j => j != JNothing && j != JNull).getOrElse(JNothing)

  private def filters(v: JValue): DataPointsFilter = DataPointsFilter(
    tags = strMap(v \ "tags"),
    devices = strSeq(v \ "devices"),
    locations = strSeq(v \ "locations"),
    devTypes = strSeq(field(v, "devTypes", "dev_types")))

  private def getDataPoints(v: JValue): Api.GetDataPointsRequest =
    Api.GetDataPointsRequest(
      procId = int(field(v, "procId", "proc_id"), 1),
      fieldName = str(field(v, "fieldName", "field_name")),
      dataFunction = str(field(v, "dataFunction", "data_function")),
      transformFunction = str(field(v, "transformFunction", "transform_function")),
      measurementName = str(field(v, "measurementName", "measurement_name")),
      relativeTime = str(field(v, "relativeTime", "relative_time")),
      fromTime = str(field(v, "fromTime", "from_time")),
      toTime = str(field(v, "toTime", "to_time")),
      groupByTime = str(field(v, "groupByTime", "group_by_time")),
      groupByTag = str(field(v, "groupByTag", "group_by_tag")),
      fillType = str(field(v, "fillType", "fill_type")),
      filters = filters(v \ "filters"),
      asOfPin = str(field(v, "asOfPin", "as_of_pin")))

  /** The reference MDataPoint.ts is an int64 epoch with 0 meaning
   *  "server sets time" (api/types.go:27; the docs/api write example
   *  sends `"ts": 0`) — so a JSON number decodes as epoch seconds
   *  (or millis when it is plainly too large for seconds, ≥ 1e11:
   *  epoch seconds stay below that until the year 5138), 0 → `now`.
   *  ISO-8601 strings remain accepted for richer clients. */
  private def pointTs(v: JValue, now: () => java.time.Instant): java.sql.Timestamp = {
    val inst = v match {
      case JInt(_) | JLong(_) | JDouble(_) =>
        val n = long(v, 0L)
        if (n == 0L) now()
        else if (n >= 100000000000L) java.time.Instant.ofEpochMilli(n)
        else java.time.Instant.ofEpochSecond(n)
      case JNull | JNothing => now()
      case s => java.time.Instant.parse(str(s))
    }
    java.sql.Timestamp.from(inst)
  }

  private def writePoint(v: JValue, now: () => java.time.Instant): Api.WritePoint =
    Api.WritePoint(
      name = str(v \ "name"),
      tags = strMap(v \ "tags"),
      fields = dblMap(v \ "fields"),
      ts = pointTs(v \ "ts", now))

  /** The reference's ProcessConfig/Filter/Selector structs carry no
   *  json tags, so Go marshals their EXPORTED names verbatim —
   *  accepted here as fallbacks. SaveInterval is a time.Duration
   *  (int64 NANOSECONDS on a Go wire); values ≥ 1e7 are taken as ns
   *  and scaled to ms (no real save interval is ≥ 2.7 h in ms or
   *  < 10 ms in ns, so the split is unambiguous). */
  private def saveIntervalMs(v: JValue, d: Long): Long = {
    val n = long(v, d)
    if (n >= 10000000L) n / 1000000L else n
  }

  private def processConfig(v: JValue): ProcessConfig = ProcessConfig(
    id = int(field(v, "id", "ID"), 0),
    name = str(field(v, "name", "Name")),
    batchMaxSize = int(field(v, "batchMaxSize", "BatchMaxSize"), 1000),
    saveIntervalMs = saveIntervalMs(
      field(v, "saveIntervalMs", "SaveInterval"), 5000L),
    siteId = str(field(v, "siteId", "SiteId")),
    profile = str(field(v, "profile", "Profile"), Tier.ProfileOptimized),
    autostart = bool(field(v, "autostart", "Autostart"), d = false))

  /** Decode one command message. Throws IllegalArgumentException on a
   *  malformed envelope or an unknown command type — the transport
   *  reports it through the standard error envelope. `now` supplies the
   *  server-side timestamp for `"ts": 0` write points (injectable for
   *  deterministic tests). */
  def decode(json: String,
      now: () => java.time.Instant = () => java.time.Instant.now()): Command = {
    val env = JsonMethods.parse(json)
    val msgType = str(env \ "type")
    require(msgType.nonEmpty, "command message has no 'type'")
    val v = env \ "val"
    val payload: Any = msgType match {
      case "cmd.tsdb.get_data_points" | "cmd.tsdb.get_energy_data_points" |
           "cmd.tsdb.delete_data_points" |
           "cmd.tsdb.verify_tier_erasure" => getDataPoints(v)
      case "cmd.tsdb.write_data_points" => Api.WriteDataPointsRequest(
        procId = int(field(v, "procId", "proc_id"), 1), bucket = str(v \ "bucket"),
        dp = (v \ "dp") match {
          case JArray(xs) => xs.map(writePoint(_, now))
          case _ => throw new IllegalArgumentException("write: 'dp' must be an array")
        })
      case "cmd.tsdb.compact" => Api.CompactRequest(
        procId = int(field(v, "procId", "proc_id"), 1), tier = str(v \ "tier"),
        targetFileBytes = long(v \ "targetFileBytes", 128L * 1024 * 1024),
        minFiles = int(v \ "minFiles", 4),
        clusterBy = strSeq(v \ "clusterBy"),
        zorder = bool(v \ "zorder", d = false),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.erase_index_ids" | "cmd.tsdb.verify_erasure" =>
        Api.EraseIndexIdsRequest(
        procId = int(field(v, "procId", "proc_id"), 1),
        ids = longSeq(v \ "ids"),
        ivf = strSeq(field(v, "ivf", "ivf_paths")),
        minhash = strSeq(field(v, "minhash", "minhash_paths")),
        bm25 = strSeq(field(v, "bm25", "bm25_paths")))
      case "cmd.tsdb.vacuum" => Api.VacuumRequest(
        procId = int(field(v, "procId", "proc_id"), 1), tier = str(v \ "tier"),
        foldBatchMarkers = bool(v \ "foldBatchMarkers", d = true))
      case "cmd.tsdb.run_maintenance" => Api.MaintenanceRequest(
        procId = int(field(v, "procId", "proc_id"), 1), sinceDays = int(v \ "sinceDays", 3),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.backfill" => Api.BackfillRequest(
        procId = int(field(v, "procId", "proc_id"), 1), fromDate = str(v \ "fromDate"),
        toDate = str(v \ "toDate"),
        retainHistory = bool(v \ "retainHistory", d = false))
      case "cmd.tsdb.verify_rollup" => Api.VerifyRollupRequest(
        procId = int(field(v, "procId", "proc_id"), 1), fromDate = str(v \ "fromDate"),
        toDate = str(v \ "toDate"), tolerance = dbl(v \ "tolerance", 1e-6))
      case "cmd.tsdb.diff_data_points" => Api.DiffRequest(
        procId = int(field(v, "procId", "proc_id"), 1), tier = str(v \ "tier"),
        fromPin = str(field(v, "fromPin", "from_pin")),
        toPin = str(field(v, "toPin", "to_pin")))
      case "cmd.tsdb.query" => v match {
        case JString(sql) => sql
        case o => (int(o \ "procId", 1), str(o \ "sql"))
      }
      case "cmd.ecprocess.add" =>
        if (v == JNothing || v == JNull) null else processConfig(v)
      // the reference's ctrl payload is a str_map with "proc_id"/"op"
      // (admin.go:44 reads val["proc_id"])
      case "cmd.ecprocess.ctrl" => (int(field(v, "procId", "proc_id"), 1), str(v \ "op"))
      case "cmd.ecprocess.update_config" => processConfig(v)
      case "cmd.log.set_level" => str(v)
      case "cmd.tsdb.add_retention_policy" | "cmd.tsdb.update_retention_policy" =>
        Tier(str(v \ "name"), str(v \ "retention"), str(v \ "resolution"))
      case "cmd.tsdb.add_cq" =>
        (str(v \ "name"), str(v \ "src"), str(v \ "target"), str(v \ "every"))
      case "cmd.tsdb.delete_object" => (str(v \ "objectType"), str(v \ "name"))
      case "cmd.tsdb.add_filter" => Filter(
        id = int(field(v, "id", "ID"), 0), name = str(field(v, "name", "Name")),
        topic = str(field(v, "topic", "Topic")),
        domain = str(field(v, "domain", "Domain")),
        service = str(field(v, "service", "Service")),
        msgType = str(field(v, "msgType", "MsgType")),
        negation = bool(field(v, "negation", "Negation"), d = false),
        linkedFilterBooleanOperation = str(field(v,
          "linkedFilterBooleanOperation", "LinkedFilterBooleanOperation")),
        linkedFilterId = int(field(v, "linkedFilterId", "LinkedFilterID"), 0),
        isAtomic = bool(field(v, "isAtomic", "IsAtomic"), d = true),
        tags = strMap(field(v, "tags", "Tags")),
        measurementId = str(field(v, "measurementId", "MeasurementID")))
      case "cmd.tsdb.remove_filter" | "cmd.tsdb.remove_selector" => int(v, 0)
      case "cmd.tsdb.add_selector" => Selector(
        id = int(field(v, "id", "ID"), 0),
        topic = str(field(v, "topic", "Topic")),
        inMemory = bool(field(v, "inMemory", "InMemory"), d = false))
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
      measurement = str(field(v, "measurementName", "measurement_name")),
      groupByTag = str(field(v, "groupByTag", "group_by_tag")))
  }
}
