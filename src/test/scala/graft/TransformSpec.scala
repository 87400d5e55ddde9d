package graft

import java.sql.Timestamp

import graft.ingest.Transform
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Fixture-driven coverage of every DefaultTransform branch
 * (reference: transform.go:26-351; fixtures from FIXTURES.md §1).
 */
class TransformSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  private val schema = StructType(Seq(
    StructField("topic", StringType), StructField("serv", StringType),
    StructField("msg_type", StringType), StructField("val_t", StringType),
    StructField("val_json", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("src", StringType), StructField("domain", StringType),
    StructField("time", TimestampType),
    StructField("dev_id", StringType), StructField("location_id", StringType),
    StructField("dev_type", StringType)))

  private def mk(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private def row(serv: String, msgType: String, valT: String, valJson: String,
      props: Map[String, String] = Map.empty, devId: String = "100"): Row =
    Row("pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:" + serv + "/ad:15_0", serv, msgType,
      valT, valJson, props, "app", "hub", t0, devId, "11", "sensor")

  private def points(rows: Row*): Seq[Row] =
    Transform(mk(rows: _*)).collect().toSeq

  test("generic float sensor report (transform.go:299-306)") {
    val ps = points(row("sensor_temp", "evt.sensor.report", "float", "21.5",
      Map("unit" -> "C")))
    assert(ps.size == 1)
    val p = ps.head
    assert(p.getAs[String]("measurement") == "sensor_temp.evt.sensor.report")
    assert(p.getAs[Double]("value") == 21.5)
    assert(p.getAs[String]("unit") == "C")
    assert(p.getAs[String]("agg_func") == "mean")
    assert(p.getAs[String]("series_id") == "sensor_temp.evt.sensor.report;100")
    assert(p.getAs[String]("dev_id") == "100")
  }

  test("meter power W and kW normalization + 30 kW bound (transform.go:54-64)") {
    val ps = points(
      row("meter_elec", "evt.meter.report", "float", "1200", Map("unit" -> "W")),
      row("meter_elec", "evt.meter.report", "float", "1.2", Map("unit" -> "kW")),
      row("meter_elec", "evt.meter.report", "float", "31", Map("unit" -> "kW"))) // > 30 kW
    assert(ps.size == 2)
    assert(ps.forall(_.getAs[String]("measurement") == "electricity_meter_power"))
    assert(ps.map(_.getAs[Double]("value")).toSet == Set(1200.0))
    assert(ps.forall(_.getAs[String]("dir") == "import"))
    assert(ps.forall(_.getAs[String]("service") == "meter_elec"))
    // reference quirk: measurement double-prefixed in the generic series id
    assert(ps.forall(_.getAs[String]("series_id") ==
      "electricity_meter_power;electricity_meter_power;100;import"))
  }

  test("meter energy kWh emits the sampled twin (transform.go:65-79)") {
    val ps = points(row("meter_elec", "evt.meter.report", "float", "500.5",
      Map("unit" -> "kWh")))
    assert(ps.size == 2)
    val byMeas = ps.groupBy(_.getAs[String]("measurement"))
    assert(byMeas.keySet ==
      Set("electricity_meter_energy", "electricity_meter_energy_sampled"))
    assert(byMeas("electricity_meter_energy_sampled").head
      .getAs[String]("agg_func") == "difference")
    assert(byMeas("electricity_meter_energy").head.getAs[String]("agg_func") == "mean")
  }

  test("unknown unit drops the message (transform.go:80-81)") {
    assert(points(row("meter_elec", "evt.meter.report", "float", "5",
      Map("unit" -> "MWh"))).isEmpty)
  }

  test("chargepoint session → sampled sum + generic (transform.go:90-113)") {
    val ps = points(row("chargepoint", "evt.current_session.report", "float",
      "716.007", Map.empty))
    assert(ps.size == 2)
    val sampled = ps.find(_.getAs[String]("measurement") == "electricity_meter_energy_sampled").get
    assert(sampled.getAs[String]("agg_func") == "sum")
    assert(sampled.getAs[String]("unit") == "kWh")
    val generic = ps.find(_.getAs[String]("measurement") == "chargepoint.evt.current_session.report").get
    assert(generic.getAs[String]("agg_func") == "mean")
  }

  test("extended meter report fans out to 5+ points (transform.go:115-243)") {
    val json = """{"e_import":123.4,"e_export":0.5,"p_import":950,"p_export":0,"last_e_import":120.0}"""
    val ps = points(row("meter_elec", "evt.meter_ext.report", "float_map", json))
    // e_import → energy+sampled, e_export → energy+sampled, p_import, p_export
    assert(ps.size == 6)
    val dirs = ps.map(r => (r.getAs[String]("measurement"), r.getAs[String]("dir"),
      r.getAs[String]("agg_func")))
    assert(dirs.contains(("electricity_meter_energy", "import", "last")))
    assert(dirs.contains(("electricity_meter_energy_sampled", "export", "difference")))
    assert(dirs.contains(("electricity_meter_power", "import", "mean")))
    assert(dirs.contains(("electricity_meter_power", "export", "mean")))
  }

  test("too-big p_import drops the WHOLE message (transform.go:199-201)") {
    val json = """{"e_import":123.4,"p_import":31000}"""
    assert(points(row("meter_elec", "evt.meter_ext.report", "float_map", json)).isEmpty)
  }

  test("thermostat setpoint str_map (transform.go:245-269)") {
    val ps = points(row("thermostat", "cmd.setpoint.set", "str_map",
      """{"temp":"21.5","unit":"C","type":"heat"}"""))
    assert(ps.size == 1)
    assert(ps.head.getAs[Double]("value") == 21.5)
    assert(ps.head.getAs[String]("unit") == "C")
    // unparseable temp → error → no points
    assert(points(row("thermostat", "cmd.setpoint.set", "str_map",
      """{"temp":"abc"}""")).isEmpty)
  }

  test("price forecast explodes with future event timestamps (transform.go:271-294)") {
    val json = """[{"level":"NORMAL","total":0.82,"energy":0.6,"tax":0.22,"currency":"NOK","startsAt":"2026-08-12T00:00:00Z"},
                   {"level":"HIGH","total":1.2,"energy":0.9,"tax":0.3,"currency":"NOK","startsAt":"2026-08-12T01:00:00Z"}]"""
    val ps = points(row("price_info_elec", "evt.price_forecast.report", "object", json))
    assert(ps.size == 2)
    assert(ps.forall(_.getAs[String]("measurement") == "electricity_price_info"))
    assert(ps.forall(_.getAs[String]("dir") == "export")) // quirk: tag export
    assert(ps.forall(_.getAs[String]("series_id") == "electricity_price_info;100;import"))
    assert(ps.map(_.getAs[Double]("value")).toSet == Set(0.82, 1.2))
    assert(ps.map(_.getAs[Timestamp]("time").toString).toSet ==
      Set("2026-08-12 00:00:00.0", "2026-08-12 01:00:00.0"))
    assert(ps.forall(_.getAs[String]("unit") == "NOK"))
  }

  test("bool / int / string / null / object arms (transform.go:308-335)") {
    val ps = points(
      row("sensor_presence", "evt.sensor.report", "bool", "true"),
      row("meter_x", "evt.x.report", "int", "42"),
      row("dev_sys", "evt.mode.report", "string", "home"),
      row("dev_sys", "evt.null.report", "null", ""),
      row("vinculum", "evt.pd7.response", "object", """{"a":1}"""))
    assert(ps.size == 5)
    assert(ps.exists(r => r.getAs[java.lang.Boolean]("value_bool") == true))
    assert(ps.exists(r => r.getAs[java.lang.Double]("value") == 42.0))
    assert(ps.exists(r => r.getAs[String]("value_str") == "home"))
    assert(ps.exists(r => r.getAs[java.lang.Double]("value") == 0.0 &&
      r.getAs[String]("measurement") == "dev_sys.evt.null.report"))
    assert(ps.exists(r => r.getAs[String]("value_str") == "object"))
  }

  test("empty val_t and self-traffic drop (transform.go:330-331, process.go:237)") {
    assert(points(row("dev_sys", "evt.x.report", "", "1")).isEmpty)
    assert(points(row("ecollector", "evt.x.report", "float", "1")).isEmpty)
  }

  test("missing metadata: empty-string tags and series base (transform.go:30-36)") {
    val r = Row("top", "sensor_temp", "evt.sensor.report", "float", "1.0",
      Map.empty[String, String], "app", "hub", t0, null, null, null)
    val ps = points(r)
    assert(ps.head.getAs[String]("dev_id") == "")
    assert(ps.head.getAs[String]("series_id") == "sensor_temp.evt.sensor.report;")
  }
}
