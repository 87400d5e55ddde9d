package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * DefaultTransform: FIMP event → 0..N typed data points
 * (reference: src/integration/tsdb/transform.go:26-351).
 *
 * Input: a DataFrame with the `Schemas.rawEvent` columns plus (optional,
 * from metadata enrichment) `dev_id`, `location_id`, `dev_type` string
 * columns. `val_json` holds plain literal text for scalar val_t
 * (`"21.5"`, `"true"`, `"abc"`) and JSON for structured val_t
 * (float_map / str_map / object arrays).
 *
 * Implementation: ONE narrow pass — all candidate points are built as an
 * array of structs with `when()` conditions, nulls filtered, then a single
 * `explode`. No UDFs, no shuffles; the whole fan-out stays inside
 * whole-stage codegen, so at 100 TB this is a pure map stage that scales
 * linearly with input splits.
 *
 * Faithfully reproduced reference quirks (all cited):
 *  - series id falls back to "" (not topic) when metadata is absent,
 *    because getDefaultTags pre-seeds dev_id="" (transform.go:30-36,356).
 *  - the generic point for meter W/kW / kWh reports double-prefixes the
 *    measurement in its series id (transform.go:66,344: seriesID was already
 *    prefixed before the final append).
 *  - price-forecast points carry tag dir="export" but series suffix
 *    ";import" (transform.go:280,287).
 *  - a too-big p_import/p_export in an extended report drops the WHOLE
 *    message (transform.go:199-201,226-228 return nil).
 *  - thermostat setpoint unit/type default to "" when absent, because the
 *    Go blank-assign overwrites the declared defaults (transform.go:252-257).
 */
object Transform {

  val MeasPower = "electricity_meter_power"
  val MeasEnergy = "electricity_meter_energy"
  val MeasEnergySampled = "electricity_meter_energy_sampled"
  val MeasPriceInfo = "electricity_price_info"
  val MaxAllowedPower = 30000.0 // transform.go:22

  val priceSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("level", StringType),
    StructField("total", DoubleType),
    StructField("energy", DoubleType),
    StructField("tax", DoubleType),
    StructField("currency", StringType),
    StructField("startsAt", StringType)))) // model/types.go:5-12

  private val pointStructDDL =
    "struct<measurement:string,time:timestamp,dir:string,service:string," +
    "value:double,value_bool:boolean,value_str:string,unit:string," +
    "agg_func:string,series_id:string,fields_json:string>"

  private def pt(measurement: Column, time: Column, dir: Column, serviceTag: Column,
      value: Column, valueBool: Column, valueStr: Column, unit: Column,
      aggFunc: Column, seriesId: Column, fieldsJson: Column): Column =
    struct(
      measurement.as("measurement"), time.as("time"), dir.as("dir"),
      serviceTag.as("service"), value.cast(DoubleType).as("value"),
      valueBool.cast(BooleanType).as("value_bool"), valueStr.as("value_str"),
      unit.as("unit"), aggFunc.as("agg_func"), seriesId.as("series_id"),
      fieldsJson.as("fields_json"))

  private val nullS = lit(null).cast(StringType)
  private val nullD = lit(null).cast(DoubleType)
  private val nullB = lit(null).cast(BooleanType)

  def apply(events: DataFrame): DataFrame = {
    val df0 = Seq("dev_id", "location_id", "dev_type")
      .foldLeft(events)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(StringType)))

    val serv = col("serv")
    val msgType = col("msg_type")
    val valT = col("val_t")
    val time = col("time")
    val unitProp = col("props").getItem("unit")

    // process.go:136 — default measurement name
    val measDefault = concat_ws(".", serv, msgType)
    // transform.go:30-36 — dev_id is pre-seeded "" so the topic fallback is dead code
    val seriesBase = coalesce(col("dev_id"), lit(""))

    val isMeterServ = serv.isin("meter_elec", "sensor_power", "chargepoint")
    val isMeterReport = isMeterServ && msgType.isin("evt.meter.report", "evt.sensor.report")
    val isSession = isMeterServ && (msgType === "evt.current_session.report")
    val isMeterExt = isMeterServ && (msgType === "evt.meter_ext.report")
    val isSetpoint = (serv === "thermostat") &&
      msgType.isin("cmd.setpoint.set", "cmd.setpoint.report")
    val isPriceServ = serv === "price_info_elec"
    val isPriceForecast = isPriceServ && (msgType === "evt.price_forecast.report")

    val fval = col("val_json").try_cast(DoubleType)
    val isW = unitProp === "W"
    val isKW = unitProp === "kW"
    val isKWh = unitProp === "kWh"
    val normVal = when(isKW, fval * 1000).otherwise(fval) // transform.go:57-60

    // gate the JSON parses behind their branch predicates — when() evaluates
    // lazily in codegen, so non-map rows never pay the Jackson parse
    val fmap = when(isMeterExt, from_json(col("val_json"), MapType(StringType, DoubleType)))
    val smap = when(isSetpoint, from_json(col("val_json"), MapType(StringType, StringType)))

    // --- whole-message error drops (reference returns (nil, err)) ---
    val dropMsg =
      (isMeterReport && ((isW || isKW) && (normVal > MaxAllowedPower || fval.isNull))) || // transform.go:61-62
      (isMeterReport && !(isW || isKW || isKWh)) ||              // transform.go:80-81 unknown unit
      (isMeterReport && fval.isNull) ||                          // transform.go:86-88 float parse
      (isSession && fval.isNull) ||
      (isMeterExt && fmap.isNull) ||                             // transform.go:117-120
      (isMeterExt && (coalesce(fmap.getItem("p_import"), lit(0.0)) > MaxAllowedPower ||
                      coalesce(fmap.getItem("p_export"), lit(0.0)) > MaxAllowedPower)) ||
      (isSetpoint && (smap.isNull || smap.getItem("temp").try_cast(DoubleType).isNull)) || // transform.go:258-264
      (serv === "ecollector")                                    // process.go:237-240

    // --- generic (fall-through) point: transform.go:298-350 ---
    val genericApplies = !isMeterExt && !isPriceServ &&
      (isMeterReport || isSession || isSetpoint ||
        (!isMeterReport && !isSession && !isSetpoint && valT =!= ""))
    val genericMeas = when(isMeterReport && (isW || isKW), MeasPower)
      .when(isMeterReport && isKWh, MeasEnergy)
      .otherwise(measDefault)
    val genericValue = when(isMeterReport && (isW || isKW), normVal)
      .when(isMeterReport && isKWh, fval)
      .when(isSession, fval)
      .when(isSetpoint, smap.getItem("temp").try_cast(DoubleType))
      .when(valT === "float", fval)
      .when(valT === "int", col("val_json").try_cast(LongType).cast(DoubleType))
      .when(valT === "null", lit(0.0))
      .otherwise(nullD)
    val genericBool = when(valT === "bool" && !isMeterReport && !isSession && !isSetpoint,
      col("val_json").try_cast(BooleanType)).otherwise(nullB)
    val genericStr = when(isMeterReport || isSession || isSetpoint, nullS)
      .when(valT === "string", col("val_json"))
      .when(valT === "object", lit("object"))                    // transform.go:328-329
      .when(valT.isin("float", "int", "bool", "null"), nullS)
      .otherwise(col("val_json"))                                // transform.go:334-335 default arm
    val genericUnit = when(isMeterReport && (isW || isKW), unitProp)
      .when(isMeterReport && isKWh, unitProp)
      .when(isSession, lit("kWh"))
      .when(isSetpoint, coalesce(smap.getItem("unit"), lit(""))) // transform.go:252-255 quirk
      .when(valT === "float", unitProp)
      .otherwise(nullS)
    val genericDir = when(isMeterReport || isSession, lit("import")).otherwise(nullS)
    val genericServiceTag = when(isMeterServ, serv).otherwise(nullS) // transform.go:46
    // series-id quirks, see scaladoc
    val genericSeries = when(isMeterReport && (isW || isKW),
        concat(lit(MeasPower + ";" + MeasPower + ";"), seriesBase, lit(";import")))
      .when(isMeterReport && isKWh,
        concat(lit(MeasEnergy + ";" + MeasEnergy + ";"), seriesBase, lit(";import")))
      .when(isSession,
        concat(measDefault, lit(";" + MeasEnergySampled + ";"), seriesBase, lit(";import")))
      .otherwise(concat(genericMeas, lit(";"), seriesBase))
    val genericFields = when(isSetpoint,
        to_json(struct(col("src").as("src"), coalesce(smap.getItem("type"), lit("")).as("type"))))
      .otherwise(to_json(struct(col("src").as("src"))))

    val genericPt = when(genericApplies, pt(genericMeas, time, genericDir,
      genericServiceTag, genericValue, genericBool, genericStr, genericUnit,
      lit("mean"), genericSeries, genericFields)).otherwise(lit(null))

    // --- meter kWh sampled twin: transform.go:69-78 ---
    val kwhSampled = when(isMeterReport && isKWh, pt(lit(MeasEnergySampled), time,
      lit("import"), serv, fval, nullB, nullS, unitProp, lit("difference"),
      concat(lit(MeasEnergy + ";"), seriesBase, lit(";import")),
      to_json(struct(col("src").as("src"))))).otherwise(lit(null))

    // --- chargepoint session sampled twin: transform.go:90-113 ---
    val sessionSampled = when(isSession, pt(lit(MeasEnergySampled), time,
      lit("import"), serv, fval, nullB, nullS, lit("kWh"), lit("sum"),
      concat(lit(MeasEnergySampled + ";"), seriesBase, lit(";import")),
      to_json(struct(col("src").as("src"))))).otherwise(lit(null))

    // --- extended meter report fan-out: transform.go:115-243 ---
    def extPt(key: String, meas: String, dir: String, agg: String, unit: String): Column = {
      val v = fmap.getItem(key)
      when(isMeterExt && v.isNotNull, pt(lit(meas), time, lit(dir), serv, v,
        nullB, nullS, lit(unit), lit(agg),
        concat(lit(meas + ";"), seriesBase, lit(";" + dir)), nullS))
        .otherwise(lit(null))
    }
    val extEImport = extPt("e_import", MeasEnergy, "import", "last", "kWh")
    val extEImportS = extPt("e_import", MeasEnergySampled, "import", "difference", "kWh")
    val extEExport = extPt("e_export", MeasEnergy, "export", "last", "kWh")
    val extEExportS = extPt("e_export", MeasEnergySampled, "export", "difference", "kWh")
    val extPImport = extPt("p_import", MeasPower, "import", "mean", "W")
    val extPExport = extPt("p_export", MeasPower, "export", "mean", "W")

    // --- price forecast explode: transform.go:271-294 ---
    val priceArr = when(isPriceForecast, from_json(col("val_json"), priceSchema))
    val pricePts = when(isPriceForecast && priceArr.isNotNull,
      transform(priceArr, p => pt(lit(MeasPriceInfo), to_timestamp(p.getField("startsAt")),
        lit("export"), serv, p.getField("total"), nullB, nullS, p.getField("currency"),
        lit("mean"), concat(lit(MeasPriceInfo + ";"), seriesBase, lit(";import")),
        to_json(struct(col("src").as("src"), p.getField("level").as("level"))))))
      .otherwise(array().cast("array<" + pointStructDDL + ">"))

    val candidates = array(genericPt, kwhSampled, sessionSampled,
      extEImport, extEImportS, extEExport, extEExportS, extPImport, extPExport)

    val allPts = concat(array_compact(candidates), array_compact(pricePts))

    df0
      // slice(_, 1, 0) = empty array of the same element type
      .withColumn("_pts", when(dropMsg, slice(allPts, 1, 0)).otherwise(allPts))
      .select(col("*"), explode(col("_pts")).as("_p"))
      .select(
        col("_p.measurement").as("measurement"),
        col("_p.time").as("time"),
        coalesce(col("dev_id"), lit("")).as("dev_id"),
        coalesce(col("dev_type"), lit("")).as("dev_type"),
        col("_p.dir").as("dir"),
        coalesce(col("location_id"), lit("")).as("location_id"),
        col("_p.service").as("service"),
        col("src").as("src"),
        col("topic").as("topic"),
        col("domain").as("domain"),
        col("_p.value").as("value"),
        col("_p.value_bool").as("value_bool"),
        col("_p.value_str").as("value_str"),
        col("_p.unit").as("unit"),
        col("_p.series_id").as("series_id"),
        col("_p.agg_func").as("agg_func"),
        col("_p.fields_json").as("fields_json"))
  }
}
