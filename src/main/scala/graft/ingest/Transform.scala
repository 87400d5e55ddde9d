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
 * Implementation: ONE narrow pass — all candidate points are built as a
 * concat of per-candidate conditional singleton arrays, then a single
 * `explode`. No UDFs, no shuffles.
 *
 * Codegen structure (measured on Spark 4.1.x): `from_json` and every
 * higher-order lambda (`transform`, `array_compact`) are CodegenFallback
 * — ONE of them anywhere in a Project knocks the entire stage out of
 * whole-stage codegen, which made this map stage ~25× slower than its
 * plan suggests. So the hot path uses only codegen'd expressions
 * (`get_json_object`, `to_json`, `concat` of arrays), and the price
 * forecast branch — the one shape that genuinely needs `from_json` of an
 * array + a per-element lambda — is split onto its own filtered branch
 * (predicate pushed to the scan) and unioned back. The 99.9 % of traffic
 * that isn't a price forecast stays fully compiled.
 *
 * Documented divergence: the reference drops an extended meter report
 * whose val_json fails to unmarshal into map[string]float64 even when
 * the failure is on a key it never reads (transform.go:117-120); here
 * only non-object payloads and unparseable KNOWN keys
 * (e_import/e_export/p_import/p_export) drop the message.
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

    // JSON field access via get_json_object (codegen'd; from_json is
    // CodegenFallback and would disable the whole stage — see scaladoc)
    def goj(key: String): Column = get_json_object(col("val_json"), "$." + key)
    def fVal(key: String): Column = goj(key).try_cast(DoubleType)
    // an ext payload must be a JSON object with double-parseable known keys
    // (transform.go:117-120 unmarshal failure; see divergence note)
    val fmapInvalid =
      get_json_object(col("val_json"), "$").isNull ||
      !trim(col("val_json")).startsWith("{") ||
      Seq("e_import", "e_export", "p_import", "p_export")
        .map(k => goj(k).isNotNull && fVal(k).isNull).reduce(_ || _)
    val sTemp = goj("temp").try_cast(DoubleType)
    val sUnit = goj("unit")
    val sType = goj("type")

    // --- whole-message error drops (reference returns (nil, err)) ---
    val dropMsg =
      (isMeterReport && ((isW || isKW) && (normVal > MaxAllowedPower || fval.isNull))) || // transform.go:61-62
      (isMeterReport && !(isW || isKW || isKWh)) ||              // transform.go:80-81 unknown unit
      (isMeterReport && fval.isNull) ||                          // transform.go:86-88 float parse
      (isSession && fval.isNull) ||
      (isMeterExt && fmapInvalid) ||                             // transform.go:117-120
      (isMeterExt && (coalesce(fVal("p_import"), lit(0.0)) > MaxAllowedPower ||
                      coalesce(fVal("p_export"), lit(0.0)) > MaxAllowedPower)) ||
      (isSetpoint && sTemp.isNull) ||                            // transform.go:258-264
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
      .when(isSetpoint, sTemp)
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
      .when(isSetpoint, coalesce(sUnit, lit(""))) // transform.go:252-255 quirk
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
    // fields_json built by string concat, not to_json: StructsToJson costs
    // a Jackson generator per invocation — at one call per emitted point it
    // was the hottest expression in the stage; concat stays pure codegen.
    // Escaping covers backslash + quote (control chars in src don't occur
    // in FIMP source ids; the price branch keeps full to_json).
    def jsonEsc(c: Column): Column =
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val srcField = when(col("src").isNotNull,
      concat(lit("\"src\":\""), jsonEsc(col("src")), lit("\"")))
    val fieldsSrc = concat(lit("{"), concat_ws(",", srcField), lit("}"))
    val genericFields = when(isSetpoint,
        concat(lit("{"), concat_ws(",", srcField,
          concat(lit("\"type\":\""), jsonEsc(coalesce(sType, lit(""))), lit("\""))), lit("}")))
      .otherwise(fieldsSrc)

    // conditional singleton arrays + concat instead of array + array_compact:
    // ArrayCompact rewrites to a lambda filter (CodegenFallback); Concat of
    // arrays is fully codegen'd
    val emptyPts = array().cast("array<" + pointStructDDL + ">")
    def candidate(cond: Column, p: Column): Column =
      when(cond, array(p)).otherwise(emptyPts)

    val genericPt = candidate(genericApplies, pt(genericMeas, time, genericDir,
      genericServiceTag, genericValue, genericBool, genericStr, genericUnit,
      lit("mean"), genericSeries, genericFields))

    // --- meter kWh sampled twin: transform.go:69-78 ---
    val kwhSampled = candidate(isMeterReport && isKWh, pt(lit(MeasEnergySampled), time,
      lit("import"), serv, fval, nullB, nullS, unitProp, lit("difference"),
      concat(lit(MeasEnergy + ";"), seriesBase, lit(";import")),
      fieldsSrc))

    // --- chargepoint session sampled twin: transform.go:90-113 ---
    val sessionSampled = candidate(isSession, pt(lit(MeasEnergySampled), time,
      lit("import"), serv, fval, nullB, nullS, lit("kWh"), lit("sum"),
      concat(lit(MeasEnergySampled + ";"), seriesBase, lit(";import")),
      fieldsSrc))

    // --- extended meter report fan-out: transform.go:115-243 ---
    def extPt(key: String, meas: String, dir: String, agg: String, unit: String): Column = {
      val v = fVal(key)
      candidate(isMeterExt && v.isNotNull, pt(lit(meas), time, lit(dir), serv, v,
        nullB, nullS, lit(unit), lit(agg),
        concat(lit(meas + ";"), seriesBase, lit(";" + dir)), nullS))
    }
    val extEImport = extPt("e_import", MeasEnergy, "import", "last", "kWh")
    val extEImportS = extPt("e_import", MeasEnergySampled, "import", "difference", "kWh")
    val extEExport = extPt("e_export", MeasEnergy, "export", "last", "kWh")
    val extEExportS = extPt("e_export", MeasEnergySampled, "export", "difference", "kWh")
    val extPImport = extPt("p_import", MeasPower, "import", "mean", "W")
    val extPExport = extPt("p_export", MeasPower, "export", "mean", "W")

    val allPts = concat(genericPt, kwhSampled, sessionSampled,
      extEImport, extEImportS, extEExport, extEExportS, extPImport, extPExport)

    // --- price forecast explode: transform.go:271-294 — the one branch
    // that needs from_json + a per-element lambda (both CodegenFallback),
    // isolated on its own filtered slice so only price rows pay for it ---
    val priceArr = from_json(col("val_json"), priceSchema)
    val pricePts = when(priceArr.isNotNull,
      transform(priceArr, p => pt(lit(MeasPriceInfo), to_timestamp(p.getField("startsAt")),
        lit("export"), serv, p.getField("total"), nullB, nullS, p.getField("currency"),
        lit("mean"), concat(lit(MeasPriceInfo + ";"), seriesBase, lit(";import")),
        to_json(struct(col("src").as("src"), p.getField("level").as("level"))))))
      .otherwise(emptyPts)

    val mainRows = df0.filter(!isPriceServ)
      .withColumn("_pts", when(dropMsg, emptyPts).otherwise(allPts))
    val priceRows = df0.filter(isPriceForecast)
      .withColumn("_pts", pricePts)

    mainRows.unionByName(priceRows)
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
