package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * S2 — batch replay of MQTT message logs
 * (reference: src/integration/tsdb/cli/batch_loader.go:28-87,
 * process.go:211-231 AddMessage).
 *
 * Line format: `<tai64n> pt:<topic> {json}` — the reference splits on
 * " pt:" then on " {" and parses the tai64n label for the historical
 * event time. Batch and live ingest share the transform pipeline (the
 * core Spark advantage: this is the same DataFrame code path).
 *
 * All parsing is codegen'd builtins (regexp_extract / conv / from_json) —
 * a 100 TB replay is a pure map stage over text splits.
 */
object LogReplay {

  /** FIMP JSON envelope schema (payload side). */
  val fimpSchema: StructType = StructType(Seq(
    StructField("serv", StringType),
    StructField("type", StringType),
    StructField("val_t", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("src", StringType)))

  /** tai64n label (`@` + 16 hex sec + 8 hex nanos, seconds offset 2^62)
   *  → timestamp. */
  def tai64nToTimestamp(label: Column): Column = {
    val sec = conv(substring(regexp_replace(label, "^@", ""), 1, 16), 16, 10)
      .cast(LongType) - 4611686018427387904L
    val nanos = conv(substring(regexp_replace(label, "^@", ""), 17, 8), 16, 10)
      .cast(LongType)
    timestamp_micros(sec * 1000000L + floor(nanos / 1000L).cast(LongType))
  }

  /**
   * Log lines → raw envelopes (topic, payload, time) — the wire shape
   * every streaming front door produces (see StreamSource). Unparseable
   * lines are dropped (the reference skips lines without " pt:").
   */
  def toEnvelope(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val l = col(lineCol)
    lines
      .filter(l.contains(" pt:") && l.contains(" {"))
      .select(
        concat(lit("pt:"), regexp_extract(l, " pt:(\\S+) \\{", 1)).as("topic"),
        concat(lit("{"), regexp_extract(l, " \\{(.*)$", 1)).as("payload"),
        tai64nToTimestamp(regexp_extract(l, "^(\\S+) pt:", 1)).as("time"))
  }

  /** Raw envelopes → the canonical rawEvent shape (`Schemas.rawEvent`):
   *  topic, serv, msg_type, val_t, val_json, props, src, domain, time.
   *  Shared by batch replay and every streaming source. */
  def decodeEnvelope(env: DataFrame): DataFrame = {
    val payload = col("payload")
    val parsed = from_json(payload, fimpSchema)
    env.select(
      col("topic"),
      parsed.getField("serv").as("serv"),
      parsed.getField("type").as("msg_type"),
      parsed.getField("val_t").as("val_t"),
      get_json_object(payload, "$.val").as("val_json"),
      parsed.getField("props").as("props"),
      parsed.getField("src").as("src"),
      // domain = address global prefix (process.go:216 addr.GlobalPrefix)
      regexp_extract(col("topic"), "^pt:([^/]+)", 1).as("domain"),
      col("time"))
  }

  /**
   * Parse raw log lines into the canonical rawEvent shape — the batch
   * replay entry (S2), composed from the two stages above.
   */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame =
    decodeEnvelope(toEnvelope(lines, lineCol))

  /** Read a directory of log files and parse (loadMessagesFromFile). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Render events back into the log-line format (for tests/round-trips). */
  def format(events: DataFrame): Column = {
    val sec = unix_timestamp(col("time")) + 4611686018427387904L
    val label = concat(lit("@"), lpad(lower(hex(sec)), 16, "0"), lit("00000000"))
    concat(label, lit(" "), col("topic"), lit(" "),
      to_json(struct(col("serv").as("serv"), col("msg_type").as("type"),
        col("val_t").as("val_t"), col("val_json").as("val"),
        col("props").as("props"), col("src").as("src"))))
    // NB `val` is emitted as a JSON string; parse()'s get_json_object
    // unescapes it back to the raw literal, so the round-trip is lossless
    // for scalar and structured values alike.
  }
}
