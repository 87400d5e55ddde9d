package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * MQTT wildcard topic matching (reference: src/utils/utils.go:13-41).
 *
 * The reference implements `+` (single-segment) and `#` (multi-segment
 * tail) wildcards with a recursive segment walk. We translate the pattern
 * once (driver-side) to an anchored regex and let Catalyst push an
 * `RLIKE` into codegen — no UDF, scales to any row count.
 */
object TopicMatch {

  /** Translate an MQTT pattern to an anchored Java regex. */
  def toRegex(pattern: String): String = {
    val segs = pattern.split("/", -1)
    val sb = new StringBuilder("^")
    var i = 0
    var terminated = false
    while (i < segs.length && !terminated) {
      val s = segs(i)
      val isLast = i == segs.length - 1
      s match {
        case "#" =>
          // '#' matches the remainder (zero or more segments); drop the
          // trailing '/' the previous segment appended.
          if (i == 0) sb.append(".*") else { sb.setLength(sb.length - 1); sb.append("(/.*)?") }
          terminated = true
        case "+" =>
          sb.append("[^/]*")
          if (!isLast) sb.append("/")
        case lit =>
          sb.append(java.util.regex.Pattern.quote(lit))
          if (!isLast) sb.append("/")
      }
      i += 1
    }
    sb.append("$")
    sb.toString
  }

  /** Column predicate: does `topic` match the MQTT `pattern`? */
  def matches(topic: Column, pattern: String): Column =
    if (pattern == "#") lit(true) else topic.rlike(toRegex(pattern))

  /** Plain-Scala matcher (used in tests as the semantic oracle). */
  def matchesStr(topic: String, pattern: String): Boolean =
    topic.matches(toRegex(pattern))

  /** Predicate for a set of selectors: true if any selector topic matches
   *  (reference: process.go:456-463 subscribes one callback per selector). */
  def anySelector(topic: Column, patterns: Seq[String]): Column =
    patterns.map(matches(topic, _)).reduceOption(_ || _).getOrElse(lit(false))
}
