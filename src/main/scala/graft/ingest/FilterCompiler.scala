package graft.ingest

import graft.model.Filter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Config-driven filter chain → a single Catalyst boolean Column
 * (reference: src/integration/tsdb/process.go:234-287).
 *
 * Reference semantics, reproduced exactly:
 *  - messages from service "ecollector" are always dropped (process.go:237-240);
 *  - the FIRST filter in config order with `isAtomic` is the single entry
 *    point (the Go loop returns on the first match, process.go:245,283);
 *  - within a filter, non-empty topic/domain/msgType/service fields are an
 *    equality conjunction (empty = wildcard);
 *  - `negation` inverts the filter's own result BEFORE chaining;
 *  - `linkedFilterId` recursively combines with and/or;
 *  - no atomic filter in config ⇒ nothing passes (process.go:286).
 *
 * Compiling to one Column (instead of interpreting per row) keeps the whole
 * predicate inside whole-stage codegen and lets Catalyst push it into the
 * source scan — at 100 TB this is the difference between a full decode and
 * a parquet-footer skip.
 */
object FilterCompiler {

  final case class EventCols(topic: Column, domain: Column, service: Column, msgType: Column)

  def defaultCols: EventCols = EventCols(col("topic"), col("domain"), col("serv"), col("msg_type"))

  /** Compile the full chain: self-traffic guard AND the first atomic filter chain. */
  def compile(filters: Seq[Filter], cols: EventCols = defaultCols): Column =
    (cols.service =!= "ecollector") && compileEntry(filters, 0, cols, depth = 0)

  private def compileEntry(filters: Seq[Filter], filterId: Int, cols: EventCols, depth: Int): Column = {
    if (depth > 32) return lit(false) // cycle guard; the Go code would loop forever
    val hit = filters.find(f => (f.isAtomic && filterId == 0) || f.id == filterId)
    hit match {
      case None => lit(false)
      case Some(f) =>
        var c: Column = lit(true)
        if (f.topic.nonEmpty) c = c && (cols.topic === f.topic)
        if (f.domain.nonEmpty) c = c && (cols.domain === f.domain)
        if (f.msgType.nonEmpty) c = c && (cols.msgType === f.msgType)
        if (f.service.nonEmpty) c = c && (cols.service === f.service)
        if (f.negation) c = !c
        if (f.linkedFilterId != 0) {
          val next = compileEntry(filters, f.linkedFilterId, cols, depth + 1)
          f.linkedFilterBooleanOperation match {
            case "or" => c = c || next
            case "and" => c = c && next
            case _ => // unknown operator: Go switch falls through, result unchanged
          }
        }
        c
    }
  }

  /**
   * Plain-Scala interpreter with identical semantics — the property-test
   * oracle for the compiler (SURVEY.md §5 commented tests at
   * process_test.go:136-239).
   */
  def interpret(filters: Seq[Filter], topic: String, domain: String,
      service: String, msgType: String): Boolean = {
    if (service == "ecollector") return false
    def eval(filterId: Int, depth: Int): Boolean = {
      if (depth > 32) return false
      filters.find(f => (f.isAtomic && filterId == 0) || f.id == filterId) match {
        case None => false
        case Some(f) =>
          var r = true
          if (f.topic.nonEmpty && topic != f.topic) r = false
          if (f.domain.nonEmpty && domain != f.domain) r = false
          if (f.msgType.nonEmpty && msgType != f.msgType) r = false
          if (f.service.nonEmpty && service != f.service) r = false
          if (f.negation) r = !r
          if (f.linkedFilterId != 0) {
            val next = eval(f.linkedFilterId, depth + 1)
            f.linkedFilterBooleanOperation match {
              case "or" => r = r || next
              case "and" => r = r && next
              case _ =>
            }
          }
          r
      }
    }
    eval(0, 0)
  }
}
