package graft

/** The scale invariant, enforced across EVERY driver query: no
 *  unpartitioned window may run over the data stream (only over an
 *  already-aggregated groups-sized frame). A violation is a one-task
 *  funnel that works at sf0.1 and dies at 100 TB — this spec makes it
 *  impossible to add one unnoticed. */
class PlanAuditSpec extends SparkSpec {

  test("no driver query plans a global window over the data stream") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        val bad = PlanAudit.globalDataWindows(plan)
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(_.simpleString(60)).mkString("; ")}")
    }
    assert(offenders.isEmpty, s"global data windows in:\n${offenders.mkString("\n")}")
  }
}
