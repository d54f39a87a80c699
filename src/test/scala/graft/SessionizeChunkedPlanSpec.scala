package graft

/** r20's plan must carry its skew claim: the EVENT-sized exchange
  * keys on (user_id, chunk) — user_id alone may only key exchanges
  * over the per-chunk SESSION aggregates (bounded rows). A refactor
  * that reorders the two windows would silently reintroduce the r08
  * concentration this operator exists to avoid.
  */
class SessionizeChunkedPlanSpec extends SparkSpecBase {

  test("r20: the full-corpus window exchange includes the chunk key") {
    val plan = operators.Relational.sessionizeChunked(spark, sf0001)
      .queryExecution.executedPlan.toString
    // plans print top-down, so the DEEPEST exchange (nearest the scan,
    // i.e. the one that moves event-volume rows) is the LAST match —
    // it must be keyed on user_id+chunk, not user_id alone
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toList
    assert(exchanges.nonEmpty, plan.take(1500))
    val eventExchange = exchanges.last
    assert(eventExchange.contains("user_id") && eventExchange.contains("chunk"),
      s"event-sized exchange not chunk-diffused: $eventExchange")
    // and no cartesian anywhere (PlanHygieneSpec also sweeps this)
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }
}
