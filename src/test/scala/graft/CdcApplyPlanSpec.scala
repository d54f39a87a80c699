package graft

/** r21's plan must carry its scale claim: the changelog folds through
  * ONE hash exchange on the key (struct-max partials combine
  * map-side) — no Window over the per-key history and no sort-based
  * ranking. A refactor to a row_number()-over-history formulation
  * would silently reintroduce the full-history sort this operator
  * exists to avoid.
  */
class CdcApplyPlanSpec extends SparkSpecBase {

  test("r21: one key exchange, no window over the op history") {
    val qe = operators.Relational.cdcApply(spark, sf0001).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    val hashExchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toList
    assert(hashExchanges.length == 1, s"expected 1 hash exchange: $hashExchanges")
    assert(hashExchanges.head.contains("o_orderkey"), hashExchanges.head)
    // partial aggregation combines map-side before that exchange
    // (struct-max buffers aren't hash-aggregable, so Spark plans
    // SortAggregate — the partial/final split is what bounds shuffle
    // volume to one row per key per partition)
    assert(plan.contains("partial_max"), s"no map-side partial:\n${plan.take(1500)}")
    val aggCount = "SortAggregate|HashAggregate".r.findAllMatchIn(plan).length
    assert(aggCount >= 2, s"no partial/final agg split:\n${plan.take(1500)}")
  }
}
