package graft

/** Diagnostic main: print each named contract query's distinct
  * ReadSchema lines at sf0.001 — the column-pruning audit
  * (`runMain graft.PlanPeek t36_readability …`). A scan reading
  * more columns than the query projects is a plan bug.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val reads = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq.distinct
      println(s"=== $n")
      reads.foreach(r => println("  " + r.take(200)))
    }
    spark.stop()
  }
}
