package graft

import java.nio.file.{Files, Paths}

/** Diagnostic main: write each named contract query's
  * `.explain("formatted")` output to `<outDir>/<query><suffix>.txt`
  * (`runMain graft.PlanDump <outDir> <suffix> q1 q2 …`; no query args
  * = all of them). The optimization rounds commit these as
  * plans/rNN/<query>_before.txt / _after.txt so plan-shape claims
  * (Exchange count, join strategy, PushedFilters) are checkable
  * without running Spark. Uses SPARK_GRAFT_SF_DIR (default sf0.1) so
  * the dumped plan is the bench-scale plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query…]")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    Sessions.warm(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$n$suffix.txt"), txt)
      println(s"[plandump] wrote $n$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
