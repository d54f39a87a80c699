package graft

import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the optimization round (not part of
  * the driver contract; safe to delete).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    Sessions.warm(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (r <- 1 to 3; q <- Seq("c01_curation", "r18_profile", "t09_tfidf")) {
      val df = time(s"r$r $q construct") { SparkEntry.queries(q)(spark, sfDir) }
      time(s"r$r $q plan") { df.queryExecution.executedPlan }
      time(s"r$r $q count") { df.count() }
    }
    spark.stop()
  }
}
