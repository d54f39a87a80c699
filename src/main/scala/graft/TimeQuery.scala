package graft

import org.apache.spark.sql.SparkSession

/** Targeted single-query timer: `runMain graft.TimeQuery q1 q2 …`
  * times just the named SparkEntry queries (min of 3 runs each) on
  * SPARK_GRAFT_SF_DIR — for chasing one bench number without paying a
  * full 90-query run, and for separating load noise from regressions
  * (the full bench's tail queries run on a machine its own head has
  * loaded).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus) // the shared session contract
    Sessions.warm(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[timeq] $name: UNKNOWN query")
        case Some(fn) =>
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[timeq] $name%-26s min=${ts.min}%6.3f s  " +
            f"runs=${ts.map(t => f"$t%.2f").mkString("/")}")
      }
    }
    spark.stop()
  }
}
