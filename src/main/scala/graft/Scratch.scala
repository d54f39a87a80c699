package graft

/** Throwaway phase profiler for the optimization rounds (not part of
  * the driver contract; safe to delete): construct/plan/count timings
  * plus scheduler-job and stage counts per run, for the queries named
  * on the command line (`runMain graft.Scratch q1 q2 …`).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    Sessions.warm(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
        }
      })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d")
      r
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("d18_incremental_clusters")
    if (names.head == "countplan") {
      // print the COUNT-pruned executed plan (what the bench times)
      for (q <- names.tail) {
        val df = SparkEntry.queries(q)(spark, sfDir).groupBy().count()
        println(s"=== countplan $q ===")
        println(df.queryExecution.executedPlan.toString.take(8000))
      }
      spark.stop(); return
    }
    for (r <- 1 to 3; q <- names) {
      val df = time(s"r$r $q construct") { SparkEntry.queries(q)(spark, sfDir) }
      time(s"r$r $q plan") { df.queryExecution.executedPlan }
      time(s"r$r $q count") { df.count() }
    }
    spark.stop()
  }
}
