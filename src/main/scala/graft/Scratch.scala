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
    if (names == Seq("d18phases")) {
      import org.apache.spark.sql.functions._
      for (r <- 1 to 3) {
        val allSig = time(s"r$r sig cache+count") {
          val x = operators.Dedup.minhashSignatures(spark, sfDir).cache()
          x.count(); x
        }
        val allEdges = operators.Dedup.pairMatchCountsOf(allSig)
          .filter(col("matches") >= 8).select(col("doc_a"), col("doc_b"))
        def sym(g: Int) = Seq(
          struct(lit(g).as("g"), col("doc_a").as("x"), col("doc_b").as("y")),
          struct(lit(g).as("g"), col("doc_b").as("x"), col("doc_a").as("y")))
        val isLake = col("doc_a") % 10 =!= 0 && col("doc_b") % 10 =!= 0
        val und0 = allEdges
          .select(isLake.as("lk"), explode(array(sym(0) ++ sym(1): _*)).as("e"))
          .filter(col("e.g") === 1 || col("lk"))
          .select(col("e.g").as("g"), col("e.x").as("x"), col("e.y").as("y"))
        val und = time(s"r$r edges checkpoint") { und0.localCheckpoint() }
        val fp = time(s"r$r tagged fixpoint") {
          val rows = time(s"r$r   rdd count") { und.queryExecution.toRdd.count() }
          operators.Dedup.withMicroLoopConf(spark, rows) {
            var lbl = und.select(col("g").as("lg"), col("x").as("node")).distinct()
              .select(col("lg"), col("node"), col("node").as("lbl"))
            var converged = false
            var iter = 0
            while (!converged && iter < 50) {
              val msgs = und.join(lbl,
                  col("g") === col("lg") && col("x") === col("node"))
                .groupBy(col("g"), col("y")).agg(min(col("lbl")).as("cand"))
                .select(col("g").as("mg"), col("y"), col("cand"))
              val prop = lbl.join(msgs,
                  col("lg") === col("mg") && col("node") === col("y"), "left")
                .select(col("lg"), col("node"), col("lbl").as("old"),
                  least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("lbl"))
              val parents = prop.select(col("lg").as("pg"),
                col("node").as("pid"), col("lbl").as("plbl"))
              val obs = org.apache.spark.sql.Observation(
                s"scr-$r-$iter-" + System.nanoTime())
              val upd0 = prop.join(parents,
                  col("lg") === col("pg") && col("lbl") === col("pid"), "left")
                .select(col("lg"), col("node"), col("old"),
                  least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl"))
                .observe(obs,
                  coalesce(sum(when(col("lbl") < col("old"), 1L).otherwise(0L)),
                    lit(0L)).as("changed"))
                .drop("old")
              val upd = time(s"r$r   round $iter checkpoint") {
                upd0.localCheckpoint() }
              converged = time(s"r$r   round $iter observe.get") {
                obs.get("changed").asInstanceOf[Long] == 0L }
              lbl = upd
              iter += 1
            }
            lbl.select(col("lg").as("g"), col("node"), col("lbl"))
          }
        }
        time(s"r$r final join count") {
          val docs = Tables.documents(spark, sfDir)
          val allLbl = fp.filter(col("g") === 1)
            .select(col("node").as("doc_id"), col("lbl").as("all_lbl"))
          val lakeLbl = fp.filter(col("g") === 0)
            .select(col("node").as("doc_id"), col("lbl").as("seed_lbl"))
          docs.select(col("doc_id"))
            .join(allLbl, Seq("doc_id"), "left")
            .join(lakeLbl, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("all_lbl"), col("doc_id")).as("cluster_id"))
            .count()
        }
      }
    } else
    for (r <- 1 to 3; q <- names) {
      val df = time(s"r$r $q construct") { SparkEntry.queries(q)(spark, sfDir) }
      time(s"r$r $q plan") { df.queryExecution.executedPlan }
      time(s"r$r $q count") { df.count() }
    }
    spark.stop()
  }
}
