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
    val sc = spark.sparkContext
    @volatile var jobs = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    })
    import operators.Dedup
    // phase breakdown of d18 (mirrors incrementalClusters)
    for (r <- 1 to 2) {
      val docs = Tables.documents(spark, sfDir)
      val lakeDocs = docs.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"))
      val deltaDocs = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      val allSig = Dedup.minhashSignatures(spark, sfDir).cache()
      val lakeSig = allSig.filter(col("doc_id") % 10 =!= 0)
      val deltaSig = allSig.filter(col("doc_id") % 10 === 0)
      val emptySeed = lakeDocs
        .select(col("doc_id"), col("doc_id").as("cluster_id")).limit(0)
      jobs = 0
      val lakeEdges = time(s"r$r lakeEdges build+cp") {
        Dedup.pairMatchCountsOf(lakeSig)
          .filter(col("matches") >= 8).select(col("doc_a"), col("doc_b"))
          .localCheckpoint()
      }
      println(s"[scratch] jobs=$jobs"); jobs = 0
      val seed = time(s"r$r seed mergeClusterLabels") {
        Dedup.mergeClusterLabels(emptySeed, lakeEdges, lakeDocs)
          .localCheckpoint()
      }
      println(s"[scratch] jobs=$jobs"); jobs = 0
      val deltaEdges = time(s"r$r verifiedIncidentEdges cp") {
        Dedup.verifiedIncidentEdges(deltaSig, allSig).localCheckpoint()
      }
      println(s"[scratch] jobs=$jobs"); jobs = 0
      val merged = time(s"r$r fold mergeClusterLabels") {
        Dedup.mergeClusterLabels(seed, deltaEdges, deltaDocs)
      }
      time(s"r$r final join+count") {
        merged
          .join(seed.select(col("doc_id"), col("cluster_id").as("seed_cl")),
            Seq("doc_id"), "left")
          .count()
      }
      println(s"[scratch] jobs=$jobs")
      allSig.unpersist()
    }
    spark.stop()
  }
}
