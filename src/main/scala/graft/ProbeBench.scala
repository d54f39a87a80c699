package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Build-once/probe-by-key evidence: `runMain graft.ProbeBench` builds
  * the persisted IndexStore for SPARK_GRAFT_SF_DIR, then times each
  * probe against its inline twin (min of 3) and reports the probe's
  * SCAN FOOTPRINT: task input bytes vs the index family's stored
  * size — the post-pruning fraction is the measured side of the
  * "production probes a stored index" claims. At test SFs wall time
  * is fixed-cost-dominated (~0.5 s local[32] job floor) and the
  * inline twins read session-cached corpus tables, so the footprint
  * fraction is the scale signal: probe bytes stay ∝ touched
  * partitions while the index (and inline work) grows ∝ corpus.
  * Build time is reported once: it amortizes over every query the
  * index serves.
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    Sessions.warm(spark, sfDir)
    val idx = Files.createTempDirectory("graft-probe-idx").toString + "/idx"
    def time(mk: () => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk().count()
        (System.nanoTime() - t0) / 1e9
      }.min
    // every leaf scan in the executed plan, descending through AQE
    // stage wrappers (plain `collect` stops at QueryStageExec)
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    // bytes the plan SELECTED from the given index families (post
    // partition pruning — the planning-time file-size scan metrics)
    def footprint(mk: () => DataFrame, fams: Seq[String]): Long = {
      val df = mk(); df.collect() // count() would execute a DIFFERENT plan
      allNodes(df.queryExecution.executedPlan)
        .filter(n => n.isInstanceOf[LeafExecNode] &&
          fams.exists(f => n.toString.contains(s"$idx/$f")))
        .flatMap(n => n.metrics.get("filesSize")
          .orElse(n.metrics.get("staticFilesSize")).map(_.value))
        .sum
    }
    val tBuild = { val t0 = System.nanoTime()
      sources.IndexStore.build(spark, sfDir, idx)
      (System.nanoTime() - t0) / 1e9 }
    println(f"[probe] index build        ${tBuild}%6.2f s (once, amortized)")
    // r12 verdict item 7: the coarse-quantizer BUILD counters, so the
    // K~sqrt(n) + sampled-training fix is measurable round-over-round
    // (train_rows = min(n, 16K) k-means inputs per round; assign_rows
    // = n*K distance evaluations in the one full-corpus assignment)
    locally {
      import org.apache.spark.sql.functions.col
      val nV = operators.Similarity.nVecs(spark, sfDir)
      val kC = operators.Similarity.coarseK(nV)
      val trainRows = operators.VectorAgg.trainingSample(
        Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding")),
        nV, operators.VectorAgg.trainTarget(nV, kC)).count()
      println(s"[probe] build counters     n=$nV K=$kC " +
        s"train_rows=$trainRows assign_rows=${nV * kC.toLong} (n*K)")
    }
    def storedBytes(families: Seq[String]): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      families.map { f =>
        val p = new org.apache.hadoop.fs.Path(s"$idx/$f")
        p.getFileSystem(conf).getContentSummary(p).getLength
      }.sum
    }
    val pairs: Seq[(String, Seq[String], () => DataFrame, () => DataFrame)] =
      Seq(
        // footprint families are the PER-VECTOR tables — the O(1)
        // side tables (centroids, codebook, params) are broadcast
        // and re-scanned per join, which would pollute the fraction
        ("s02 lsh", Seq("lsh"),
          () => sources.IndexStore.probeLsh(spark, sfDir, idx),
          () => operators.Similarity.annLsh(spark, sfDir)),
        ("s03 ivf", Seq("cells"),
          () => sources.IndexStore.probeIvf(spark, sfDir, idx),
          () => operators.Similarity.annIvf(spark, sfDir)),
        ("s06 ivfpq", Seq("pqcodes"),
          () => sources.IndexStore.probeIvfPq(spark, sfDir, idx),
          () => operators.Similarity.annIvfPq(spark, sfDir)),
        ("s08 sq8", Seq("sq8codes"),
          () => sources.IndexStore.probeSq8(spark, sfDir, idx),
          () => operators.Similarity.annSq8(spark, sfDir)),
        // same stored family as s08 — the fraction gap between the
        // two rows IS the r12 cell-pruning win (s08 full-scan by
        // design, s24 nprobe/K of the same bytes)
        ("s24 ivfsq8", Seq("sq8codes"),
          () => sources.IndexStore.probeIvfSq8(spark, sfDir, idx),
          () => operators.Similarity.annIvfSq8(spark, sfDir)),
        ("s16 graph", Seq("graph"),
          () => sources.IndexStore.probeGraphExpand(spark, sfDir, idx),
          () => operators.Similarity.graphExpandSearch(spark, sfDir)),
        ("d11 dedup", Seq("mhkeys", "mhsigs"),
          () => sources.IndexStore.probeDedup(spark, sfDir, idx),
          () => operators.Dedup.incrementalLsh(spark, sfDir)),
        ("s17 postings", Seq("postings", "df"), {
          // fix the probed term set OUTSIDE the measured frame
          import spark.implicits._
          val terms = spark.read.parquet(s"$idx/postings")
            .select(org.apache.spark.sql.functions.col("term"))
            .distinct().orderBy("term").limit(5)
            .as[String].collect().toSeq.toDF("term")
          () => sources.IndexStore.probeIndex(spark, idx, terms)
        },
          () => operators.Similarity.impactIndex(spark, sfDir)))
    pairs.foreach { case (name, fams, probe, inline) =>
      val tp = time(probe); val ti = time(inline)
      val pb = footprint(probe, fams); val tot = storedBytes(fams)
      val pct = if (tot == 0) 0.0 else 100.0 * pb / tot
      println(f"[probe] $name%-14s probe=${tp}%6.3f s  inline=${ti}%6.3f s  " +
        f"probe read ${pb / 1024}%6d of ${tot / 1024}%7d stored KiB " +
        f"($pct%5.1f%%)")
      // drop frames the row's operators cached (probe seeds, delta
      // sigs) so rows measure independently instead of accumulating
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
