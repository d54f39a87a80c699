package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Output contract (the round-4…6 truncated-capture incidents are why
  * this is explicit):
  *  - the FULL document (per-query min + both raw runs + plan-health
  *    metrics + environment) is written to SPARK_GRAFT_BENCH_OUT
  *    (default /tmp/graft_bench.json) — the machine-readable channel;
  *  - the FINAL stdout line is a COMPACT one-line JSON
  *    `{"total_s":…,"failed":…,"wall_s":…,"load":[…],"q":{…}}` small
  *    enough to survive a tail capture intact, so a driver that only
  *    keeps the last few KB of stdout still gets parseable numbers.
  *  - `load` = JVM system load average at [start, end] and `wall_s` =
  *    whole-process wall time, so a run taken on a loaded machine is
  *    self-evident from the artifact (r6's capture showed a phantom 8×
  *    regression that was just a busy host).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    val spark = Sessions.local(cpus) // the shared session contract
    Sessions.warm(spark, sfDir)
    // min of two runs per query: the first pays one-off plan/codegen
    // compilation, the second measures steady-state data work. A
    // failing query is recorded as -1 (sentinel), never as a
    // normal-looking elapsed-until-crash number. Queries run in
    // SORTED key order — SparkEntry.queries is a HashMap, and letting
    // map order decide who pays shared warm-up costs made unchanged
    // queries look faster/slower round-over-round (r2's phantom
    // q33/p09 regressions). Both raw runs are emitted alongside the
    // min so compile-vs-steady-state artifacts are visible in the
    // JSON itself.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (name, if (times.exists(_ < 0)) -1.0 else times.min, times)
    }

    // ---- plan-health observability (untimed) ----------------------
    // TopKPerKey trim ratio: collect() executes the query's OWN
    // QueryExecution, so the exec nodes (and their SQLMetrics) are
    // reachable afterwards — in/out of the partial phase IS the
    // pre-shuffle trim, the number that must stay small at 100 TB.
    val topkQueries = Seq("r03_topn_per_group", "t09_tfidf", "s01_ann_bruteforce")
    val topkStats = topkQueries.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        graft.plans.PlanMetrics.topKPartialStats(df).map(name -> _)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] topk metrics for $name failed: ${e.getMessage}")
        None
      }
    }
    // Near-dup candidate-pair counts: the d02–d06 pre-verification
    // workload. Growth vs corpus size is the linearity signal the
    // scale harness asserts; here it's tracked round-over-round.
    val candCounts = Seq(
      "d02_minhash_lsh" -> (() => operators.Dedup.minhashLshCandidates(spark, sfDir)),
      "d03_simhash" -> (() => operators.Dedup.simhashCandidates(spark, sfDir)),
      "d04_ngram_jaccard" -> (() => operators.Dedup.ngramJaccardCandidates(spark, sfDir)),
      "d05_embedding_dup" -> (() => operators.Dedup.embeddingDupCandidates(spark, sfDir)),
      "d06_fuzzy_match" -> (() => operators.Dedup.fuzzyMatchCandidates(spark, sfDir)),
      "d13_multiblock_simhash" -> (() => operators.Dedup.multiblockSimhashCandidates(spark, sfDir)),
      // d14's one-sided prefix generator (r11 item 2's other consumer)
      "d14_containment" -> (() => operators.Dedup.containmentCandidates(spark, sfDir)),
      // the ANN probe workloads (r11 items 1+7): candidates each gated
      // query scores — with the adaptive layouts these stay ~|Q|·const
      // as the corpus grows; a regression here is a layout regression
      "s02_probe" -> (() => operators.Similarity.lshProbeCandidates(spark, sfDir)),
      "s03_probe" -> (() => operators.Similarity.ivfProbeCandidates(spark, sfDir)),
      // d18's fold workload: delta-incident VERIFIED edges (post
      // matches ≥ 8) — the merge's input volume, delta-bounded
      "d18_delta_edges" -> (() => operators.Dedup.incrementalClusterEdges(spark, sfDir))
    ).flatMap { case (name, mk) =>
      try Some(name -> mk().count())
      catch { case e: Throwable =>
        System.err.println(s"[bench] cand count for $name failed: ${e.getMessage}")
        None
      }
    }

    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def fmt3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, ts) =>
      s"\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val loadEnd = osBean.getSystemLoadAverage
    val wallS = (System.nanoTime() - wall0) / 1e9
    val topkJson = topkStats.map { case (k, (in, out, fl)) =>
      s"\"" + k + s"\":{\"partial_in\":$in,\"partial_out\":$out," +
        s"\"flushes\":$fl}"
    }.mkString("{", ",", "}")
    val candJson = candCounts.map { case (k, n) => s"\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val envJson =
      s"""{"cpus":$cpus,"sys_cpus":${Runtime.getRuntime.availableProcessors},""" +
        s""""load_avg":[${fmt(loadStart)},${fmt(loadEnd)}],"wall_s":${fmt(wallS)}}"""
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs":$runs,"failed":$nFailed,"sf":"$sfDir","env":$envJson,"topk":$topkJson,"cand_pairs":$candJson}"""
    println(json)
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    // Tail-capture contract (r7 verdict #1): the driver keeps only the
    // LAST ~2,000 chars of stdout. At 89 queries the per-query map alone
    // is ~2.5 KB, so a single compact line put the aggregate header at
    // the FRONT — exactly the part a bounded tail truncates (five rounds
    // of "parsed": null, two phantom-regression incidents). Order of
    // emission is therefore the contract: per-query map FIRST (may be
    // truncated from the front, that's fine — the full copy is in
    // SPARK_GRAFT_BENCH_OUT), then a ≤200-char aggregate line as the
    // ABSOLUTE last stdout line so any tail ≥200 chars keeps it whole.
    val compactQ = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    println(s"""{"q":$compactQ}""")
    val aggregate =
      s"""{"total_s":${fmt3(total)},"failed":$nFailed,"n_q":${results.size},"wall_s":${fmt3(wallS)},"load":[${fmt3(loadStart)},${fmt3(loadEnd)}],"sf":"$sfDir"}"""
    println(aggregate)
  }
}
