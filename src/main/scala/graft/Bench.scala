package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  * Emits ONE JSON line to stdout AND writes it to
  * SPARK_GRAFT_BENCH_OUT (default /tmp/graft_bench.json) — sbt
  * decorates stdout with [info] prefixes, so the file is the
  * machine-readable channel for round-over-round tracking.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same optimizer for every query regardless of map order
    graft.plans.GraftExtensions.install(spark)
    // warm the JVM/codegen/parquet-footer caches so per-query numbers
    // measure data work, not first-query JIT latency
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
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
    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, ts) =>
      s"\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs":$runs,"failed":$nFailed,"sf":"$sfDir"}"""
    println(json)
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
