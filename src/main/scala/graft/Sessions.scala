package graft

import org.apache.spark.sql.SparkSession

/** THE place the engine's session contract lives (CLAUDE.md
  * invariants): every harness main builds its session here, so a
  * setting added for one cannot silently miss the others —
  *  - `ansi.enabled=false`: malformed input → null (the reference's
  *    parsers never throw), matching DuckDB TRY_ casts;
  *  - `nanosAsLong=true`: some testdata generations ship events.ts
  *    as parquet TIMESTAMP(NANOS) — read as long, floored to micros
  *    (Tables.events dispatches on the read schema; a MICROS-typed
  *    generation passes through as a plain timestamp cast);
  *  - UTC + shuffle.partitions=cpus (not 200) for local[n] runs;
  *  - graft optimizer rules installed session-wide so every query
  *    sees the same planner regardless of map order.
  */
object Sessions {

  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    spark
  }

  /** Warm the JVM/codegen/parquet-footer caches so first-query
    * timings measure data work, not JIT latency.
    */
  def warm(spark: SparkSession, sfDir: String): Unit =
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
}
