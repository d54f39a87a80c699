package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming twin of Relational.concurrency (r30, twin #24): the
  * hourly session-overlap profile maintained at ingest, stacked on
  * the Sessionizer — closed sessions stream out of
  * flatMapGroupsWithState (each emitted EXACTLY once: on gap-close
  * or watermark timeout), every batch explodes its closed sessions
  * into the hours they span and folds (hour, user) grains into a
  * per-batch-id partition; the live profile is the partition
  * aggregate.
  *
  * The grain choice is the point: r30 reports n_sessions AND
  * n_users per hour, and a distinct-user count is NOT sum-mergeable
  * (a user whose two sessions close in different batches but touch
  * the same hour would double-count). Folding at the (hour, user)
  * grain — the finest grain every output column is mergeable from —
  * makes both columns exact: n_sessions = Σ counts, n_users =
  * distinct users over the folded grains (bounded by touched
  * (hour, user) combos, itself ≤ the session-hour explode volume).
  * This is the r19 agg-merge law plus the pick-your-partial-grain
  * rule every incremental rollup lives by.
  *
  * Parity contract (spec-asserted): over events whose sessions have
  * all CLOSED (watermark past last_ts + gap), the read-side profile
  * equals batch r30 exactly — both count each session in each hour
  * it spans, and closed-session emission is exactly-once. Sessions
  * still open contribute nothing yet (a live dashboard's inherent
  * lag, not an error). Event-time session closure is
  * watermark-driven, so a plain drain leaves the last gap+delay of
  * sessions open; [[drainToParquet]] closes them inside one call via
  * a watermark-advancing sentinel (r10 verdict item 4).
  */
object ConcurrencyStream {

  /** One batch of CLOSED sessions → (hour, user) grains in the
    * batch's own partition (overwrite — re-delivery replaces).
    */
  def writeBatch(sessBatch: DataFrame, outPath: String,
      batchId: Long): Unit =
    sessBatch.select(col("user_id"),
        explode(sequence(
          expr("unix_timestamp(session_start) DIV 3600"),
          expr("unix_timestamp(session_end) DIV 3600"))).as("hour_id"))
      .groupBy(col("hour_id"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n"))
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** The folded (hour, user) grain shape writeBatch lands. */
  val grainSchema: StructType = StructType(Seq(
    StructField("hour_id", LongType),
    StructField("user_id", LongType),
    StructField("n", LongType)))

  /** The live profile — r30's exact output shape over every closed
    * session folded so far; an empty profile (not an
    * AnalysisException) when no batch has landed yet, so a dashboard
    * may poll a freshly started stream.
    */
  def readProfile(s: SparkSession, outPath: String): DataFrame =
    BatchReads.batches(s, outPath, grainSchema)
      .groupBy(col("hour_id"))
      .agg(sum(col("n")).cast("long").as("n_sessions"),
        countDistinct(col("user_id")).cast("long").as("n_users"))
      .orderBy(col("hour_id"))

  /** Drain `inDir` (arriving events) through the Sessionizer, folding
    * hour grains under `outPath`. Default micro-batch trigger: the
    * caller drives with processAllAvailable / stop (event-time
    * timeouts need follow-up triggers to fire — see class doc).
    */
  def startToParquet(spark: SparkSession, inDir: String, outPath: String,
      checkpoint: String): StreamingQuery = {
    val src = spark.readStream.schema(EventStream.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    Sessionizer.sessionize(spark, src).toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, outPath, id)
      }
      .start()
  }

  /** Reserved watermark-sentinel user id. Its session is always the
    * stream's last and thus never closes, so [[DrainUser]] can never
    * reach the folded profile.
    */
  val DrainUser: Long = Long.MaxValue

  /** TERMINAL drain (r10 verdict item 4): ingest everything under
    * `inDir` AND close every real session in the same call — no
    * manual follow-up trigger. A drained backlog leaves the watermark
    * at max(ts) − delay, so sessions ending within the last
    * gap+delay stay open BY SEMANTICS until event time advances; the
    * standard stream-system move is an explicit watermark-advancing
    * heartbeat ("punctuation"). This drain appends two [[DrainUser]]
    * heartbeat events past max(ts)+gap+delay — the first advances
    * the watermark beyond every real session's timeout, the second
    * triggers a batch under that watermark so the timeouts fire —
    * then stops. The sentinel's own session ends the run open, so it
    * is never emitted and cannot contaminate the profile
    * (spec-asserted). The heartbeats land in a SIBLING sentinel dir
    * `<inDir>-drain` unioned into the stream's read glob (r11
    * advice: writing them into `inDir` itself put synthetic rows in
    * front of every OTHER consumer of the event dir — batch
    * operators, a restarted stream); `inDir` is never modified, so
    * the drain is safely re-runnable against the same events.
    */
  def drainToParquet(spark: SparkSession, inDir: String, outPath: String,
      checkpoint: String): Unit = {
    // derive the sibling from normalized Path components (r12 advice:
    // raw s"$inDir-drain" on a trailing-slash inDir yields a CHILD
    // dir inside inDir — re-contaminating it — while the glob points
    // at a nonexistent sibling and processAllAvailable hangs)
    val ip = new org.apache.hadoop.fs.Path(inDir)
    val dp = new org.apache.hadoop.fs.Path(ip.getParent,
      ip.getName + "-drain")
    val drainDir = dp.toString
    // the glob source needs both branches to exist at start; the
    // alternation must sit in the LEAF component — a path STARTING
    // with '{' parses as relative and matches nothing
    dp.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dp)
    val glob = new org.apache.hadoop.fs.Path(ip.getParent,
      s"{${ip.getName},${dp.getName}}").toString
    val q = startToParquet(spark, glob, outPath, checkpoint)
    try {
      q.processAllAvailable()
      val maxTs = spark.read.schema(EventStream.schema).parquet(inDir)
        .agg(max(col("ts"))).collect().head.getTimestamp(0)
      if (maxTs != null) {
        // gap + watermark delay + 1 min of slack
        val horizonMs = Sessionizer.GapMs + 11 * 60 * 1000L
        (1 to 2).foreach { k =>
          // watermarks update at batch END: delivery 1 advances it,
          // delivery 2 runs a batch under it so timeouts fire
          spark.createDataFrame(Seq((Long.MaxValue - k,
              new java.sql.Timestamp(maxTs.getTime + horizonMs + k * 60000L),
              DrainUser, "drain", 0.0, "{}")))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(1).write.mode("append").parquet(drainDir)
          q.processAllAvailable()
        }
      }
    } finally q.stop()
  }
}
