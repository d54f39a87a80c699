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
  * lag, not an error); an AvailableNow drain needs one follow-up
  * trigger for the final watermark's timeouts, inherent to
  * event-time session closure.
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
}
