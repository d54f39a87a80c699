package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Streaming twin of Relational.transitionMatrix (r29, twin #23):
  * the journey transition matrix maintained AT INGEST — each arriving
  * event pairs with its user's previous event (carried as per-user
  * state via flatMapGroupsWithState: the one genuinely stateful
  * boundary the frozen-model twins don't have), per-batch pair counts
  * fold into per-batch-id partitions, and the live matrix is the SUM
  * over partitions — exact because count-merge is associative +
  * commutative and the overwrite sink makes re-delivery idempotent
  * (the r19 agg-merge law applied to a matrix).
  *
  * State is ONE (ts, event_id, type) triple per user — constant per
  * key, the cheapest stateful shape there is; the TTL parameter
  * (FunnelStream's pattern, default 30 days of event time) bounds the
  * store at 100 TB of users, at the documented cost that a user
  * returning after expiry starts a fresh chain (the boundary pair is
  * not emitted — a drift SIGNAL, not an error, for journey monitors).
  *
  * Parity contract (spec-asserted): with per-user in-order delivery
  * (the Sessionizer/FunnelStream ingest assumption — append-only
  * event logs deliver this) and no expiry, every consecutive pair is
  * emitted EXACTLY once — batch-internal pairs by the sorted replay,
  * cross-batch pairs by the carried state — so the summed matrix
  * equals batch r29 over the full history, including prob_bp.
  */
object TransitionStream {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  case class St(lastUs: Long, lastId: Long, lastType: String)
  case class Pair(user_id: Long, from_type: String, to_type: String)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  def update(ttlMs: Option[Long])(uid: Long, events: Iterator[Ev],
      state: GroupState[St]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      // stale chain: forget the user — the next event starts fresh
      state.remove()
      return Iterator.empty
    }
    val evs = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var prev = state.getOption
    val out = Seq.newBuilder[Pair]
    evs.foreach { e =>
      prev.foreach(p => out += Pair(uid, p.lastType, e.event_type))
      prev = Some(St(micros(e.ts), e.event_id, e.event_type))
    }
    prev.foreach { p =>
      state.update(p)
      ttlMs.foreach(ttl => state.setTimeoutTimestamp(p.lastUs / 1000L + ttl))
    }
    out.result().iterator
  }

  /** events stream (EventStream.schema) → one Pair row per
    * consecutive-event transition, cross-batch boundaries included.
    */
  def pairs(spark: SparkSession, events: Dataset[_],
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(30))
      ): Dataset[Pair] = {
    import spark.implicits._
    val ttlMs = ttl.map(_.toMillis)
    val src = events.toDF()
    val withWm = ttlMs.fold(src)(_ => src.withWatermark("ts", "10 minutes"))
    withWm.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        ttlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.EventTimeTimeout))(update(ttlMs))
  }

  /** One micro-batch's pair increments, folded to (from, to) counts
    * in the batch's own partition (overwrite — at-least-once
    * re-delivery replaces, and count-merge idempotency under
    * replacement keeps the summed matrix exact).
    */
  def writeBatch(pairBatch: DataFrame, outPath: String,
      batchId: Long): Unit =
    pairBatch.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** The folded (from, to, n) count shape writeBatch lands. */
  val countSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("from_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("to_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))

  /** The live matrix: per-batch counts summed, outgoing shares in bp
    * — r29's exact output shape (the share window runs on the
    * |types|²-bounded merged frame, scale-free); an empty matrix (not
    * an AnalysisException) when no batch has landed yet.
    */
  def readMatrix(s: SparkSession, outPath: String): DataFrame = {
    val m = BatchReads.batches(s, outPath, countSchema)
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).cast("long").as("n"))
    val wFrom = Window.partitionBy(col("from_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    m.withColumn("from_total", sum(col("n")).over(wFrom))
      .withColumn("prob_bp", expr("CAST(n * 10000 DIV from_total AS BIGINT)"))
      .select(col("from_type"), col("to_type"), col("n"), col("prob_bp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Drain `inDir` (arriving events), folding transition counts under
    * `outPath`.
    */
  def startToParquet(spark: SparkSession, inDir: String, outPath: String,
      checkpoint: String,
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(30))
      ): StreamingQuery = {
    // one file = one delivery: chains straddling file drops exercise
    // the carried state (merged batches would hide the boundary path)
    val src = spark.readStream.schema(EventStream.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    pairs(spark, src, ttl).toDF()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, outPath, id)
      }
      .start()
  }
}
