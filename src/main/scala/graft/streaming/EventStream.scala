package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.8): the events table as
  * an unbounded stream. The transform is shared with the batch twin
  * (Relational.tumblingWindow semantics) so correctness is checked by
  * the w01 oracle and the streaming path by EventStreamSpec.
  */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregation — works on a streaming
    * OR batch DataFrame with the events schema.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** File-source stream over a directory of events parquet. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Wire stream → windowed agg → memory sink; returns the query name
    * to poll `spark.table(name)` from tests.
    */
  def startToMemory(spark: SparkSession, dir: String, name: String) =
    windowedCounts(readEventsStream(spark, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()

  /** Stream-stream join: attribute each purchase to the same user's
    * clicks in the preceding hour. Both sides watermarked so the
    * click state store is bounded (clicks older than purchase-wm −
    * 1 h are evicted) — the canonical attribution join shape.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"), col("value"))
  }

  /** Stream → parquet lake sink: availableNow trigger drains the
    * backlog exactly once (checkpointed) and appends to the output
    * table — the incremental-ingest pattern a 100 TB pipeline uses to
    * land raw events continuously.
    */
  def startToParquet(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String) =
    readEventsStream(spark, inDir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append")
      .start()

  /** Streaming exact dedup — the streaming twin of Dedup.exact:
    * dropDuplicates on event_id bounded by the watermark (state for
    * ids older than the watermark is evicted — the only way exact
    * dedup is viable on an unbounded stream).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")

  /** Streaming twin of r19 (incremental aggregate maintenance): every
    * micro-batch's ALGEBRAIC partials — per-event-type floor-cents
    * sum + count, both mergeable — fold into a persisted aggregate
    * state table: read state, union partials, re-aggregate, publish
    * via a crash-safe temp-dir swap (TableSink.compact's rename
    * dance; the merged frame materializes into the temp dir BEFORE
    * the live state moves, so there is never a read-from/write-to
    * window). Work per batch ∝ |batch| + |groups|, never the history,
    * and the state table IS the materialized view a dashboard reads —
    * the streaming side of r19's merge law. The last-merged batch id
    * lives in a `_batch` file INSIDE the state dir (written into the
    * temp dir before the publish rename), so state and marker commit
    * in ONE atomic rename — a crash between publish and a sibling
    * marker write can never leave "state merged but marker behind"
    * (which would double-count the retried batch). A missing state dir
    * with `__agg_old` present means a crash hit between the two
    * renames of the swap; startup recovery restores `__agg_old` before
    * reading, so history is never silently discarded. foreachBatch is
    * at-least-once within a checkpoint lineage; batchId ≤ last ⇒ skip
    * keeps the merge idempotent under retries.
    */
  def startAggMergeToParquet(spark: SparkSession, inDir: String,
      stateDir: String, checkpointDir: String) =
    readEventsStream(spark, inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val tmp = new org.apache.hadoop.fs.Path(stateDir + "__agg_tmp")
        val old = new org.apache.hadoop.fs.Path(stateDir + "__agg_old")
        // Startup recovery: a crash between rename(state→old) and
        // rename(tmp→state) leaves no state dir but a complete __agg_old.
        // Restore it first — the interrupted batch re-merges on retry.
        if (!fs.exists(statePath) && fs.exists(old)) {
          fs.delete(tmp, true) // tmp (if any) includes the unacked batch
          if (!fs.rename(old, statePath))
            throw new java.io.IOException(
              s"agg merge: could not recover $old -> $statePath")
        }
        def readLong(f: org.apache.hadoop.fs.Path): Option[Long] =
          if (fs.exists(f)) {
            val in = fs.open(f)
            try Some(in.readLong()) finally in.close()
          } else None
        // legacy layout (pre-r8): the marker lived in a SIBLING file,
        // written after the publish. A state dir from that version has
        // no in-dir _batch file — falling back to the sibling stops
        // one already-merged batch from double-merging on upgrade; the
        // next publish writes the in-dir marker and retires the old one.
        val legacyMarker = new org.apache.hadoop.fs.Path(stateDir + "_last_batch")
        val last =
          if (!fs.exists(statePath)) -1L
          else readLong(new org.apache.hadoop.fs.Path(statePath, "_batch"))
            .orElse(readLong(legacyMarker)).getOrElse(-1L)
        if (batchId > last) {
          val partial = batch.groupBy(col("event_type"))
            .agg(sum(floor(col("value") * 100)).cast("long").as("sum_cents"),
              count(lit(1)).as("n_events"))
          // _batch starts with '_' so Spark's parquet reader skips it
          val merged = (if (fs.exists(statePath))
              spark.read.parquet(stateDir).unionByName(partial)
            else partial)
            .groupBy(col("event_type"))
            .agg(sum(col("sum_cents")).as("sum_cents"),
              sum(col("n_events")).as("n_events"))
          merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(tmp.toString)
          val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_batch"), true)
          try out.writeLong(batchId) finally out.close()
          fs.delete(old, true)
          if (fs.exists(statePath) && !fs.rename(statePath, old))
            throw new java.io.IOException(
              s"agg merge: could not move $statePath aside")
          if (!fs.rename(tmp, statePath)) {
            fs.rename(old, statePath) // roll back
            throw new java.io.IOException(s"agg merge: could not publish $tmp")
          }
          fs.delete(old, true)
          fs.delete(legacyMarker, false) // retired by the in-dir marker
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Stream → idempotent keyed merge: every micro-batch lands through
    * TableSink.appendIfAbsent, so re-delivered keys (source replays,
    * checkpoint restarts, overlapping batches) never duplicate rows —
    * the streaming version of the reference's pre-insert
    * invoice_exists check. foreachBatch is exactly where a merge sink
    * belongs in Structured Streaming: the batch DataFrame is bounded,
    * so the anti-join against the table snapshot is well-defined.
    */
  def startMergeToParquet(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, keys: Seq[String]) =
    readEventsStream(spark, inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.TableSink.appendIfAbsent(batch, outDir, keys)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
