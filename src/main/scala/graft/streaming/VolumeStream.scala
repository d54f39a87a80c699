package graft.streaming

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** r34's ingest twin (twin #32) — live volume/freshness
  * observability: each micro-batch folds its (event_type, day) event
  * counts into a per-batch grain partition, and the read side
  * re-derives r34's full anomaly report (mean daily rate,
  * last-day-vs-mean bp, staleness behind the frontier) from the
  * folded grains. Completes the at-ingest monitoring trio next to
  * DqStream (c05 expectations) and DriftStream (t28 distribution
  * drift): DQ says the data is WELL-FORMED, drift says it still
  * LOOKS like yesterday's, volume says it is still ARRIVING.
  *
  * Fold grain: per-day counts are pure sums — associative and
  * commutative, and the per-batch-id OVERWRITE partition makes
  * at-least-once re-delivery replace rather than double-count (the
  * agg-merge law; no countDistinct anywhere in r34, so the day grain
  * is fully mergeable — the ConcurrencyStream rule applied at its
  * easiest). The report itself runs on the TINY folded frame
  * (types × days), never the event stream.
  */
object VolumeStream {

  /** The folded grain rows under `outPath/batch_id=*`. */
  val grainSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("day", DateType),
    StructField("n", LongType)))

  /** One micro-batch's (event_type, day) counts — row-local day
    * derivation + one map-combinable aggregate over the BATCH.
    */
  def grains(batch: DataFrame): DataFrame =
    batch.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** One micro-batch, written idempotently (overwrite its own
    * batch_id partition).
    */
  def writeBatch(batch: DataFrame, outPath: String, batchId: Long): Unit =
    grains(batch).write.mode("overwrite")
      .parquet(s"$outPath/batch_id=$batchId")

  /** The CURRENT r34 report off the folded grains: sum the per-batch
    * day counts (the mergeable grain), then r34's shared rollup. An
    * empty or pre-first-batch store yields an empty report (the
    * BatchReads rule).
    */
  def readReport(s: SparkSession, outPath: String): DataFrame = {
    val daily = BatchReads.batches(s, outPath, grainSchema)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).cast("long").as("n"))
      // feeds both the rollup and the frontier (the r34 contract)
      .cache()
    Relational.volumeReportOf(daily)
  }

  /** Drain `inDir` (arriving events, EventStream.schema) into grain
    * partitions under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, outPath: String,
      checkpoint: String): StreamingQuery =
    s.readStream.schema(EventStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, outPath, id)
      }
      .start()
}
