package graft.streaming

import graft.functions.Text
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twin of the c01 curation capstone (operators.Curation):
  * the gate → dedup → sample stages are stateless or
  * watermark-expressible, so an ARRIVING corpus can be curated
  * incrementally with the same per-row semantics the batch query has:
  *
  *   - quality gate: stateless projection/filter (t02's score);
  *   - content dedup: `dropDuplicatesWithinWatermark(content_hash)` —
  *     bounded state (hashes older than the watermark are evicted),
  *     first arrival wins. The batch capstone's keep-BEST argmax
  *     needs the whole group and stays a batch/compaction concern —
  *     the streaming contract is exact-dup suppression within the
  *     watermark horizon, which is what re-delivery/replay produces;
  *   - stratified sample: TextOps.sampleTransform, the SAME stateless
  *     transform t11 and c01 run;
  *   - sink: foreachBatch → TableSink.appendIfAbsent, so checkpoint
  *     restarts and source replays can never duplicate a doc_id —
  *     idempotence end-to-end (dedup bounds state, the merge sink
  *     bounds re-delivery).
  *
  * The t10 pack stage is a per-shard running sum over a total order —
  * not incrementally emittable without reordering history — so
  * packing runs as the batch compaction over the curated lake table,
  * exactly as Curation.curate does.
  */
object CurationStream {

  /** Documents schema + an event-time column for the watermark. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("ts", TimestampType)))

  /** gate → watermarked dedup → sample; works on a streaming (or
    * batch, minus the watermark semantics) DataFrame with `schema`.
    */
  def curatedDocs(docs: DataFrame, minQualityBp: Int = 4000): DataFrame = {
    val qualityBp = round(Text.qualityScore(col("text")) * 10000).cast("long")
    val gated = docs
      .select(col("doc_id"), col("lang"), col("ts"),
        qualityBp.as("quality_bp"),
        md5(Text.normalize(col("text"))).as("content_hash"),
        Text.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .filter(col("quality_bp") >= minQualityBp)
    // dropDuplicatesWithinWatermark is streaming-only (state bounded
    // by the watermark); the batch rendering of the same first-
    // arrival contract is a DETERMINISTIC argmin per content group —
    // (ts, doc_id) struct-min, never dropDuplicates, whose survivor
    // depends on partition order
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("content_hash")
      else
        gated.groupBy(col("content_hash"))
          .agg(min(struct(col("ts"), col("doc_id"), col("lang"),
            col("quality_bp"), col("n_tokens"))).as("m"))
          .select(col("content_hash"), col("m.ts").as("ts"),
            col("m.doc_id").as("doc_id"), col("m.lang").as("lang"),
            col("m.quality_bp").as("quality_bp"),
            col("m.n_tokens").as("n_tokens"))
    TextOps.sampleTransform(deduped)
      .select(col("doc_id"), col("lang"), col("quality_bp"), col("n_tokens"))
  }

  def readDocsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Wire stream → curation → idempotent keyed merge into the lake
    * table; availableNow drains the backlog exactly once.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String) =
    curatedDocs(readDocsStream(spark, inDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.TableSink.appendIfAbsent(batch, outDir, Seq("doc_id"))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
