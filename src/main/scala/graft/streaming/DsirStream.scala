package graft.streaming

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of t22 (operators.TextOps.dsirWeights): ARRIVING
  * documents are importance-scored against a STATIC hashed-bigram
  * model trained once from the lake — the production DSIR shape:
  * the target/raw model trains offline on the curated corpus, ingest
  * scores online and routes keep/cull.
  *
  *  - the model (per-bucket target/raw counts + split totals) is
  *    computed ONCE from the lake and cached; it is capacity-bounded
  *    at the 10k hash-bucket space (TextOps.dsirModel), so holding
  *    and broadcasting it per batch is safe at any lake size;
  *  - scoring runs through the EXACT batch code path
  *    (TextOps.dsirScore) inside foreachBatch — a delta doc arrives
  *    in exactly one micro-batch, its bigram counts are batch-local,
  *    and the frozen model makes the score a pure function of the
  *    doc ⇒ no cross-batch state at all;
  *  - a bucket the lake model never saw scores at the add-one
  *    smoothing floor (the dsirScore left-join seam) — arriving
  *    out-of-vocabulary content is scored, not dropped;
  *  - the sink OVERWRITES its own batch_id=<id> partition per
  *    delivery (the IncrementalLshStream idempotency contract), so
  *    foreachBatch's at-least-once re-delivery cannot duplicate rows.
  *
  * Seam (documented, matching the batch/stream contracts of d11/t19):
  * the batch operator trains its model on the WHOLE corpus including
  * the docs it scores; the stream scores against the lake-only model.
  * Parity is therefore "stream == batch scoring under the same frozen
  * model" (spec-asserted via dsirScore), not "stream == t22 on
  * lake ∪ delta" — re-training per batch would re-aggregate the lake
  * every trigger, exactly the non-incremental shape streaming exists
  * to avoid.
  */
object DsirStream {

  /** Incoming documents (the testdata documents schema). */
  val schema = IncrementalLshStream.schema

  val Buckets = 10000

  /** Static lake model: per-bucket (ct, cr) + 1-row totals, both
    * cached — every micro-batch probes them.
    */
  def lakeModel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val bs = TextOps.dsirModel(TextOps.dsirDocBuckets(
      Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0), Buckets))
      .cache()
    val tot = bs.agg(sum(col("ct")).cast("long").as("tt"),
      sum(col("cr")).cast("long").as("tr")).cache()
    (bs, tot)
  }

  /** One micro-batch scored against the frozen model — the shared
    * batch code path, so stream/batch parity holds by construction.
    */
  def scoreBatch(batch: DataFrame, bs: DataFrame, tot: DataFrame): DataFrame =
    TextOps.dsirScore(batch, TextOps.dsirDocBuckets(batch, Buckets), bs, tot)

  /** One micro-batch, written idempotently into its own batch_id
    * partition (overwrite, never append — at-least-once re-delivery).
    */
  def writeBatch(batch: DataFrame, bs: DataFrame, tot: DataFrame,
      outPath: String, batchId: Long): Unit = {
    val b = batch.cache() // referenced twice: bucket side + doc-list side
    try scoreBatch(b, bs, tot)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving delta docs) against the lake model from
    * `dir`, landing scores under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val (bs, tot) = lakeModel(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, bs, tot, outPath, id)
      }
      .start()
  }
}
