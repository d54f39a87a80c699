package graft.streaming

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of t28 (operators.TextOps.sourceDrift): the
  * per-INGEST distribution-drift alarm. Each arriving micro-batch's
  * per-source hashed-unigram distribution is scored against a FROZEN
  * lake corpus model — "does what src X just delivered still look
  * like the corpus?" — which is how the monitor actually runs in
  * production: the alarm must fire on the DELIVERY that broke (a
  * scraper pushing error pages, an encoding gone bad), not after the
  * lake has absorbed it.
  *
  *  - the model (per-bucket corpus counts `kall` + the 1-row total)
  *    is computed ONCE from the lake and cached; it is
  *    CAPACITY-BOUNDED at the hash-bucket space (t22's documented
  *    broadcast-safety contract), so holding it per batch is safe at
  *    any lake size;
  *  - batch counting and scoring run through the EXACT batch code
  *    paths (TextOps.driftCounts / TextOps.driftScore) inside
  *    foreachBatch — a delivery is scored within its own micro-batch
  *    against the static model, so there is NO cross-batch state;
  *  - a batch bucket the lake never saw scores with kall = 0 —
  *    maximal per-token divergence (the driftScore left-join seam):
  *    off-vocabulary content pushes the alarm UP instead of being
  *    dropped by an inner join, exactly the desired failure mode;
  *  - the sink OVERWRITES its own batch_id=<id> partition per
  *    delivery (the IncrementalLshStream idempotency contract), so
  *    at-least-once re-delivery cannot duplicate alarm rows.
  *
  * Seam (documented, matching DsirStream's): the batch operator
  * scores each source against the corpus INCLUDING that source; the
  * stream scores a delivery against the lake-only model. Parity is
  * therefore "stream == batch scorer under the same frozen model"
  * (spec-asserted), not "stream == t28 over lake ∪ delta" — and the
  * lake-only model is the semantics a drift alarm wants anyway (the
  * baseline must not absorb the anomaly it is measuring).
  */
object DriftStream {

  /** Incoming documents (the testdata documents schema). */
  val schema = IncrementalLshStream.schema

  val Buckets = 10000

  /** Static lake model: per-bucket corpus counts + the 1-row token
    * total, both cached — every micro-batch probes them.
    */
  def lakeModel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = TextOps.driftCounts(
        Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0), Buckets)
      .groupBy(col("b")).agg(sum(col("k")).cast("long").as("kall"))
      .cache()
    val ta = all.agg(sum(col("kall")).cast("long").as("ta")).cache()
    (all, ta)
  }

  /** One micro-batch scored against the frozen model — the shared
    * batch code path, so stream/batch parity holds by construction.
    */
  def scoreBatch(batch: DataFrame, all: DataFrame, ta: DataFrame): DataFrame =
    TextOps.driftScore(TextOps.driftCounts(batch, Buckets), all, ta)

  /** One micro-batch, written idempotently into its own batch_id
    * partition (overwrite, never append — at-least-once re-delivery).
    */
  def writeBatch(batch: DataFrame, all: DataFrame, ta: DataFrame,
      outPath: String, batchId: Long): Unit = {
    // the counts frame feeds the per-source totals AND the model
    // probe of one plan — cache it (it is capacity-bounded)
    val sc = TextOps.driftCounts(batch, Buckets).cache()
    try TextOps.driftScore(sc, all, ta)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { sc.unpersist(); () }
  }

  /** Drain `inDir` (arriving deliveries) against the lake model from
    * `dir`, landing per-source drift rows under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val (all, ta) = lakeModel(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, all, ta, outPath, id)
      }
      .start()
  }
}
