package graft.streaming

import graft.functions.Text
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of t17 (operators.TextOps.contaminationExcise):
  * ARRIVING documents are span-decontaminated against the STATIC
  * benchmark shingle set — the production shape of ingest-time
  * decontamination, where the eval suite is a fixed artifact hashed
  * once and every new batch only shingles itself.
  *
  *  - the benchmark set is computed once from the lake dir's
  *    doc_id % 50 == 0 slice and cached — every micro-batch probes it
  *    through a stream-static equi-join shape (stateless);
  *  - the interval merge + rebuild run inside `foreachBatch`: a doc
  *    arrives in exactly one micro-batch and t17's span logic is
  *    per-doc, so per-batch batch semantics give the exact batch-t17
  *    answer with NO cross-batch state;
  *  - the sink is IDEMPOTENT under foreachBatch's at-least-once
  *    contract: each delivery OVERWRITES its own batch_id=<id>
  *    partition directory, so a crash between the sink write and the
  *    checkpoint commit re-delivers the batch into the same path
  *    instead of appending duplicates (spec-asserted by double
  *    delivery of one batch id).
  */
object ExciseStream {

  /** Static benchmark n-gram set from the lake's doc_id % 50 == 0
    * slice (the t12/t17 convention). Cache it — every micro-batch
    * probes it.
    */
  def benchShingles(s: SparkSession, dir: String, n: Int = 4): DataFrame =
    graft.Tables.documents(s, dir)
      .filter(col("doc_id") % 50 === 0)
      .select(Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= n)
      .select(explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"),
        col("t"))
      .select(array_join(slice(col("t"), col("i"), lit(n)), " ").as("shingle"))
      .distinct()
      .cache()

  /** One micro-batch, written idempotently: tokenize the arriving
    * docs ONCE (exciseAgainst references the token frame three times
    * — shingles, rebuild, doc list — so it is cached for the batch),
    * run the shared t17 core, and OVERWRITE the batch's own
    * batch_id partition so re-delivery of the same id cannot
    * duplicate rows.
    */
  def writeBatch(batch: DataFrame, bench: DataFrame, outPath: String,
      batchId: Long, n: Int = 4): Unit = {
    val tk = batch.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    try TextOps.exciseAgainst(tk, bench, n)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { tk.unpersist(); () }
  }

  /** Drain `inDir` (arriving docs, the documents schema) against the
    * benchmark set from `dir`, landing excised docs under `outPath`
    * (one batch_id partition per micro-batch — see [[writeBatch]]).
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val bench = benchShingles(s, dir)
    s.readStream.schema(IncrementalLshStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, bench, outPath, id)
      }
      .start()
  }
}
