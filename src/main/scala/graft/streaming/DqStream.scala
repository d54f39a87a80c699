package graft.streaming

import graft.Tables
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming twin of c05 (operators.Curation.dqSuite): the
  * expectation suite run AS AN INGEST GATE — every arriving delivery
  * of orders is scored by the same six-check battery before anything
  * downstream consumes it, which is where Deequ-style suites actually
  * sit in production (the lake-publish gate, not a nightly report).
  *
  *  - checks run through the EXACT batch code path
  *    (Curation.dqChecks) inside foreachBatch, so stream/batch parity
  *    holds by construction: per-delivery metrics are intra-batch
  *    (row count, completeness, uniqueness, accepted values, range)
  *    plus referential integrity against the STATIC customer dim —
  *    the one cross-table check — which freezes from the lake
  *    (DsirStream's frozen-model contract ⇒ no cross-batch state);
  *  - uniqueness is PER-DELIVERY by design: a key duplicated across
  *    two deliveries is the idempotent-merge sink's business
  *    (TableSink.appendIfAbsent), not the gate's — the gate catches
  *    a producer that double-emits within one file drop;
  *  - a delivery referencing a customer the lake has never seen
  *    fails ref_integrity_customer — exactly the broken-upstream
  *    signal the gate exists to catch before publish;
  *  - the sink OVERWRITES its own batch_id=<id> partition per
  *    delivery (the IncrementalLshStream idempotency contract), so
  *    at-least-once re-delivery cannot duplicate verdict rows.
  */
object DqStream {

  /** Incoming orders (the testdata orders schema). */
  val schema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** Static lake dimension the per-delivery RI check probes — cached
    * ONCE per (session, dir); every micro-batch anti-joins against
    * it. The memo keeps repeated gate starts (or a spec's extra
    * lakeDim call) from stacking duplicate cached copies in a
    * long-lived session (round-10 advice: the suite logged 'Asked to
    * cache already cached data').
    */
  def lakeDim(s: SparkSession, dir: String): DataFrame =
    dimCache.getOrElseUpdate((s, dir),
      Tables.customer(s, dir).select(col("c_custkey")).cache())

  private val dimCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String), DataFrame]

  /** One delivery scored through the shared batch path. */
  def scoreBatch(batch: DataFrame, cust: DataFrame): DataFrame =
    Curation.dqChecks(batch, cust)

  /** One delivery's verdicts, written idempotently into its own
    * batch_id partition (overwrite, never append).
    */
  def writeBatch(batch: DataFrame, cust: DataFrame, outPath: String,
      batchId: Long): Unit = {
    val b = batch.cache() // referenced twice: metric agg + orphan join
    try scoreBatch(b, cust)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving order deliveries) against the customer
    * dim from `dir`, landing per-delivery verdicts under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val cust = lakeDim(s, dir)
    // one file = one delivery = one verdict set: the gate's unit is
    // the producer's file drop, so deliveries never merge into one
    // micro-batch (a clean file must not inherit a bad file's verdict)
    s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, cust, outPath, id)
      }
      .start()
  }
}
