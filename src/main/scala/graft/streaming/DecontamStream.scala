package graft.streaming

import graft.{TableStats, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming twin of t33 (operators.Dedup.semanticDecontam): ARRIVING
  * train-split vectors are semantically decontaminated against the
  * FROZEN lake benchmark at ingest — the production gate that keeps a
  * paraphrased benchmark twin from ever entering the training lake,
  * run where it is cheapest (per arriving batch, not per corpus
  * rebuild).
  *
  *  - the benchmark side (vec_id % 50 == 0, t12's split convention)
  *    is static: its embeddings are read once and cached — every
  *    micro-batch probes the same 2 %-of-lake frame;
  *  - the band LAYOUT is frozen on the DRIVING session from the
  *    lake's vector count ([[TableStats]] seam) and closed over —
  *    the StoreIngestStream rule: deriving inside the foreachBatch
  *    closure would re-count the lake per batch on the CLONED
  *    session and could diverge from the layout the index was built
  *    with;
  *  - per-batch batch semantics are EXACT: an arriving vector lands
  *    in exactly one micro-batch, the bench side never changes, and
  *    the per-vec argmax needs no cross-batch state — so each batch
  *    runs [[Dedup.semanticFlagsAgainst]] verbatim (spec-asserted
  *    parity with the batch core under the same frozen layout);
  *  - the sink is IDEMPOTENT under foreachBatch's at-least-once
  *    contract: each delivery OVERWRITES its own batch_id=<id>
  *    partition (double-delivery spec-asserted).
  */
object DecontamStream {

  /** Incoming vectors (the testdata embeddings schema). */
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** The frozen benchmark side of the lake at `dir` (cache it — every
    * micro-batch probes it).
    */
  def benchFrame(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 50 === 0)
      .cache()

  /** The frozen band layout: the LAKE count through the TableStats
    * seam, priced once on the driving session.
    */
  def frozenBands(s: SparkSession, dir: String): Seq[Seq[Int]] =
    Dedup.adaptiveBands(TableStats.rowCount(s, dir, "embeddings")(
      Tables.embeddings(s, dir).count()))

  /** One micro-batch: run the t33 core against the frozen benchmark,
    * report EVERY arriving vector (kept or flagged with its best
    * benchmark match).
    */
  def classifyBatch(batch: DataFrame, bench: DataFrame,
      bands: Seq[Seq[Int]]): DataFrame = {
    val flags = Dedup.semanticFlagsAgainst(
        batch.select(col("vec_id"), col("embedding")), bench, bands)
      .select(col("vec_id").as("fid"), col("dup_of"), col("cos_bp"))
    batch.select(col("vec_id"))
      .join(flags, col("vec_id") === col("fid"), "left")
      .select(col("vec_id"),
        when(col("dup_of").isNotNull, "benchmark_twin")
          .otherwise("kept").as("status"),
        col("dup_of"), col("cos_bp"))
  }

  /** One micro-batch, written idempotently into its own batch_id
    * partition. The batch frame is cached (classifyBatch references
    * it twice — band-key side and report side) and the TopK/rewrite
    * extensions are installed on the batch's CLONED session (the
    * foreachBatch rule — the driving session's install does not
    * carry over).
    */
  def writeBatch(batch: DataFrame, bench: DataFrame, bands: Seq[Seq[Int]],
      outPath: String, batchId: Long): Unit = {
    graft.plans.GraftExtensions.install(batch.sparkSession)
    val b = batch.cache()
    try classifyBatch(b, bench, bands)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving train-split vectors) against the lake in
    * `dir`, landing per-vector decontamination verdicts under
    * `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val bench = benchFrame(s, dir)
    val bands = frozenBands(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, bench, bands, outPath, id)
      }
      .start()
  }
}
