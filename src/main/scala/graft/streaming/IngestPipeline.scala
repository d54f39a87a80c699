package graft.streaming

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The COMPOSED document-ingest path (twin #31) — CorpusPipeline's
  * streaming counterpart: arriving raw documents pass d16's bloom +
  * exact dedup gate, survivors embed through t35's hashing-trick
  * projection and fold into every IndexStore family + the kNN graph,
  * and the gate's per-doc decision audit lands next to the data —
  * one stream turns raw text into a deduped, queryable vector store.
  *
  * Composes three already-proven seams (each spec'd in isolation;
  * the pipeline spec proves the composition):
  *
  *   BloomGateStream.classifyBatch   the d16 gate against the
  *                                   evolving bloom store (own-delta
  *                                   excluded — re-delivery exact)
  *   EmbedStream.embedBatch          t35's deterministic embedder
  *   IndexStore.foldBatch            one call, every vector family
  *
  * Admission rule: a doc is admitted iff its content is NOT already
  * in the store (exact_dup — bloom hits are resolved by the exact
  * check the gate already carries) AND it is the smallest doc_id of
  * its content hash WITHIN the batch (d10's first-in-batch rule —
  * without it a batch-internal twin pair would both pass, since the
  * gate excludes the batch's own deltas). Only ADMITTED docs fold
  * into the bloom store and the index, so the store stays exactly
  * "lake ∪ admitted" — a dropped duplicate's content is already
  * represented.
  *
  * Idempotency: every write is a per-batch-id overwrite partition;
  * the bloom fold is union-idempotent; IndexStore deltas replace on
  * re-delivery; classification excludes the batch's own bloom deltas
  * — so a crash anywhere between the audit write and the last fold
  * replays to the identical state.
  *
  * Both stores must exist before the stream starts: IndexStore.build
  * for the vector families (the fold encodes against STORED
  * artifacts), and the bloom store is seeded from the lake here if
  * absent. m and the graph band layout are frozen on the driving
  * session (the cloned-session rule).
  */
object IngestPipeline {

  /** One micro-batch: gate → audit → embed admitted → fold store +
    * bloom. `m` and `bands` are the frozen layout constants.
    */
  def writeBatch(batch: DataFrame, dir: String, idxDir: String,
      bloomDir: String, outPath: String, batchId: Long, m: Long,
      bands: Seq[Seq[Int]], dims: Int = 64): Unit = {
    val ss = batch.sparkSession
    // referenced by the gate, the first-in-batch rule, the embed and
    // both bloom folds
    val hashed = batch
      .select(col("doc_id"), col("text"),
        md5(graft.functions.Text.normalize(col("text"))).as("ch"))
      .cache()
    try {
      val gate = BloomGateStream.classifyBatch(hashed,
        BloomGateStream.readBits(ss, bloomDir, Some(batchId)),
        BloomGateStream.readHashes(ss, bloomDir, Some(batchId)), m)
      val firstInBatch = hashed.groupBy(col("ch"))
        .agg(min(col("doc_id")).as("first_doc_id"))
      val decisions = gate
        .join(hashed.select(col("doc_id"), col("ch")), "doc_id")
        .join(firstInBatch, "ch")
        .select(col("doc_id"), col("n_hit"), col("bloom_hit"),
          col("exact_dup"),
          (!col("exact_dup") && col("doc_id") === col("first_doc_id"))
            .as("admitted"))
        .cache()
      try {
        decisions.write.mode("overwrite")
          .parquet(s"$outPath/batch_id=$batchId")
        val admitted = hashed
          .join(decisions.filter(col("admitted")).select(col("doc_id")),
            "doc_id")
          .cache()
        try {
          graft.sources.IndexStore.foldBatch(ss, dir, idxDir,
            EmbedStream.embedBatch(
              admitted.select(col("doc_id"), col("text")), dims),
            batchId, Some(bands))
          admitted
            .select(explode(Dedup.bloomPositions(col("ch"), m)).as("pos"))
            .distinct()
            .write.mode("overwrite")
            .parquet(s"$bloomDir/pos/delta_id=b$batchId")
          admitted.select(col("ch")).distinct()
            .write.mode("overwrite")
            .parquet(s"$bloomDir/ch/delta_id=b$batchId")
        } finally { admitted.unpersist(); () }
      } finally { decisions.unpersist(); () }
    } finally { hashed.unpersist(); () }
  }

  /** Drain `inDir` (arriving documents) through gate → embed → store:
    * decision audit under `outPath`, vectors into `idxDir` (must be
    * IndexStore.build-t), bloom state under `bloomDir` (seeded from
    * `dir`'s lake if absent).
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      idxDir: String, bloomDir: String, outPath: String,
      checkpoint: String, dims: Int = 64,
      headroom: Int = 8): StreamingQuery = {
    val meta = new Path(s"$bloomDir/meta")
    val fs = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) BloomGateStream.seedFromLake(s, dir, bloomDir,
      headroom)
    // frozen on the driving session (the cloned-session rule)
    val m = BloomGateStream.frozenM(s, bloomDir)
    val bands = GraphIngestStream.lakeBands(s, dir)
    s.readStream.schema(EmbedStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, dir, idxDir, bloomDir, outPath, id, m, bands,
          dims)
      }
      .start()
  }
}
