package graft.streaming

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** s17's incremental-ingest twin (twin #22): arriving documents fold
  * their postings into the persisted impact-ordered index — the WRITE
  * side of a production lexical search stack, where the index is
  * never rebuilt from the corpus per ingest (a Lucene-style segment
  * merge re-expressed as parquet deltas).
  *
  * Index layout (two delta families under `idxDir`):
  *  - `postings/delta_id=*` — each delta holds its OWN top-`cap`
  *    (term, doc_id, tf) postings. Capping per delta is LOSSLESS for
  *    the merged top-cap: tf is fixed per (term, doc) — a posting in
  *    the merged top-cap is necessarily in its own delta's top-cap,
  *    so re-capping the union of capped deltas equals capping the
  *    full union (the monotone-merge property WAND-style segment
  *    merges rely on);
  *  - `df/delta_id=*` — per-delta (term, df) counts; total df is the
  *    SUM over deltas, exact under the d10/d11 ingest contract that
  *    delta doc_ids are disjoint from the lake's (documented on
  *    SelfDedupStream; dedupe-by-doc_id upstream via
  *    TableSink.appendIfAbsent). df must ride its own delta family —
  *    it is NOT derivable from capped postings.
  *
  * Each micro-batch: compute batch postings statelessly through the
  * shared [[Similarity.docTf]] path, fold both delta partitions
  * (overwrite — re-delivery replaces; cap-merge and sum-of-disjoint
  * deltas are idempotent under replacement), then emit the REFRESHED
  * index rows for the terms the batch touched (the changed-segment
  * publish a search cluster ships to query nodes). Parity contract
  * (spec-asserted): after draining, the folded index equals batch
  * [[Similarity.impactIndex]] over lake ∪ deltas — per-doc tf
  * never interacts across docs, so union-of-postings is exact.
  *
  * At 100 TB: term's hash bucket `tb` is the index's partition key —
  * both delta families are written `delta_id=* / tb=*`, a batch
  * touches |batch vocab| buckets, and the read-side re-cap carries a
  * static `tb IN (...)` partition filter (the touched set is ≤
  * [[TermBuckets]] literals), so a refresh reads only the touched
  * buckets of each delta, never the full index.
  * TableSink.compact folds old deltas without changing the
  * min/cap-merge result.
  */
object PostingIngestStream {

  /** Incoming documents (the testdata documents schema). */
  val schema = IncrementalLshStream.schema

  val Cap = 20

  /** Term-hash partition fan-out of both delta families. 64 keeps
    * per-bucket delta files coarse at test scale; at lake scale the
    * same layout runs with a larger fan-out — pruning math is
    * identical.
    */
  val TermBuckets = 64

  /** The delta partition key of a term. */
  def termBucket(term: Column): Column =
    pmod(hash(term), lit(TermBuckets))

  /** Current index state restricted to `terms`: re-cap the postings
    * deltas, sum the df deltas — s17's exact output shape. Reads
    * prune to the touched term buckets (a bounded literal set, so the
    * IN lands as a static PartitionFilter on the delta layout).
    */
  def readIndex(s: SparkSession, idxDir: String, terms: DataFrame,
      cap: Int = Cap): DataFrame = {
    val touched = terms.select(termBucket(col("term")).as("tb"))
    val post = graft.sources.PartitionPrune.filterByKeys(
        s.read.parquet(s"$idxDir/postings"), "tb", touched)
      .join(terms, "term")
    val df = graft.sources.PartitionPrune.filterByKeys(
        s.read.parquet(s"$idxDir/df"), "tb", touched)
      .join(terms, "term")
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
    Similarity.rankPostings(s, post, cap)
      .join(df, Seq("term"))
      .select(col("term"), col("df"), col("rn"), col("doc_id"), col("tf"))
  }

  /** One micro-batch: fold postings + df deltas, publish refreshed
    * rows for touched terms into the batch's own output partition
    * (overwrite — at-least-once re-delivery cannot duplicate).
    */
  def writeBatchFold(batch: DataFrame, idxDir: String, outPath: String,
      batchId: Long, cap: Int = Cap): Unit = {
    val ss = batch.sparkSession // foreachBatch binds a CLONED session
    graft.plans.GraftExtensions.install(ss)
    val tf = Similarity.docTf(batch).cache() // feeds cap fold, df fold, touched set
    try {
      Similarity.rankPostings(ss, tf, cap)
        .select(col("term"), col("doc_id"), col("tf"),
          termBucket(col("term")).as("tb"))
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$idxDir/postings/delta_id=b$batchId")
      tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
        .withColumn("tb", termBucket(col("term")))
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$idxDir/df/delta_id=b$batchId")
      val touched = tf.select(col("term")).distinct()
      readIndex(ss, idxDir, touched, cap)
        .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    } finally { tf.unpersist(); () }
  }

  /** Seed the index from the lake at `dir` (the `delta_id=base`
    * segment of both families, term-bucketed) if absent — shared by
    * the streaming fold and the batch IndexStore build, so the
    * persisted layout has exactly one author.
    */
  def seedFromLake(s: SparkSession, dir: String, idxDir: String,
      cap: Int = Cap): Unit = {
    val base = new org.apache.hadoop.fs.Path(s"$idxDir/postings/delta_id=base")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) {
      val tf = Similarity.docTf(Tables.documents(s, dir)).cache()
      try {
        // df FIRST: the existence guard above checks the postings
        // base, so it must be the LAST family written — a crash
        // between the two writes then re-seeds both on restart
        // instead of permanently skipping df
        tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
          .withColumn("tb", termBucket(col("term")))
          .write.partitionBy("tb").mode("overwrite")
          .parquet(s"$idxDir/df/delta_id=base")
        Similarity.rankPostings(s, tf, cap)
          .select(col("term"), col("doc_id"), col("tf"),
            termBucket(col("term")).as("tb"))
          .write.partitionBy("tb").mode("overwrite").parquet(base.toString)
      } finally { tf.unpersist(); () }
    }
  }

  /** SEGMENT MERGE: fold every delta of both families into a fresh
    * `delta_id=base` — the Lucene-style merge the delta layout is
    * designed around (unchecked delta growth is what makes the
    * read-side union expensive at 100 TB). Exact by the same algebra
    * every read relies on: re-capping re-capped postings is
    * idempotent, and an evicted posting can never re-enter a top-cap
    * (tf is fixed, competition only grows); df sums of sums are sums.
    * Each family swaps in crash-safely via the TableSink two-rename
    * dance; readIndex before == after (spec-asserted), and later
    * folds keep appending deltas against the merged base.
    */
  def compact(s: SparkSession, idxDir: String, cap: Int = Cap): Unit = {
    val merged = Similarity.rankPostings(s,
        s.read.parquet(s"$idxDir/postings")
          .select(col("term"), col("doc_id"), col("tf")), cap)
      .select(col("term"), col("doc_id"), col("tf"),
        termBucket(col("term")).as("tb"))
    graft.sources.TableSink.replaceDir(s, s"$idxDir/postings") { tmp =>
      merged.write.partitionBy("tb").parquet(s"$tmp/delta_id=base")
    }
    val df = s.read.parquet(s"$idxDir/df")
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
      .withColumn("tb", termBucket(col("term")))
    graft.sources.TableSink.replaceDir(s, s"$idxDir/df") { tmp =>
      df.write.partitionBy("tb").parquet(s"$tmp/delta_id=base")
    }
  }

  /** Drain `inDir` (arriving docs) into the index seeded from the
    * lake at `dir`, publishing refreshed term segments under
    * `outPath`.
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String, idxDir: String,
      cap: Int = Cap): StreamingQuery = {
    seedFromLake(s, dir, idxDir, cap)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchFold(batch, idxDir, outPath, id, cap)
      }
      .start()
  }
}
