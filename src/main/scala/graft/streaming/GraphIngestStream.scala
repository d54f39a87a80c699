package graft.streaming

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** s15's incremental-ingest twin (twin #26): arriving vectors fold
  * their kNN-graph edges into the persisted graph — the write side of
  * a graph-ANN index (s16's retrieval structure), where the graph is
  * never rebuilt from the corpus per ingest. Completes the
  * IndexStore maintenance trilogy: cells (VectorIngestStream),
  * postings (PostingIngestStream), graph (here).
  *
  * Index layout (three delta families under `idxDir`):
  *  - `graph/delta_id=* / vb=*` — per-delta top-`k` directed edges
  *    `(vec_id, neighbor_id, cos)`, hash-bucketed by src so seed-node
  *    probes prune to their buckets. Per-delta capping is LOSSLESS
  *    for the merged top-k: cos is fixed per (src, dst) pair and an
  *    UNORDERED pair is discovered in exactly ONE delta (the one its
  *    later endpoint arrives in — candidates are "src or dst in this
  *    batch" against vectors seen so far), so re-capping the union of
  *    capped deltas equals capping the full candidate set (the
  *    PostingIngestStream monotone-merge property);
  *  - `gkeys/delta_id=* / kb=*` — the delta's sign-LSH band keys
  *    `(vec_id, band, bucket)` under the FROZEN lake band layout,
  *    hash-bucketed by (band, bucket): a batch's candidate probe
  *    reads only its own keys' buckets (static `kb IN` partition
  *    filter), never the full key index;
  *  - `gvecs/delta_id=*` — the raw vectors, for exact scoring of
  *    later batches' candidate pairs (a key-equality join, linear).
  *
  * Frozen-model seam: the band layout is [[lakeBands]] — d05's
  * corpus-adaptive rule priced ONCE on the lake (the
  * IncrementalLshStream convention; a layout that grew with n would
  * re-bucket every stored vector per batch). Parity contract
  * (spec-asserted): after draining, [[readGraph]] equals the batch
  * [[Similarity.knnEdges]] build over lake ∪ deltas under the same
  * frozen bands.
  *
  * At 100 TB: per batch, one bounded-bucket key probe + one
  * candidate-key shuffle + one vector-key join — work ∝ the batch's
  * collision count, never corpus-shaped; the read-side recap is a
  * key-pruned scan of the touched graph buckets.
  */
object GraphIngestStream {

  /** Arriving embeddings (the testdata embeddings schema). */
  val schema: StructType = VectorIngestStream.schema

  /** Edges kept per src per delta (s15's k). */
  val K = 3

  /** Graph partition fan-out by src (the TermBuckets convention). */
  val GraphBuckets = 32

  /** Band-key partition fan-out. */
  val KeyBuckets = 32

  /** The graph partition key of a src node. */
  def vecBucket(vecId: Column): Column =
    pmod(hash(vecId), lit(GraphBuckets))

  /** The key-index partition key of a band key. */
  def keyBucket(band: Column, bucket: Column): Column =
    pmod(hash(band, bucket), lit(KeyBuckets))

  /** The FROZEN band layout: d05's adaptive rule priced on the lake
    * corpus (via the TableStats seam), fixed for the index's life.
    */
  def lakeBands(s: SparkSession, dir: String): Seq[Seq[Int]] =
    Dedup.adaptiveBands(graft.TableStats.rowCount(s, dir, "embeddings")(
      Tables.embeddings(s, dir).count()))

  /** Current graph state: re-cap the edge deltas per src — s15's
    * exact output shape. `srcIds` (a `vec_id` frame) restricts the
    * read to those nodes' edges: the scan prunes to their hash
    * buckets (a static `vb IN` partition filter — at most
    * [[GraphBuckets]] literals however many ids there are) and the
    * ids themselves restrict via a semi-join (the src set can be
    * batch-collision-sized in the per-batch publish — a collected
    * literal list would be driver-unbounded).
    */
  def readGraph(s: SparkSession, idxDir: String, k: Int = K,
      srcIds: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftExtensions.install(s)
    val all = s.read.parquet(s"$idxDir/graph")
    val pruned = srcIds.fold(all) { idsDf =>
      val ids = idsDf.select(col("vec_id")).distinct()
      graft.sources.PartitionPrune.filterByKeys(all, "vb",
          ids.select(vecBucket(col("vec_id")).as("vb")))
        .join(ids, Seq("vec_id"), "left_semi")
    }
    Similarity.rankEdges(graft.plans.TopK.perKey(
      pruned.select(col("vec_id").as("src"), col("neighbor_id").as("dst"),
        col("cos")),
      Seq(col("src")), Seq(col("cos").desc, col("dst").asc), k))
  }

  /** Seed all three delta families (`delta_id=base`) from the lake if
    * absent — shared by the streaming fold and the batch
    * sources.IndexStore build, so the persisted layout has exactly
    * one author.
    */
  def seedFromLake(s: SparkSession, dir: String, idxDir: String,
      k: Int = K): Unit = {
    val base = new org.apache.hadoop.fs.Path(s"$idxDir/gvecs/delta_id=base")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) {
      val bands = lakeBands(s, dir)
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
      Similarity.knnEdges(s, emb, bands, k)
        .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
          col("cos"), vecBucket(col("src")).as("vb"))
        .write.partitionBy("vb").mode("overwrite")
        .parquet(s"$idxDir/graph/delta_id=base")
      Similarity.bandKeysOf(emb, bands)
        .withColumn("kb", keyBucket(col("band"), col("bucket")))
        .write.partitionBy("kb").mode("overwrite")
        .parquet(s"$idxDir/gkeys/delta_id=base")
      emb.write.mode("overwrite").parquet(base.toString)
    }
  }

  /** One micro-batch: discover the batch's NEW candidate pairs (an
    * endpoint in the batch, the other seen so far — the stored-key
    * probe prunes to the batch's own `kb` buckets), exact-score them,
    * fold per-src top-k edge deltas, then publish the REFRESHED graph
    * rows for every touched src (the changed-segment publish).
    * All three delta partitions are OVERWRITTEN per batch id —
    * at-least-once re-delivery replaces, and the candidate algebra
    * tolerates the batch's own keys already being stored (`distinct`
    * over ids; vectors deduped by vec_id).
    */
  def writeBatchFold(batch: DataFrame, idxDir: String, outPath: String,
      batchId: Long, bands: Seq[Seq[Int]], k: Int = K): Unit = {
    val ss = batch.sparkSession // foreachBatch binds a CLONED session
    graft.plans.GraftExtensions.install(ss)
    // cache only if the caller didn't (IndexStore.foldBatch hands in
    // an already-cached projection — a second .cache() here would
    // store a duplicate copy per micro-batch)
    val owned =
      batch.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val b0 = batch.select(col("vec_id"), col("embedding"))
    val b = if (owned) b0.cache() else b0
    try {
      val keysB = Similarity.bandKeysOf(b, bands).cache()
      try {
        val stored = graft.sources.PartitionPrune.filterByKeys(
            ss.read.parquet(s"$idxDir/gkeys"), "kb",
            keysB.select(keyBucket(col("band"), col("bucket")).as("kb")))
          .select(col("vec_id"), col("band"), col("bucket"))
        // directed pairs with an endpoint in the batch; distinct kills
        // multi-band collisions AND re-delivery self-overlap
        val seen = stored.union(keysB)
        val cand = keysB
          .select(col("vec_id").as("src"), col("band"), col("bucket"))
          .join(seen.select(col("vec_id").as("dst"), col("band"),
            col("bucket")), Seq("band", "bucket"))
          .union(stored
            .select(col("vec_id").as("src"), col("band"), col("bucket"))
            .join(keysB.select(col("vec_id").as("dst"), col("band"),
              col("bucket")), Seq("band", "bucket")))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst")).distinct()
          .cache() // feeds the edge score AND the touched-src publish
        try {
          val vecs = ss.read.parquet(s"$idxDir/gvecs")
            .select(col("vec_id"), col("embedding")) // drop the partition col
            .union(b).dropDuplicates("vec_id")
          graft.plans.TopK.perKey(Similarity.scoreEdges(cand, vecs),
              Seq(col("src")), Seq(col("cos").desc, col("dst").asc), k)
            .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
              col("cos"), vecBucket(col("src")).as("vb"))
            .write.partitionBy("vb").mode("overwrite")
            .parquet(s"$idxDir/graph/delta_id=b$batchId")
          // publish BEFORE the gkeys/gvecs overwrites: cand re-executes
          // here, and on re-delivery the overwrite would invalidate the
          // listed delta files under it mid-plan
          val touchedSrcs = cand.select(col("src").as("vec_id")).distinct()
          readGraph(ss, idxDir, k, Some(touchedSrcs))
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
          keysB.withColumn("kb", keyBucket(col("band"), col("bucket")))
            .write.partitionBy("kb").mode("overwrite")
            .parquet(s"$idxDir/gkeys/delta_id=b$batchId")
          b.write.mode("overwrite").parquet(s"$idxDir/gvecs/delta_id=b$batchId")
        } finally { cand.unpersist(); () }
      } finally { keysB.unpersist(); () }
    } finally { if (owned) { b.unpersist(); () } }
  }

  /** SEGMENT MERGE: fold every delta of the three families into a
    * fresh `delta_id=base` (the PostingIngestStream.compact shape).
    * Exact: per-src top-k of top-k's is idempotent, and an evicted
    * edge can never re-enter any future top-k (its cos is fixed and
    * later batches only ADD competition — the same monotone argument
    * that makes per-delta capping lossless); keys and vectors merge
    * by plain id-dedup union. Each family swaps in crash-safely via
    * the TableSink two-rename dance; readGraph before == after and
    * later folds stay exact against the merged base (spec-asserted).
    */
  def compact(s: SparkSession, idxDir: String, k: Int = K): Unit = {
    graft.plans.GraftExtensions.install(s)
    val merged = graft.plans.TopK.perKey(
        s.read.parquet(s"$idxDir/graph")
          .select(col("vec_id").as("src"), col("neighbor_id").as("dst"),
            col("cos")),
        Seq(col("src")), Seq(col("cos").desc, col("dst").asc), k)
      .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
        col("cos"), vecBucket(col("src")).as("vb"))
    graft.sources.TableSink.replaceDir(s, s"$idxDir/graph") { tmp =>
      merged.write.partitionBy("vb").parquet(s"$tmp/delta_id=base")
    }
    val keys = s.read.parquet(s"$idxDir/gkeys")
      .select(col("vec_id"), col("band"), col("bucket")).distinct()
      .withColumn("kb", keyBucket(col("band"), col("bucket")))
    graft.sources.TableSink.replaceDir(s, s"$idxDir/gkeys") { tmp =>
      keys.write.partitionBy("kb").parquet(s"$tmp/delta_id=base")
    }
    val vecs = s.read.parquet(s"$idxDir/gvecs")
      .select(col("vec_id"), col("embedding")).dropDuplicates("vec_id")
    graft.sources.TableSink.replaceDir(s, s"$idxDir/gvecs") { tmp =>
      vecs.write.parquet(s"$tmp/delta_id=base")
    }
  }

  /** Drain `inDir` (arriving vectors) into the graph seeded from the
    * lake at `dir`, publishing refreshed per-src edge segments under
    * `outPath`.
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String, idxDir: String,
      k: Int = K): StreamingQuery = {
    seedFromLake(s, dir, idxDir, k)
    val bands = lakeBands(s, dir) // frozen for the index's life
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchFold(batch, idxDir, outPath, id, bands, k)
      }
      .start()
  }
}
