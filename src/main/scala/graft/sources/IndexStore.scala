package graft.sources

import graft.operators.{Similarity, VectorAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED index layouts the similarity ladder's 100 TB story
  * assumes (r11): the gated queries rebuild their artifacts inline
  * per run — the driver-gate convention — but production builds ONCE
  * and probes by key. This store is that build/probe split, with the
  * layout choices the operators' Scaladocs promise:
  *
  *  - `centroids/` — the K centroid vectors (tiny, broadcast on read).
  *  - `cells/` — the rr=1 IVF cell assignments
  *    (vec_id, embedding, nrm), PARTITIONED BY cid: an nprobe query's
  *    probe cells become a static `cid IN` partition filter, so a
  *    probe scans nprobe/K of the corpus (plan-asserted in
  *    IndexStoreSpec).
  *  - `graph/` — the s15 kNN edges, partitioned by a
  *    [[GraphBuckets]]-way vec_id hash bucket: seed-node edge lookups
  *    prune to the touched buckets (the PostingIngestStream layout
  *    convention applied to the graph).
  *  - `postings/`, `df/` — s17's impact-ordered lexical index,
  *    term-bucketed; written through
  *    streaming.PostingIngestStream.seedFromLake so the batch build
  *    and the streaming fold share one author, and
  *    PostingIngestStream.readIndex is the probe.
  *
  * Probes are output-identical to the inline queries (spec-asserted):
  * the stored artifacts ARE the frames the inline plans compute.
  */
object IndexStore {

  /** Graph partition fan-out (the TermBuckets convention). */
  val GraphBuckets = 32

  /** Build every persisted artifact under `idxDir` from the lake at
    * `dir`.
    */
  def build(s: SparkSession, dir: String, idxDir: String): Unit = {
    graft.plans.GraftExtensions.install(s)
    VectorAgg.centroidVectors(s, dir)
      .write.mode("overwrite").parquet(s"$idxDir/centroids")
    Similarity.cellAssignments(s, dir).filter(col("rr") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$idxDir/cells")
    Similarity.knnGraphFrame(s, dir)
      .withColumn("vb", pmod(hash(col("vec_id")), lit(GraphBuckets)))
      .write.partitionBy("vb").mode("overwrite").parquet(s"$idxDir/graph")
    graft.streaming.PostingIngestStream.seedFromLake(s, dir, idxDir)
  }

  /** s03's answer as a partition-pruned probe of `cells/`. */
  def probeIvf(s: SparkSession, dir: String, idxDir: String): DataFrame =
    Similarity.annIvfProbe(s, dir, idxDir)

  /** s16's answer with the graph leg read by key out of `graph/`. */
  def probeGraphExpand(s: SparkSession, dir: String,
      idxDir: String): DataFrame =
    Similarity.graphExpandProbe(s, dir, idxDir)

  /** s17's rows for `terms`, re-capped from the posting deltas. */
  def probeIndex(s: SparkSession, idxDir: String,
      terms: DataFrame): DataFrame =
    graft.streaming.PostingIngestStream.readIndex(s, idxDir, terms)
}
