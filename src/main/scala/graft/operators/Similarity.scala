package graft.operators

import graft.Tables
import graft.functions.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.5). Query set = every 100th vector (deterministic).
  */
object Similarity {

  private def queriesAndCorpus(s: SparkSession, dir: String) = {
    // norms precomputed per vector so the pair loop is dot-only
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Vector.norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    (q, e)
  }

  private def pairCosine =
    Vector.dot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm"))

  /** Rank the scored pairs: bounded TopKPerKey (custom operator —
    * only k rows per query per partition reach the shuffle), then a
    * row_number window over the tiny survivor set to emit the rank
    * column. Results identical to a full window, cost bounded.
    */
  private def rankTopK(s: SparkSession, scored: org.apache.spark.sql.DataFrame,
      k: Int) = {
    graft.plans.GraftExtensions.install(s)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("vec_id").asc), k)
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("rn"),
        col("vec_id").as("neighbor_id"),
        floor(col("cos") * 10000).cast("long").as("cos_bp"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** s01 — brute-force cosine top-5 per query: the correctness
    * baseline. Queries are a tiny broadcast side; the corpus streams
    * once — no corpus shuffle, rank window partitioned by query_id.
    */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val (q, e) = queriesAndCorpus(s, dir)
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", pairCosine)
    rankTopK(s, scored, 5)
  }

  /** s02 — LSH-bucketed ANN (scale path): corpus bucketed by the sign
    * pattern of 3 fixed coordinates (8 buckets); each query only scans
    * its own bucket — at 100 TB the bucket column is a partition key
    * and the per-query work drops ~8× (more planes ⇒ more buckets).
    * Top-3 within bucket.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val dims = Seq(1, 9, 17)
    val (q0, e) = queriesAndCorpus(s, dir)
    val corpus = e.withColumn("bucket", Vector.signBucket(col("embedding"), dims))
    val q = q0.withColumn("bucket", Vector.signBucket(col("qv"), dims))
    val scored = corpus.join(broadcast(q),
        corpus("bucket") === q("bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", pairCosine)
    rankTopK(s, scored, 3)
  }

  /** s03 — IVF-style ANN (coarse quantization): the corpus is
    * assigned to cells by nearest of 4 fixed centroids (the first 4
    * vectors — deterministic seeds); a query probes only its own
    * cell. At 100 TB the cell id is the partition key: queries touch
    * 1/K of the corpus and the assignment pass is a single broadcast
    * scan. Top-3 within cell.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Vector.norm(col("embedding")).as("nrm"))
    val cent = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cnrm"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val cells = e.join(broadcast(cent), lit(true))
      .withColumn("ccos",
        Vector.dot(col("embedding"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rr", row_number().over(wAsg))
      .filter(col("rr") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
    val q = cells.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("cid"))
    val scored = cells.join(broadcast(q),
        cells("cid") === q("cid") && col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        Vector.dot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
    rankTopK(s, scored, 3)
  }
}
