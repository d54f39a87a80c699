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

  /** s04 — hybrid retrieval: a lexical recall stage (documents
    * sharing ≥1 rare 3-token shingle with the query, df ≤ 1000 — the
    * same stop-shingle cap d04 uses, so candidate generation is a
    * key-equality join that stays ~linear) followed by an embedding
    * cosine rerank, top-3 per query through TopKPerKey. This is the
    * keyword-prefilter → vector-rerank shape of a production retrieval
    * pipeline: the lexical stage bounds the vector work to candidates
    * instead of the whole corpus. Queries: every 10th document.
    */
  def hybridSearch(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.install(s)
    val sh = Dedup.shingles(s, dir)
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000).select(col("shingle"))
    val shr = sh.join(rare, "shingle")
    val q = shr.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("query_id"), col("shingle"))
    val cand = shr.join(q, Seq("shingle"))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id")).distinct()
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Vector.norm(col("embedding")).as("nrm"))
    val qe = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      col("nrm").as("qnrm"))
    val ce = e.select(col("vec_id").as("doc_id"), col("embedding").as("dv"),
      col("nrm").as("dnrm"))
    val scored = cand.join(broadcast(qe), "query_id").join(ce, "doc_id")
      .withColumn("cos",
        Vector.dot(col("qv"), col("dv")) / (col("qnrm") * col("dnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id"))
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("doc_id").asc), 3)
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("rn"), col("doc_id").as("neighbor_id"),
        floor(col("cos") * 10000).cast("long").as("cos_bp"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** s03 — IVF-style ANN (coarse quantization) with REAL centroids:
    * the 10 per-label mean vectors (VectorAgg.centroidVectors — the
    * un-exploded m04 aggregate, components floored to milli-units so
    * the oracle rebuilds bit-identical centroids). Corpus vectors are
    * assigned to their nearest centroid's cell; a query probes its
    * top-2 cells (the standard nprobe>1 recall lever). At 100 TB the
    * cell id is the partition key: the assignment pass is one
    * broadcast scan (centroids are tiny) and each query touches
    * ~2/K of the corpus. Top-3 within probed cells.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        Vector.norm(col("embedding")).as("nrm"))
    val cent = graft.operators.VectorAgg.centroidVectors(s, dir)
      .select(col("cid"), col("cv"), Vector.norm(col("cv")).as("cnrm"))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val asg = e.join(broadcast(cent), lit(true))
      .withColumn("ccos",
        Vector.dot(col("embedding"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rr", row_number().over(wAsg))
    val cells = asg.filter(col("rr") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
    // queries probe their 2 nearest cells; a corpus vector lives in
    // exactly one cell and probe cids are distinct, so the cid
    // equi-join yields each (query, candidate) pair at most once
    val q = asg.filter(col("vec_id") % 100 === 0 && col("rr") <= 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("cid"))
    val scored = cells.join(broadcast(q),
        cells("cid") === q("cid") && col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        Vector.dot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
    rankTopK(s, scored, 3)
  }
}
