package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** Production hardening: every corpus operator must return an EMPTY
  * result — not throw — on empty input tables (at 100 TB, empty
  * partitions, fresh lakes and zero-match filters are routine, and a
  * driver-side .head()/loop that assumes rows would crash the job).
  */
class EmptyInputSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    Seq.empty[(Long, String)].toDF("s_suppkey", "s_name")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/supplier.parquet")
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    // ts as raw long nanos — the driver testdata's TIMESTAMP(NANOS)
    // shape Tables.events reads under nanosAsLong
    Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    Seq.empty[(Long, Long, String, Double, java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/orders.parquet")
    Seq.empty[(Long, Long, Double, Double, Double)]
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_tax")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/lineitem.parquet")
    d
  }

  private val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
    "d01" -> (operators.Dedup.exact _),
    "d02" -> (operators.Dedup.minhashLsh _),
    "d03" -> (operators.Dedup.simhash _),
    "d04" -> (operators.Dedup.ngramJaccard _),
    "d05" -> (operators.Dedup.embeddingDup _),
    "d06" -> (operators.Dedup.fuzzyMatch _),
    "d07" -> (operators.Dedup.dupClusters _),
    "d08" -> (operators.Dedup.keepBest _),
    "d09" -> ((s, d) => operators.Dedup.chunkDedup(s, d)),
    "d10" -> (operators.Dedup.incrementalDedup _),
    "d12" -> ((s, d) => operators.Dedup.semanticDedup(s, d)),
    "d13" -> (operators.Dedup.multiblockSimhash _),
    "d14" -> (operators.Dedup.containment _),
    "d18" -> (operators.Dedup.incrementalClusters _),
    "c08" -> (operators.Curation.safeSplit _),
    "r21" -> (operators.Relational.cdcApply _),
    "r08" -> (operators.Relational.sessionize _),
    "r20" -> ((s, d) => operators.Relational.sessionizeChunked(s, d)),
    "m07" -> ((s, d) => operators.Multimodal.blobDedup(s, d)),
    "m08" -> ((s, d) => operators.Multimodal.shardManifest(s, d)),
    "s01" -> (operators.Similarity.annBruteForce _),
    "s03" -> (operators.Similarity.annIvf _),
    "s05" -> (operators.Similarity.annPq _),
    "s08" -> (operators.Similarity.annSq8 _),
    "s18" -> (operators.Similarity.indexHealth _),
    "t01" -> (operators.TextOps.tokenCount _),
    "t09" -> (operators.TextOps.tfidf _),
    "t11" -> (operators.TextOps.stratifiedSample _),
    "t12" -> ((s, d) => operators.TextOps.decontaminate(s, d)),
    "t17" -> ((s, d) => operators.TextOps.contaminationExcise(s, d)),
    "t18" -> (operators.Dedup.splitLeakage _),
    "t19" -> ((s, d) => operators.TextOps.selfDedup(s, d)),
    "t20" -> ((s, d) => operators.TextOps.benchmarkOverlap(s, d)),
    "t21" -> ((s, d) => operators.TextOps.lmSurprisal(s, d)),
    "r22" -> (operators.Relational.funnel _),
    "r23" -> (operators.Relational.retentionCohorts _),
    "r24" -> (operators.Relational.funnelChained _),
    "s09" -> (operators.Similarity.annRecallAudit _),
    "s10" -> ((s, d) => operators.Similarity.rangeSearch(s, d)),
    "t22" -> ((s, d) => operators.TextOps.dsirWeights(s, d)),
    "t23" -> (operators.TextOps.qualityClassifier _),
    "c02" -> (operators.Curation.clusterSample _),
    "t13" -> ((s, d) => operators.TextOps.repetitionStats(s, d)),
    "t14" -> (operators.TextOps.domainMix _),
    "c01" -> ((s, d) => operators.Curation.curate(s, d)),
    "t24" -> ((s, d) => operators.Bpe.bpeTrain(s, d)),
    "t25" -> ((s, d) => operators.Bpe.bpeApply(s, d)),
    "s11" -> (operators.Similarity.mmrRerank _),
    "t26" -> ((s, d) => operators.TextOps.chunkSplit(s, d)),
    "t27" -> ((s, d) => operators.TextOps.exactSample(s, d)),
    "c04" -> (operators.Curation.outlierScrub _),
    "r26" -> ((s, d) => operators.Relational.funnelWindowed(s, d)),
    "r29" -> (operators.Relational.transitionMatrix _),
    "r30" -> (operators.Relational.concurrency _),
    "r31" -> (operators.Relational.reconciliation _),
    "s12" -> (operators.Similarity.annFiltered _),
    "s13" -> ((s, d) => operators.Similarity.bm25Search(s, d)),
    "s14" -> ((s, d) => operators.Similarity.rrfFusion(s, d)),
    "t28" -> ((s, d) => operators.TextOps.sourceDrift(s, d)),
    "t30" -> ((s, d) => operators.TextOps.ngramNovelty(s, d)),
    "t31" -> (operators.TextOps.zipfProfile _),
    "t32" -> ((s, d) => operators.TextOps.templateShare(s, d)),
    // Spark grouping-sets aggregation emits NO rows on empty input
    // (DuckDB emits the () grand total — the oracle filters it with
    // WHERE n_docs > 0, a no-op on any non-empty corpus)
    "c03" -> (operators.Curation.corpusCard _),
    "t36" -> (operators.TextOps.readability _),
    // t37 is NOT here: its gate frame plants 45 literal docs (the
    // d15 recipe), so it is non-empty on an empty corpus by design
    "t38" -> (operators.TextOps.vocabGrowth _),
    "r33" -> (operators.Relational.experimentReadout _),
    "r34" -> (operators.Relational.volumeAnomaly _),
    "c13" -> (operators.Curation.lfCorrelation _),
    "s23" -> (operators.Similarity.centroidDrift _),
    "r35" -> (operators.Relational.cohortLtv _),
    "r36" -> (operators.Relational.basketAffinity _),
    "r37" -> ((s, d) => operators.Relational.sketchOverlap(s, d)))

  for ((name, fn) <- ops)
    test(s"$name returns an empty result on empty input") {
      assert(fn(spark, dir).count() == 0L)
    }

  test("d15 on empty input returns exactly its planted calibration bands") {
    // the audit is never vacuous BY DESIGN (r10 verdict item 3): the
    // planted S-curve pairs ride every corpus, including an empty
    // one — bands 2/5/7 with 2 true pairs each and recall 0/5000/10000
    val rows = operators.Dedup.lshRecallAudit(spark, dir).collect()
      .map(r => r.getAs[Int]("band") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("recall_bp")))).toMap
    assert(rows == Map(2 -> ((2L, 0L)), 5 -> ((2L, 5000L)),
      7 -> ((2L, 10000L))), rows.toString)
  }

  test("d16 on empty input returns exactly its two planted delta rows") {
    // n = 0 + 3 plants → m = 1 << (⌈log₂3⌉+2) = 16; the dup twin's
    // positions {9,10,15} all set by its lake plant, the clean plant's
    // {0,13,14} all clear — replayed from the md5 arithmetic by hand
    val rows = operators.Dedup.bloomGate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hit"), r.getAs[Boolean]("bloom_hit"),
          r.getAs[Boolean]("exact_dup"),
          r.getAs[Boolean]("false_positive")))).toMap
    assert(rows == Map(
      1000000010L -> ((3L, true, true, false)),
      1000000020L -> ((0L, false, false, false))), rows.toString)
  }

}
