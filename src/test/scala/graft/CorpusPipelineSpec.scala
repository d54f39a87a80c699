package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** CorpusPipeline: the materialized corpus release — decision algebra
  * (benchmark / c06 / t33 precedence), t17-excised release text,
  * release-is-a-lake parity (card/packing recompute identically on the
  * published dir), the c08 no-straddle theorem, and the crash-safe
  * swap publish (rebuild + source evolution).
  */
class CorpusPipelineSpec extends SparkSpecBase {
  import pipeline.CorpusPipeline

  /** Tiny synthetic lake: 60 en docs sharing stopword scaffolding
    * (so the benchmark docs 0/50 contaminate most texts — t17 has
    * real spans to excise) plus per-doc unique tokens; embeddings are
    * distinct except doc `semDoc`, which copies benchmark doc 0's
    * vector — the semantic-decontam plant.
    */
  private lazy val (lakeDir, semDoc): (String, Long) = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-corpus").toString
    val docs = (0 until 60).map { i =>
      val text = s"the quick brown fox $i jumps over the lazy dog " +
        s"and word${i}a word${i}b word${i}c runs to the river bank $i"
      (i.toLong, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    // pick the plant among docs c06 would otherwise KEEP, so the
    // semantic stage is what kills it
    val keeps = operators.Curation.mixPlan(spark, d).collect()
      .filter(r => r.getAs[Boolean]("kept") && r.getAs[Long]("doc_id") % 50 != 0)
      .map(_.getAs[Long]("doc_id"))
    require(keeps.nonEmpty, "fixture: c06 kept nothing")
    val k = keeps.min
    val dim = 16
    def mk(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => math.sin(seed * 31.7 + i * 1.3).toFloat)
    (0 until 60).map(i => (i.toLong, if (i.toLong == k) mk(0) else mk(i)))
      .toDF("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    (d, k)
  }

  private lazy val outDir: String =
    Files.createTempDirectory("graft-release").toString + "/release"

  private lazy val firstBuild = CorpusPipeline.build(spark, lakeDir, outDir)

  test("build: stage funnel has the chain identity and lands the semantic drop") {
    val rep = firstBuild.collect()
    assert(rep.length == 6)
    val stages = rep.map(_.getAs[String]("stage")).toSeq
    assert(stages == Seq("ingest", "benchmark_split", "quality_gate",
      "tail_cull", "mix_sample", "semantic_decontam"))
    for (i <- 1 until 6)
      assert(rep(i).getAs[Long]("n_in") == rep(i - 1).getAs[Long]("n_kept"),
        s"chain broken at ${stages(i)}")
    assert(rep(0).getAs[Long]("n_in") == 60L)
    assert(rep(1).getAs[Long]("n_dropped") == 2L) // docs 0 and 50
    assert(rep(5).getAs[Long]("n_dropped") >= 1L) // the planted twin
    // the funnel's tail equals the published corpus
    val nDocs = spark.read.parquet(s"$outDir/documents.parquet").count()
    assert(rep(5).getAs[Long]("n_kept") == nDocs)
  }

  test("build: decision precedence — the planted twin dies semantic, benchmarks excluded") {
    firstBuild
    val dec = spark.read.parquet(s"$outDir/decisions.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(dec(semDoc).getAs[String]("decision") == "drop_semantic")
    assert(!dec(semDoc).getAs[Boolean]("kept"))
    assert(dec(0L).getAs[String]("decision") == "exclude_benchmark")
    assert(dec(50L).getAs[String]("decision") == "exclude_benchmark")
    // kept set == release doc set; no benchmark doc ships
    val kept = dec.values.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("doc_id")).toSet
    val released = spark.read.parquet(s"$outDir/documents.parquet")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == released)
    assert(released.forall(_ % 50 != 0))
  }

  test("build: release text is t17's excised text, chars recounted") {
    firstBuild
    val rel = spark.read.parquet(s"$outDir/documents.parquet")
    val mismatch = rel.join(
        operators.TextOps.contaminationExcise(spark, lakeDir)
          .select(col("doc_id"), col("clean_text")), Seq("doc_id"))
      .filter(col("text") =!= col("clean_text") ||
        col("n_chars") =!= length(col("clean_text")).cast("long"))
      .count()
    assert(mismatch == 0L)
    // the shared stopword scaffolding really was excised somewhere
    val excisedSome = rel.filter(!col("text").contains("quick brown fox"))
      .count()
    assert(excisedSome > 0L)
  }

  test("build: the release is a lake — card and packing recompute identically on it") {
    firstBuild
    assert(spark.read.parquet(s"$outDir/card.parquet").collect().toSet ==
      operators.Curation.corpusCard(spark, outDir).collect().toSet)
    assert(spark.read.parquet(s"$outDir/packed.parquet").collect().toSet ==
      operators.TextOps.sequencePack(spark, outDir).collect().toSet)
  }

  test("build: no near-dup cluster straddles a split inside the release") {
    firstBuild
    val straddles = spark.read.parquet(s"$outDir/decisions.parquet")
      .filter(col("kept"))
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddles == 0L)
  }

  test("rebuild: idempotent swap, and a source change is visible post-swap") {
    import spark.implicits._
    firstBuild
    val before = spark.read.parquet(s"$outDir/decisions.parquet")
      .collect().map(_.toString).sorted
    CorpusPipeline.build(spark, lakeDir, outDir) // replaceDir path
    val again = spark.read.parquet(s"$outDir/decisions.parquet")
      .collect().map(_.toString).sorted
    assert(before.toSeq == again.toSeq)
    // evolve the source (append a doc; counts feeding memoized layout
    // stats — the embeddings table — are untouched) and rebuild: the
    // swap + listing refresh must make the new decision visible
    val t = "the fresh appended document about the river and the fox crossing"
    Seq((1000L, t, "en", "src0", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Append).parquet(s"$lakeDir/documents.parquet")
    CorpusPipeline.build(spark, lakeDir, outDir)
    val dec3 = spark.read.parquet(s"$outDir/decisions.parquet")
      .filter(col("doc_id") === 1000L).collect()
    assert(dec3.length == 1)
  }

  test("releaseDiff: identity is no-change; every planted release delta classifies") {
    val base = Files.createTempDirectory("graft-reldiff").toString
    val a = s"$base/relA"; val b = s"$base/relB"
    CorpusPipeline.build(spark, sf0001, a)
    // identity: a release diffed against itself reports no changes
    val ident = CorpusPipeline.releaseDiffDocs(spark, a, a).collect()
      .map(_.getAs[String]("change")).toSet
    assert(ident.subsetOf(Set("unchanged", "unchanged_dropped")), ident)
    // release B = A with one planted instance of each delta class
    // (the diff reads published artifacts, so B is authored directly)
    val decA = spark.read.parquet(s"$a/decisions.parquet")
    val docsA = spark.read.parquet(s"$a/documents.parquet")
    val kept = decA.filter(col("kept")).orderBy(col("doc_id"))
      .limit(4).collect().map(_.getAs[Long]("doc_id"))
    val Array(kMove, kText, kDrop, kGone) = kept
    val dReason = decA.filter(!col("kept")).orderBy(col("doc_id"))
      .limit(1).collect().head.getAs[Long]("doc_id")
    val flip = when(col("split") === "train", lit("val")).otherwise(lit("train"))
    val decB = decA.filter(col("doc_id") =!= kGone)
      .withColumn("split",
        when(col("doc_id") === kMove, flip).otherwise(col("split")))
      .withColumn("kept",
        when(col("doc_id") === kDrop, lit(false)).otherwise(col("kept")))
      .withColumn("decision",
        when(col("doc_id") === kDrop, lit("drop_quality"))
          .when(col("doc_id") === dReason, lit("drop_rerun"))
          .otherwise(col("decision")))
      .union(decA.filter(col("doc_id") === kText)
        .withColumn("doc_id", lit(999999L)))
    val docsB = docsA
      .filter(col("doc_id") =!= kGone && col("doc_id") =!= kDrop)
      .withColumn("text",
        when(col("doc_id") === kText, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
      .union(docsA.filter(col("doc_id") === kText)
        .withColumn("doc_id", lit(999999L)))
    decB.write.parquet(s"$b/decisions.parquet")
    docsB.write.parquet(s"$b/documents.parquet")
    val diff = CorpusPipeline.releaseDiffDocs(spark, a, b).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change")).toMap
    assert(diff(999999L) == "added_source")
    assert(diff(kGone) == "removed_source")
    assert(diff(kDrop) == "now_dropped")
    assert(diff(kMove) == "split_moved")
    assert(diff(kText) == "text_changed")
    assert(diff(dReason) == "reason_changed")
    // the headline summary is exactly the per-doc table rolled up
    val sum = CorpusPipeline.releaseDiff(spark, a, b).collect()
      .map(r => r.getAs[String]("change") -> r.getAs[Long]("n_docs")).toMap
    val byClass = diff.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(sum == byClass.toMap)
  }

  test("sf0.001 build: funnel holds and the c08 theorem survives real clusters") {
    val out = Files.createTempDirectory("graft-release-sf").toString + "/rel"
    val rep = CorpusPipeline.build(spark, sf0001, out).collect()
    for (i <- 1 until 6)
      assert(rep(i).getAs[Long]("n_in") == rep(i - 1).getAs[Long]("n_kept"))
    val rel = spark.read.parquet(s"$out/documents.parquet")
    assert(rel.count() > 0L)
    assert(rel.filter(col("doc_id") % 50 === 0).count() == 0L)
    val straddles = spark.read.parquet(s"$out/decisions.parquet")
      .filter(col("kept"))
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddles == 0L)
    assert(operators.Curation.corpusCard(spark, out).count() > 0L)
  }
}
