package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** The persisted-index build/probe split (sources.IndexStore): every
  * probe must return EXACTLY the inline query's rows, and the reads
  * must prune — the partition filters are the 100 TB claim.
  */
class IndexStoreSpec extends SparkSpecBase {

  private lazy val idx: String = {
    val d = Files.createTempDirectory("graft-idx").toString + "/idx"
    sources.IndexStore.build(spark, sf0001, d)
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("IVF probe over the persisted cid-partitioned cells equals inline s03") {
    val probe = sources.IndexStore.probeIvf(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Similarity.annIvf(spark, sf0001)))
    // the probe's corpus scan carries a static cid partition filter —
    // it reads nprobe/K of the corpus, not all of it
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cid[^\\]]*\\].*"),
      s"no cid partition filter:\n${plan.take(3000)}")
  }

  test("IVF-PQ probe over the persisted cell-partitioned codes equals inline s06") {
    val probe = sources.IndexStore.probeIvfPq(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Similarity.annIvfPq(spark, sf0001)))
    // the ADC scan reads the code table behind a static cell
    // partition filter — codes only, nprobe/K of the corpus
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"no cell partition filter:\n${plan.take(3000)}")
  }

  test("LSH probe over the persisted bucket partitions equals inline s02") {
    val probe = sources.IndexStore.probeLsh(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Similarity.annLsh(spark, sf0001)))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"no bucket partition filter:\n${plan.take(3000)}")
  }

  test("vector ingest encodes arriving batches against the STORED artifacts") {
    import org.apache.spark.sql.functions.col
    // the streaming encoder's static artifacts can come straight off
    // the store — one build serves batch probes AND the ingest path
    val cent = spark.read.parquet(s"$idx/centroids")
    val params = spark.read.parquet(s"$idx/sq8params")
    val batch = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 6).select(col("vec_id"), col("embedding"))
    val fromStore = rows(streaming.VectorIngestStream
      .encodeBatch(batch, cent, params).orderBy(col("vec_id")))
    val (c2, p2) = streaming.VectorIngestStream.staticArtifacts(spark, sf0001)
    val recomputed = rows(streaming.VectorIngestStream
      .encodeBatch(batch, c2, p2).orderBy(col("vec_id")))
    assert(fromStore == recomputed)
  }

  test("SQ8 probe over the persisted byte codes equals inline s08") {
    val probe = sources.IndexStore.probeSq8(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Similarity.annSq8(spark, sf0001)))
    // the corpus side of the scan is the stored code table (the 4×
    // compression claim), not the float embeddings
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("sq8codes"), s"probe does not scan sq8codes:\n" +
      plan.take(3000))
  }

  test("IVF-SQ8 probe over the cell-partitioned byte codes equals inline s24") {
    val probe = sources.IndexStore.probeIvfSq8(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Similarity.annIvfSq8(spark, sf0001)))
    // the 4×-compressed scan ALSO prunes (r11 verdict item 3): a
    // static cell partition filter over sq8codes — nprobe/K of the
    // byte-code table, never a float vector
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("sq8codes"), s"probe does not scan sq8codes:\n" +
      plan.take(3000))
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"no cell partition filter:\n${plan.take(3000)}")
  }

  test("s24 equals s08's ADC ranking restricted to the probed cells") {
    // output-identity against an independently-composed reference:
    // run s08's full-scan ranking, but over ONLY the corpus vectors
    // in each query's 2 probe cells — exactly s24's contract
    import org.apache.spark.sql.functions.broadcast
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val params = operators.Similarity.sq8Params(e)
    val asg = operators.Similarity.cellAssignments(spark, sf0001)
    val cells = asg.filter(col("rr") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val q = asg.filter(col("vec_id")
        .isin(operators.Similarity.annQueryIds: _*) && col("rr") <= 2)
      .select(col("vec_id").as("query_id"), col("cid").as("cell"))
    val allowed = cells.join(broadcast(q), "cell")
      .select(col("query_id"), col("vec_id"))
    // s08 pairs = every (q, v); reference = s08 scoring ∩ allowed
    val dq = e.crossJoin(broadcast(params))
      .select(col("vec_id"),
        org.apache.spark.sql.functions.zip_with(
          org.apache.spark.sql.functions.zip_with(
            col("embedding"), col("ps"), operators.Similarity.sq8Code),
          col("ps"), operators.Similarity.sq8Dequant).as("dv"))
    val qv = e.filter(col("vec_id")
        .isin(operators.Similarity.annQueryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = dq.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .join(allowed, Seq("query_id", "vec_id"), "left_semi")
    val ref = operators.Similarity.sq8AdcRank(spark, pairs)
    assert(rows(operators.Similarity.annIvfSq8(spark, sf0001)) == rows(ref))
  }

  test("PartitionPrune: IN path and semi-join path return identical rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-prune").toString
    (0 until 100).map(i => (i.toLong, i % 7))
      .toDF("id", "bk").write.partitionBy("bk").parquet(s"$base/t")
    val t = spark.read.parquet(s"$base/t")
    val keys = Seq(1, 3, 5).toDF("bk")
    val inPath = sources.PartitionPrune.filterByKeys(t, "bk", keys)
    val semiPath = sources.PartitionPrune
      .filterByKeys(t, "bk", keys, maxInList = 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids(inPath) == ids(semiPath))
    assert(ids(inPath) == (0 until 100).filter(i => Set(1, 3, 5)(i % 7))
      .map(_.toLong).toSet)
    // the small-set path is a STATIC partition filter; the large-set
    // path materializes no literal list in the plan
    val planIn = inPath.queryExecution.executedPlan.toString
    assert(planIn.matches("(?s).*PartitionFilters: \\[[^\\]]*bk[^\\]]*\\].*"),
      s"no static bk filter:\n${planIn.take(2000)}")
    val planSemi = semiPath.queryExecution.executedPlan.toString
    assert(planSemi.toLowerCase.contains("leftsemi"),
      s"semi path did not plan a semi join:\n${planSemi.take(2000)}")
  }

  test("graph-expand probe over the persisted bucketed graph equals inline s16") {
    val probe = sources.IndexStore.probeGraphExpand(spark, sf0001, idx)
    assert(rows(probe) ==
      rows(operators.Similarity.graphExpandSearch(spark, sf0001)))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*vb[^\\]]*\\].*"),
      s"no vb partition filter:\n${plan.take(3000)}")
  }

  test("foldBatch keeps every per-vector family equal to a frozen-model rebuild") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = Files.createTempDirectory("graft-idx-fold").toString
    val idxF = s"$base/idxF"   // built then folded
    val idxR = s"$base/idxR"   // rebuilt from scratch over the union
    sources.IndexStore.build(spark, sf0001, idxF)
    // arriving batch: 5 lake vectors re-keyed to NEW ids (the d10/d11
    // disjoint-id ingest contract)
    val batch = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    sources.IndexStore.foldBatch(spark, sf0001, idxF, batch, 0L)
    // the frozen-model reference: same static artifacts, the UNION
    // encoded from scratch (exactly what a full rebuild under the
    // frozen centroids/codebook/params would land)
    for (a <- Seq("centroids", "codebook", "sq8params", "lshlayout"))
      spark.read.parquet(s"$idxF/$a").write.parquet(s"$idxR/$a")
    val union = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).union(batch)
    sources.IndexStore.rebuildVectorFamilies(spark, idxR, union)
    def probes(idx: String) = Seq(
      rows(sources.IndexStore.probeLsh(spark, sf0001, idx)),
      rows(sources.IndexStore.probeIvf(spark, sf0001, idx)),
      rows(sources.IndexStore.probeIvfPq(spark, sf0001, idx)),
      rows(sources.IndexStore.probeSq8(spark, sf0001, idx)),
      rows(sources.IndexStore.probeIvfSq8(spark, sf0001, idx)))
    val (folded, rebuilt) = (probes(idxF), probes(idxR))
    folded.zip(rebuilt).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f == r, s"family $i: folded store diverged from rebuild")
    }
    // the fold actually changed answers vs the pre-fold store (a new
    // vector entered some query's bucket/cell) — otherwise the parity
    // above would be vacuous
    val preFold = Seq(
      rows(sources.IndexStore.probeLsh(spark, sf0001, idx)),
      rows(sources.IndexStore.probeSq8(spark, sf0001, idx)))
    assert(preFold != Seq(folded(0), folded(3)),
      "fold was a no-op for every probe — vacuous parity")
    // double delivery of the batch id replaces deltas, never grows
    val n1 = spark.read.parquet(s"$idxF/sq8codes").count()
    sources.IndexStore.foldBatch(spark, sf0001, idxF, batch, 0L)
    assert(spark.read.parquet(s"$idxF/sq8codes").count() == n1)
  }

  test("StoreIngestStream drains deliveries through the whole-store fold") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("graft-idx-stream").toString
    val idxS = s"$base/idx"; val idxR = s"$base/idxR"
    val inDir = s"$base/in"; val ck = s"$base/ck"
    sources.IndexStore.build(spark, sf0001, idxS)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def rekeyed(lo: Int, hi: Int) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"),
        col("label"))
    rekeyed(0, 3).write.mode(SaveMode.Append).parquet(inDir)
    rekeyed(3, 6).write.mode(SaveMode.Append).parquet(inDir)
    val q = streaming.StoreIngestStream.startFolding(spark, inDir, sf0001,
      idxS, ck)
    try q.awaitTermination() finally q.stop()
    // the drained store equals a frozen-model rebuild over the union
    for (a <- Seq("centroids", "codebook", "sq8params", "lshlayout"))
      spark.read.parquet(s"$idxS/$a").write.parquet(s"$idxR/$a")
    val union = emb.select(col("vec_id"), col("embedding"))
      .union(rekeyed(0, 6).select(col("vec_id"), col("embedding")))
    sources.IndexStore.rebuildVectorFamilies(spark, idxR, union)
    assert(rows(sources.IndexStore.probeLsh(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeLsh(spark, sf0001, idxR)))
    assert(rows(sources.IndexStore.probeSq8(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeSq8(spark, sf0001, idxR)))
    // the deliveries landed as per-batch deltas next to the base
    // (AvailableNow may group the files into one or two micro-batches)
    val deltas = spark.read.parquet(s"$idxS/sq8codes")
      .select(col("delta_id")).distinct().collect()
      .map(_.getString(0)).toSet
    assert(deltas.contains("base") && deltas.exists(_.startsWith("b")),
      deltas.toString)
  }

  test("EmbedStream.embedBatch equals t35's sparse projection, densified") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 50)
    val dense = streaming.EmbedStream.embedBatch(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val sparse = operators.TextOps.hashedEmbeddingOf(
        docs.select(col("doc_id"), col("text")), 64).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // every tokenful doc gets a 64-dim vector; each coordinate is the
    // sparse weight where touched, 0 elsewhere
    assert(dense.keySet == sparse.keySet.map(_._1))
    dense.foreach { case (id, v) =>
      assert(v.length == 64, s"doc $id")
      v.zipWithIndex.foreach { case (x, i) =>
        assert(x == sparse.getOrElse((id, i), 0L).toFloat, s"doc $id dim $i")
      }
    }
  }

  test("EmbedStream: arriving TEXT drains through the embedder into the whole-store fold") {
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("graft-embed-stream").toString
    val idxS = s"$base/idx"; val idxR = s"$base/idxR"
    val inDir = s"$base/in"; val ck = s"$base/ck"
    sources.IndexStore.build(spark, sf0001, idxS)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def rekeyed(lo: Int, hi: Int) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select((col("doc_id") + 20000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    rekeyed(0, 3).write.mode(SaveMode.Append).parquet(inDir)
    rekeyed(3, 6).write.mode(SaveMode.Append).parquet(inDir)
    val q = streaming.EmbedStream.startIndexing(spark, inDir, sf0001,
      idxS, ck)
    try q.awaitTermination() finally q.stop()
    // the drained store equals a frozen-model rebuild over the union
    // of the lake and the EMBEDDED text batch — the embedder and the
    // fold compose exactly
    for (a <- Seq("centroids", "codebook", "sq8params", "lshlayout"))
      spark.read.parquet(s"$idxS/$a").write.parquet(s"$idxR/$a")
    val streamed = streaming.EmbedStream.embedBatch(rekeyed(0, 6))
    val union = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).union(streamed)
    sources.IndexStore.rebuildVectorFamilies(spark, idxR, union)
    assert(rows(sources.IndexStore.probeLsh(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeLsh(spark, sf0001, idxR)))
    assert(rows(sources.IndexStore.probeSq8(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeSq8(spark, sf0001, idxR)))
    // every embedded doc actually landed as a vector in the store
    val landed = spark.read.parquet(s"$idxS/lsh")
      .filter(col("vec_id") >= 20000L).select(col("vec_id"))
      .distinct().count()
    assert(landed == streamed.count() && landed > 0, landed.toString)
  }

  test("dedup probe over the persisted signature index equals inline d11") {
    val probe = sources.IndexStore.probeDedup(spark, sf0001, idx)
    assert(rows(probe) == rows(operators.Dedup.incrementalLsh(spark, sf0001)))
    // the delta's band-key probe prunes to its own touched buckets
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*mb[^\\]]*\\].*"),
      s"no mb partition filter:\n${plan.take(3000)}")
  }

  test("incremental LSH stream classifies against the STORED signature index") {
    import org.apache.spark.sql.functions.col
    // the streaming dedup gate's static index can come straight off
    // the store — same artifact-agnostic seam as the vector encoder
    val storedSig = spark.read.parquet(s"$idx/mhsigs")
    val delta = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 200)
    val fromStore = rows(streaming.IncrementalLshStream
      .classifyBatch(delta, storedSig).orderBy(col("doc_id")))
    val recomputed = rows(streaming.IncrementalLshStream
      .classifyBatch(delta,
        streaming.IncrementalLshStream.lakeSignatures(spark, sf0001))
      .orderBy(col("doc_id")))
    assert(fromStore == recomputed)
  }

  test("posting probe equals inline s17 for the probed terms") {
    import spark.implicits._
    val terms = Seq("the", "table", "scan").toDF("term")
    val stored = rows(sources.IndexStore.probeIndex(spark, idx, terms)
      .orderBy(col("term"), col("rn")))
    val inline = rows(operators.Similarity.impactIndex(spark, sf0001)
      .filter(col("term").isin("the", "table", "scan")))
    assert(stored == inline, s"stored=${stored.take(3)} inline=${inline.take(3)}")
  }

  test("IngestPipeline: gate → embed → fold; duplicates never reach " +
      "the store, re-delivery exact") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("graft-ingest-pipe").toString
    val idxS = s"$base/idx"; val idxR = s"$base/idxR"
    val bloomDir = s"$base/bloom"; val inDir = s"$base/in"
    val ck = s"$base/ck"; val outP = s"$base/out"
    sources.IndexStore.build(spark, sf0001, idxS)
    val lakeText1 = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") === 1L).select(col("text"))
      .head().getString(0)
    val freshA = "ingest pipeline fresh document alpha entirely new words"
    val freshB = "ingest pipeline twin document beta shared by two arrivals"
    val freshC = "ingest pipeline final fresh document gamma"
    def asDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // batch 1: a lake copy (drop), a fresh doc (admit), a
    // batch-internal twin pair (admit the smaller id only)
    asDocs(Seq((30010L, lakeText1), (30020L, freshA),
      (30030L, freshB), (30040L, freshB)))
      .write.mode(SaveMode.Append).parquet(inDir)
    val q = streaming.IngestPipeline.startFolding(spark, inDir, sf0001,
      idxS, bloomDir, outP, ck)
    try q.awaitTermination() finally q.stop()
    // batch 2 LATER: a copy of batch 1's fresh doc (drop — caught
    // only via the bloom/exact fold) + one more fresh doc (admit)
    asDocs(Seq((30050L, freshA), (30060L, freshC)))
      .write.mode(SaveMode.Append).parquet(inDir)
    val q2 = streaming.IngestPipeline.startFolding(spark, inDir, sf0001,
      idxS, bloomDir, outP, ck)
    try q2.awaitTermination() finally q2.stop()
    val dec = spark.read.parquet(outP).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("admitted"))))
      .toMap
    assert(dec.size == 6, dec.toString)
    assert(dec(30010L) == ((true, false)), dec.toString)  // lake copy
    assert(dec(30020L) == ((false, true)), dec.toString)
    assert(dec(30030L) == ((false, true)), dec.toString)  // twin: min id
    assert(dec(30040L) == ((false, false)), dec.toString) // twin: dropped
    assert(dec(30050L) == ((true, false)), dec.toString)  // cross-batch dup
    assert(dec(30060L) == ((false, true)), dec.toString)
    // the store holds vectors for EXACTLY the admitted docs
    val landed = spark.read.parquet(s"$idxS/lsh")
      .filter(col("vec_id") >= 30000L).select(col("vec_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(landed == Set(30020L, 30030L, 30060L), landed.toString)
    // and equals a frozen-model rebuild over lake ∪ admitted-embedded
    for (a <- Seq("centroids", "codebook", "sq8params", "lshlayout"))
      spark.read.parquet(s"$idxS/$a").write.parquet(s"$idxR/$a")
    val admittedEmb = streaming.EmbedStream.embedBatch(
      asDocs(Seq((30020L, freshA), (30030L, freshB), (30060L, freshC))))
    val union = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).union(admittedEmb)
    sources.IndexStore.rebuildVectorFamilies(spark, idxR, union)
    assert(rows(sources.IndexStore.probeLsh(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeLsh(spark, sf0001, idxR)))
    assert(rows(sources.IndexStore.probeSq8(spark, sf0001, idxS)) ==
      rows(sources.IndexStore.probeSq8(spark, sf0001, idxR)))
    // at-least-once crash shape: re-deliver batch 2's content under
    // its own batch id — decisions, store deltas and bloom bits all
    // replace, never grow
    val m = streaming.BloomGateStream.frozenM(spark, bloomDir)
    val bands = streaming.GraphIngestStream.lakeBands(spark, sf0001)
    val codesBefore = spark.read.parquet(s"$idxS/sq8codes").count()
    val bitsBefore = streaming.BloomGateStream.readBits(spark, bloomDir)
      .count()
    streaming.IngestPipeline.writeBatch(
      asDocs(Seq((30050L, freshA), (30060L, freshC))), sf0001, idxS,
      bloomDir, outP, batchId = 1L, m, bands)
    assert(spark.read.parquet(s"$idxS/sq8codes").count() == codesBefore)
    assert(streaming.BloomGateStream.readBits(spark, bloomDir).count()
      == bitsBefore)
    val dec2 = spark.read.parquet(outP).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("admitted"))
      .toMap
    assert(dec2.size == 6 && dec2(30050L) == false && dec2(30060L) == true)
  }
}
