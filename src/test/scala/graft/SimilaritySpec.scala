package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** ANN quality contracts on a clusterable corpus. The driver's sf*
  * embeddings are near-random (approximate recall on noise is
  * meaningless), so these specs craft 3 tight clusters and assert the
  * approximate methods recover the structure exact search finds:
  * IVF/LSH recall vs brute force, and PQ's code-level cluster
  * resolution.
  */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  /** 3 well-separated centers × 40 members each; components bounded
    * away from 0 so tiny perturbations can't flip coordinate signs.
    * Queries (the fixed Similarity.annQueryIds present in this
    * 120-vector corpus) are ids 0 (cluster 0) and 100 (cluster 2).
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-sim").toString
    val dim = 64
    def center(c: Int): Array[Float] = Array.tabulate(dim) { i =>
      val s = math.sin(c * 131.7 + i * 2.3)
      (math.signum(s) * (0.2 + 0.8 * math.abs(s))).toFloat
    }
    val rows = (0 until 120).map { id =>
      val c = id / 40
      val base = center(c)
      val v = base.zipWithIndex.map { case (x, i) =>
        x + 0.001f * math.sin(id * 17.3 + i).toFloat
      }
      (id.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    d
  }

  private def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().filter(_.getAs[Int]("rn") <= 3)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  private def cluster(id: Long): Long = id / 40

  test("brute-force ground truth: every neighbor is same-cluster") {
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    assert(bf.keySet == Set(0L, 100L))
    bf.foreach { case (q, ns) =>
      assert(ns.size == 3 && ns.forall(cluster(_) == cluster(q)), s"$q -> $ns")
    }
  }

  test("s02 LSH recall: sign buckets keep the cluster together") {
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val lsh = top3(operators.Similarity.annLsh(spark, dir))
    bf.foreach { case (q, truth) =>
      val got = lsh.getOrElse(q, Set.empty)
      assert((got & truth).size >= 2, s"recall@3 < 2/3 for $q: $got vs $truth")
    }
  }

  test("s03 IVF recall: probing the own-label cell recovers brute top-3") {
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val ivf = top3(operators.Similarity.annIvf(spark, dir))
    bf.foreach { case (q, truth) =>
      val got = ivf.getOrElse(q, Set.empty)
      assert((got & truth).size >= 2, s"recall@3 < 2/3 for $q: $got vs $truth")
    }
  }

  test("s06 IVF-PQ: cell pruning + codes keep retrieval in-cluster") {
    val ivfpq = top3(operators.Similarity.annIvfPq(spark, dir))
    assert(ivfpq.keySet == Set(0L, 100L))
    ivfpq.foreach { case (q, ns) =>
      assert(ns.size == 3 && ns.forall(cluster(_) == cluster(q)), s"$q -> $ns")
    }
  }

  test("s07 exact re-rank: in-cluster retrieval, exact-cosine ordering") {
    val refined = operators.Similarity.annRefine(spark, dir)
    val rows = refined.collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 100L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3)
      // candidates come from the probed cells; exact re-rank must keep
      // retrieval in the query's own cluster
      rs.foreach(r =>
        assert(cluster(r.getAs[Long]("neighbor_id")) == cluster(q)))
      // the emitted score is the EXACT cosine, non-increasing in rank
      val byRank = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("cos_bp"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"$q")
    }
    // re-rank agrees with brute force on the candidate set: for each
    // query, s07's top-3 are the exact-cosine top-3 AMONG its top-10
    // ADC candidates — here clusters are tight, so candidates are all
    // same-cluster and brute-force's top-3 ⊆ cluster too
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    byQ.foreach { case (q, rs) =>
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      assert(got.map(cluster) == bf(q).map(cluster))
    }
  }

  test("s08 SQ8: quantized retrieval stays in-cluster, deterministic") {
    // SQ8's per-dim distortion (~range/512 + milli-floor ≈ 0.005) is
    // far below the inter-cluster separation but ABOVE the 0.001
    // intra-cluster perturbations, so the contract is the s05 one:
    // retrieval at cluster granularity matches brute force (within-
    // cluster order may legitimately shuffle under quantization)
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val sq = top3(operators.Similarity.annSq8(spark, dir))
    assert(sq.keySet == Set(0L, 100L))
    bf.foreach { case (q, truth) =>
      assert(sq(q).size == 3 && sq(q).map(cluster) == truth.map(cluster),
        s"cluster recall broken for $q: ${sq(q)} vs $truth")
    }
    // deterministic: a re-run is bit-identical
    val again = operators.Similarity.annSq8(spark, dir).collect()
    val first = operators.Similarity.annSq8(spark, dir).collect()
    assert(first.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("s09 recall audit agrees with the measured hit sets of every family") {
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val fams = Map(
      "s02_ann_lsh" -> top3(operators.Similarity.annLsh(spark, dir)),
      "s03_ann_ivf" -> top3(operators.Similarity.annIvf(spark, dir)),
      "s06_ann_ivfpq" -> top3(operators.Similarity.annIvfPq(spark, dir)),
      "s08_ann_sq8" -> top3(operators.Similarity.annSq8(spark, dir)),
      "s24_ann_ivfsq8" -> top3(operators.Similarity.annIvfSq8(spark, dir)))
    val audit = operators.Similarity.annRecallAudit(spark, dir).collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Long]("query_id")) ->
        (r.getAs[Int]("n_true"), r.getAs[Int]("n_hits"),
          r.getAs[Long]("recall_bp"))).toMap
    // one row per (family, query): the production "recall per index
    // per ingest" grid, all four families against ONE shared truth
    assert(audit.keySet ==
      (for (f <- fams.keySet; q <- Set(0L, 100L)) yield (f, q)))
    audit.foreach { case ((f, q), (nTrue, nHits, bp)) =>
      assert(nTrue == 3)
      // the audit's hit count IS the truth∩approx overlap
      assert(nHits == (bf(q) & fams(f).getOrElse(q, Set.empty)).size, s"$f/$q")
      assert(bp == nHits.toLong * 10000 / nTrue)
    }
  }

  test("s20 nprobe sweep: monotone recall, np=2 equals s09's s03 rows, all-cells is exact") {
    val sweep = operators.Similarity.nprobeSweep(spark, dir).collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("query_id")) ->
        (r.getAs[Int]("n_true"), r.getAs[Int]("n_hits"),
          r.getAs[Long]("recall_bp"))).toMap
    // full tuning grid: 3 settings × the 2 queries in this corpus
    assert(sweep.keySet ==
      (for (np <- Set(1, 2, 3); q <- Set(0L, 100L)) yield (np, q)))
    // probing more cells can only add candidates: recall is monotone
    for (q <- Seq(0L, 100L); np <- Seq(1, 2))
      assert(sweep((np, q))._2 <= sweep((np + 1, q))._2, s"np=$np q=$q")
    // np=2 IS s03's pinned setting — rows equal s09's s03 audit rows
    val audit = operators.Similarity.annRecallAudit(spark, dir).collect()
      .filter(_.getAs[String]("family") == "s03_ann_ivf")
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("n_true"), r.getAs[Int]("n_hits"),
          r.getAs[Long]("recall_bp"))).toMap
    for (q <- Seq(0L, 100L)) assert(sweep((2, q)) == audit(q), s"q=$q")
    // this corpus has 3 label centroids: np=3 probes EVERY cell, so
    // the sweep's top setting must recover brute truth exactly
    for (q <- Seq(0L, 100L)) assert(sweep((3, q)) == ((3, 3, 10000L)), s"q=$q")
  }

  test("s21 PQ distortion: exact (j, cid) grid, occupancy audits the stored codes") {
    val rep = operators.Similarity.pqDistortion(spark, dir).collect()
    // one row per codebook ENTRY (tight 3-cluster data collapses the
    // 16 seeds to few surviving codes; the real sf corpora keep all
    // 64 — ScaleSpec pins that bound)
    val cb = operators.VectorAgg.pqCodebook(spark, dir).collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("cid"))).toSet
    val grid = rep.map(r => (r.getAs[Int]("j"), r.getAs[Int]("cid"))).toSet
    assert(rep.length == cb.size && grid == cb,
      s"report grid ${grid.size} != codebook ${cb.size}")
    rep.groupBy(_.getAs[Int]("j")).foreach { case (j, rs) =>
      assert(rs.map(_.getAs[Long]("n_vecs")).sum == 120L, s"j=$j")
      val bp = rs.map(_.getAs[Long]("share_bp")).sum
      assert(bp <= 10000 && bp > 10000 - 16, s"j=$j bp=$bp")
    }
    rep.foreach { r =>
      assert(r.getAs[Long]("mse_mu") >= 0L, r.toString)
      assert(r.getAs[Boolean]("dead") == (r.getAs[Long]("n_vecs") == 0L),
        r.toString)
    }
    // occupancy IS the stored encoding's code histogram — the audit
    // measures s05/s06's actual codes, not a re-derived assignment
    val codes = operators.Similarity.pqCellCodesOf(
      operators.Similarity.cellAssignments(spark, dir),
      operators.VectorAgg.pqCodebook(spark, dir)).collect()
    val occ = rep.map(r => (r.getAs[Int]("j"), r.getAs[Int]("cid")) ->
      r.getAs[Long]("n_vecs")).toMap
    for (j <- 0 until 4) {
      val hist = codes.groupBy(_.getAs[Int](s"code$j"))
        .view.mapValues(_.size.toLong).toMap
      occ.keys.filter(_._1 == j).foreach { case key @ (_, c) =>
        assert(occ(key) == hist.getOrElse(c, 0L), s"j=$j c=$c")
      }
      // every stored code is a codebook entry the report covers
      hist.keys.foreach(c =>
        assert(occ.contains((j, c)), s"stored code $c uncovered at j=$j"))
    }
    // the integer error folds compile through LongVecDot, never the
    // interpreted HOF route
    val opt = operators.Similarity.pqDistortion(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("longvecdot") || opt.contains("LongVecDot"),
      opt.take(2000))
    assert(!opt.toLowerCase.contains("aggregate(zip_with"), opt.take(2000))
  }

  test("s10 radius search covers the same-cluster ball and the brute top-3") {
    val rows = operators.Similarity.rangeSearch(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(byQ.keySet == Set(0L, 100L))
    // every returned row clears the radius bar
    assert(rows.forall(_.getAs[Long]("cos_bp") >= 2000L))
    byQ.foreach { case (q, ns) =>
      // the full same-cluster ball (cosine ≈ 1 ≫ τ) is inside the radius
      val sameCluster =
        (0L until 120L).filter(i => i != q && cluster(i) == cluster(q)).toSet
      assert((sameCluster -- ns).isEmpty, s"$q missing ${sameCluster -- ns}")
    }
    // top-k and radius agree: every brute-force top-3 neighbor is in
    // the ball (its cosine is in-cluster, far above τ)
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    bf.foreach { case (q, ts) => assert(ts.subsetOf(byQ(q)), s"$q") }
  }

  test("c02 cluster sample: bounded per-cell, central-first, deterministic") {
    val rows = operators.Curation.clusterSample(spark, dir).collect()
    // corpus-derived knobs at n=120: k = max(10, 120/50) = 10,
    // cap = max(5, 120/100) = 5
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
    assert(byCell.values.forall(_.length <= 5), "cap exceeded")
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    byCell.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to rs.length), s"$c")
      val d = sorted.map(_.getAs[Long]("d2_milli"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b }, s"cell $c")
    }
    // every kept vector is from SOME cell of the 3 planted clusters —
    // with tight clusters a cell never mixes clusters, so the 5 most
    // central members of a cell share their cluster label
    byCell.values.foreach { rs =>
      assert(rs.map(r => cluster(r.getAs[Long]("vec_id"))).toSet.size == 1)
    }
    val again = operators.Curation.clusterSample(spark, dir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("pq codebook: K is a free parameter, build is deterministic") {
    val cb16 = operators.VectorAgg.pqCodebook(spark, dir).collect()
    // 4 subspaces, at most K=16 codes each (empty clusters may drop)
    val perSub = cb16.groupBy(_.getAs[Int]("j")).map { case (j, rs) => j -> rs.length }
    assert(perSub.keySet == Set(0, 1, 2, 3))
    assert(perSub.values.forall(n => n >= 3 && n <= 16), perSub)
    // no RNG anywhere: a rebuild is bit-identical
    val again = operators.VectorAgg.pqCodebook(spark, dir).collect()
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => ((r.getAs[Int]("j"), r.getAs[Int]("cid")),
        r.getAs[Seq[Float]]("scv"))).toMap
    assert(keyed(cb16) == keyed(again))
    // K=4 shrinks the codebook accordingly
    val cb4 = operators.VectorAgg.pqCodebook(spark, dir, k = 4).collect()
    assert(cb4.groupBy(_.getAs[Int]("j")).values.forall(_.length <= 4))
  }

  test("s05 cluster recall matches brute force (codes can't rank within ties)") {
    // within a tight cluster all members share identical codes, so
    // ADC ties and exact top-3 overlap with brute is not meaningful;
    // the recall contract is at cluster granularity: PQ retrieves
    // from exactly the clusters brute force retrieves from
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val pq = top3(operators.Similarity.annPq(spark, dir))
    bf.foreach { case (q, truth) =>
      val got = pq.getOrElse(q, Set.empty)
      assert(got.map(cluster) == truth.map(cluster),
        s"cluster recall broken for $q: $got vs $truth")
    }
  }

  test("s05 PQ codes resolve cluster membership") {
    val pq = top3(operators.Similarity.annPq(spark, dir))
    assert(pq.keySet == Set(0L, 100L))
    // same-cluster members share all 4 codes, so ADC puts the whole
    // own cluster ahead of any other — every retrieved neighbor must
    // be same-cluster (within-cluster order legitimately differs from
    // brute: identical codes tie and break by vec_id)
    pq.foreach { case (q, ns) =>
      assert(ns.size == 3 && ns.forall(cluster(_) == cluster(q)), s"$q -> $ns")
    }
  }

  test("s14 RRF: consensus neighbors outrank single-index neighbors") {
    val fused = operators.Similarity.rrfFusion(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val inA = operators.Similarity.annLsh(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val inB = operators.Similarity.annIvf(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(fused.nonEmpty)
    fused.foreach { case (q, rs) =>
      val both = inA(q) intersect inB(q)
      val scores = rs.map(r =>
        r.getAs[Long]("neighbor_id") -> r.getAs[Long]("rrf_milli")).toMap
      // a neighbor both indexes surface scores two rrf terms; any
      // single-index neighbor scores one — consensus must dominate
      if (both.nonEmpty) {
        val cons = scores.view.filterKeys(both.contains).values
        val single = scores.view.filterKeys(n => !both.contains(n)).values
        assert(single.isEmpty || cons.min > single.max,
          s"$q: consensus $cons vs single $single")
        val top1 = rs.minBy(_.getAs[Int]("rn")).getAs[Long]("neighbor_id")
        assert(both.contains(top1), s"$q top1 $top1 not in $both")
      }
    }
  }

  test("s13 BM25: coverage beats partial match, length normalization penalizes padding") {
    val d = Files.createTempDirectory("graft-bm25").toString
    val filler = (1 to 50).map(i => s"filler$i").mkString(" ")
    Seq(
      (0L, "hash join spark", "en"),                  // all 3 q1 terms, short
      (1L, s"hash join spark $filler", "en"),         // all 3, padded long
      (2L, "hash table probe lookup", "en"),          // 1 term only
      (3L, filler, "en"))                             // no q1 terms
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val q1 = operators.Similarity.bm25Search(spark, d).collect()
      .filter(_.getAs[String]("qid") == "q1")
      .sortBy(_.getAs[Int]("rn"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_milli")))
    // full coverage short > full coverage padded > single-term;
    // the no-term doc never appears
    assert(q1.map(_._1).toSeq == Seq(0L, 1L, 2L), q1.toSeq.toString)
    assert(q1(0)._2 > q1(1)._2 && q1(1)._2 > q1(2)._2, q1.toSeq.toString)
  }

  test("s12 filtered ANN: pre-filter restricts to the query's label, equi-join plan") {
    val df = operators.Similarity.annFiltered(spark, dir)
    // the label predicate joins as an EQUI key — a BroadcastHashJoin,
    // strictly better than s01's allowlisted nested-loop scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val rows = df.collect()
    val label = (id: Long) => (id / 40).toInt // fixture layout
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length == 3)
      assert(rs.forall(r => label(r.getAs[Long]("neighbor_id")) == label(q)),
        s"$q: ${rs.map(_.getAs[Long]("neighbor_id")).toSeq}")
    }
    // within the label slice the ranking is exactly brute force: the
    // filtered top-3 must appear in the unfiltered top-5 of its label
    val brute = operators.Similarity.annBruteForce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val bruteSameLabel = brute(q)
        .filter(r => label(r.getAs[Long]("neighbor_id")) == label(q))
        .map(_.getAs[Long]("neighbor_id")).toSet
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      assert(got.subsetOf(bruteSameLabel) || bruteSameLabel.size < 3,
        s"$q: $got vs $bruteSameLabel")
    }
  }

  test("c04 outlier scrub: the planted far vector flags, tight-cluster members don't") {
    val d = Files.createTempDirectory("graft-c04").toString
    val dim = 64
    def center(c: Int): Array[Float] = Array.tabulate(dim) { i =>
      val s = math.sin(c * 131.7 + i * 2.3)
      (math.signum(s) * (0.2 + 0.8 * math.abs(s))).toFloat
    }
    val inliers = (0 until 120).map { id =>
      val v = center(id / 40).zipWithIndex.map { case (x, i) =>
        x + 0.001f * math.sin(id * 17.3 + i).toFloat
      }
      (id.toLong, v, id / 40)
    }
    // id 200: 1.15× a cluster center — an encoder drift case: far
    // beyond the cluster's ~0.001 jitter (d2 ≈ 0.0225·|c|² ≫ 2.5×
    // the cell mean) yet close enough to cluster 0 that the k-means
    // keeps it IN a populated cell (a 3× blow-up earns its own
    // singleton centroid under K = ⌈√n⌉, and the ≥5-member rule
    // rightly skips singleton cells)
    val rows = inliers :+ ((200L, center(0).map(_ * 1.15f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    val out = operators.Curation.outlierScrub(spark, d).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(200L).getAs[Boolean]("outlier"), byId(200L).toString)
    // tight-cluster members sit at floor-0 distance in their cells —
    // never flagged (0 > 0 is false even when the cell mean is 0)
    val flagged = out.filter(_.getAs[Boolean]("outlier"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(flagged.contains(200L) && flagged.size <= 12,
      s"flagged $flagged")
    assert(inliers.count { case (id, _, _) =>
      byId(id).getAs[Long]("d2_milli") == 0L && flagged.contains(id) } == 0)
  }

  test("sampled k-means training preserves quantizer distortion vs full training") {
    // the r13 build fix's QUALITY guard: at the same K, centroids
    // trained on the min(n, 16·K) salted-md5 sample must quantize the
    // FULL corpus nearly as tightly as centroids trained on all of it
    // (the 16-points-per-centroid budget is a knob — this pins that
    // the chosen value isn't silently wrecking the cell structure).
    // Deterministic on both sides, so the bound is a measurement, not
    // a flake: sf0.001 measures ~1.02× (sampled/full).
    import org.apache.spark.sql.functions._
    import graft.functions.Vector
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val k = operators.Dedup.semanticK(n)
    assert(operators.VectorAgg.trainTarget(n, k) < n,
      s"vacuous: sampling inactive at n=$n, K=$k")
    def distortion(cent: org.apache.spark.sql.DataFrame): Double =
      operators.VectorAgg.kmeansAssign(emb, cent)
        .join(broadcast(cent), "cid")
        .select(avg(Vector.dot(col("embedding"), col("embedding"))
          + Vector.dot(col("cv"), col("cv"))
          - lit(2.0) * Vector.dot(col("embedding"), col("cv"))).as("d2"))
        .head().getDouble(0)
    val full = distortion(
      operators.VectorAgg.kmeansCentroids(spark, emb, k))
    val sampled = distortion(
      operators.VectorAgg.kmeansCentroidsSampled(spark, emb, n, k))
    assert(full > 0.0 && sampled <= 1.15 * full,
      f"sampled-training distortion $sampled%.4f vs full $full%.4f: " +
        "the 16/centroid budget degraded the quantizer")
  }

  test("s11 MMR: first pick is the brute top-1, picks distinct, greedy law holds") {
    val mmr = operators.Similarity.mmrRerank(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val brute = operators.Similarity.annBruteForce(spark, sf0001).collect()
      .filter(_.getAs[Int]("rn") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(mmr.nonEmpty)
    mmr.foreach { case (q, rows) =>
      val byRn = rows.map(r => r.getAs[Int]("rn") -> r).toMap
      assert(byRn.size == 3, s"$q: ${rows.length} rows")
      // pick 1 is relevance-only — must equal the brute-force top-1
      assert(byRn(1).getAs[Long]("neighbor_id") == brute(q), s"query $q")
      // selections are pairwise distinct
      val ids = rows.map(_.getAs[Long]("neighbor_id")).toSet
      assert(ids.size == 3, s"$q picked $ids")
      // greedy law: round 3 maximizes over a SUBSET of round 2's set
      // with a pointwise-larger penalty (max over {s1,s2} ≥ sim to s1
      // alone), so its max can only fall. (mmr1 vs mmr2 is NOT
      // monotone in general — negative pool sims can raise round 2.)
      assert(byRn(2).getAs[Long]("mmr_units") >= byRn(3).getAs[Long]("mmr_units"),
        s"$q mmr2 < mmr3")
    }
  }

  test("s16 graph-expanded search: recall >= seeds, in-cluster, ranked") {
    val bf = top3(operators.Similarity.annBruteForce(spark, dir))
    val lsh = top3(operators.Similarity.annLsh(spark, dir))
    val gs = operators.Similarity.graphExpandSearch(spark, dir).collect()
    val byQ = gs.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 100L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2, 3), s"$q")
      rs.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != q && cluster(nb) == cluster(q), s"$q -> $nb")
      }
      val ranked = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("cos_bp"))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b }, s"$q")
      // cluster-granularity recall (the s08 convention — the re-rank
      // runs in the quantized space, so within-cluster order may
      // legitimately differ from the float brute ranking by an
      // epsilon swap): retrieval must land in the same cluster the
      // brute truth and the seeds land in
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      assert(got.map(cluster) == bf(q).map(cluster), s"$q: $got vs ${bf(q)}")
      assert(lsh.getOrElse(q, Set.empty).map(cluster) == got.map(cluster))
    }
  }

  test("s15 kNN graph: full coverage, same-cluster neighbors, ranked") {
    // every cluster member shares sign buckets with its 39 siblings
    // (components bounded 0.2 from zero, 0.001 perturbations), so all
    // 120 nodes have candidates and in-cluster cosine ≈ 1 dominates
    // any cross-cluster bucket coincidence → 3 same-cluster rows/node
    val g = operators.Similarity.knnGraph(spark, dir).collect()
    assert(g.length == 360, s"got ${g.length}")
    val byV = g.groupBy(_.getAs[Long]("vec_id"))
    assert(byV.size == 120)
    byV.foreach { case (v, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2, 3), s"$v")
      rs.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != v && cluster(nb) == cluster(v), s"$v -> $nb")
      }
      val ranked = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("cos_bp"))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b }, s"$v")
    }
  }

  test("s15/s16 score through the LongVecDot kernel, not interpreted HOFs") {
    // the r10 verdict's top finding: milliQuantized pair scoring ran
    // the CodegenFallback aggregate(zip_with(...), 0L, ...) route per
    // candidate pair. The integer arms of RewriteHofDotProduct must
    // leave NO higher-order aggregate anywhere in either plan.
    for (df <- Seq(operators.Similarity.knnGraph(spark, dir),
        operators.Similarity.graphExpandSearch(spark, dir),
        operators.Similarity.hardNegatives(spark, dir))) {
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("longvecdot") || opt.contains("LongVecDot"),
        s"LongVecDot missing:\n${opt.take(2000)}")
      assert(!opt.toLowerCase.contains("aggregate(zip_with"),
        s"interpreted HOF dot survived:\n${opt.take(2000)}")
      assert(!opt.toLowerCase.contains("aggregate(mq"),
        s"interpreted HOF norm survived:\n${opt.take(2000)}")
    }
  }

  test("s19 hard negatives: nearest cross-label vectors inside the confusable cluster") {
    // the archetypal miner corpus: ONE tight cluster whose members
    // split two labels (near-identical vectors, different class — the
    // pairs contrastive training needs), plus a far cluster with its
    // own label. In-cluster cosine ≈ 1 dominates any cross-cluster
    // bucket coincidence, so every cluster-0 anchor's top-2 negatives
    // must be opposite-parity members of its OWN cluster.
    val d = Files.createTempDirectory("graft-hn").toString
    val dim = 64
    def center(c: Int): Array[Float] = Array.tabulate(dim) { i =>
      val s = math.sin(c * 131.7 + i * 2.3)
      (math.signum(s) * (0.2 + 0.8 * math.abs(s))).toFloat
    }
    val rows = (0 until 80).map { id =>
      val c = id / 40
      val v = center(c).zipWithIndex.map { case (x, i) =>
        x + 0.001f * math.sin(id * 17.3 + i).toFloat
      }
      val label = if (c == 0) (id % 2).toInt else 2
      (id.toLong, v, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    val out = operators.Similarity.hardNegatives(spark, d).collect()
    val byV = out.groupBy(_.getAs[Long]("vec_id"))
    // every cluster-0 anchor mines exactly 2 negatives
    (0L until 40L).foreach(v => assert(byV.contains(v), s"anchor $v missing"))
    out.foreach { r =>
      assert(r.getAs[Int]("label") != r.getAs[Int]("neg_label"),
        s"same-label negative: $r")
    }
    byV.filter(_._1 < 40).foreach { case (v, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2), s"$v")
      rs.foreach { r =>
        val nb = r.getAs[Long]("negative_id")
        assert(nb < 40 && (nb % 2) != (v % 2), s"$v -> $nb")
      }
      val ranked = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("cos_bp"))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b }, s"$v")
    }
    // brute truth: rn=1 is THE most-similar opposite-label vector
    // (exact cosine over the same milli-quantized space the operator
    // ranks in; in-cluster candidates all share every band's bucket,
    // so the banded set contains the full opposite-parity cluster)
    def mq(a: Array[Float]): Array[Long] =
      a.map(x => math.floor(x.toDouble * 1000).toLong)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (x, y) = (mq(a), mq(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot.toDouble / math.sqrt(
        x.map(p => p * p).sum.toDouble * y.map(q => q * q).sum.toDouble)
    }
    val vecs = rows.map(r => r._1 -> r._2).toMap
    (0L until 40L).foreach { v =>
      val truth = (0L until 40L).filter(n => (n % 2) != (v % 2))
        .map(n => (-cos(vecs(v), vecs(n)), n)).sorted.head._2
      val got = byV(v).find(_.getAs[Int]("rn") == 1).get
        .getAs[Long]("negative_id")
      assert(got == truth, s"anchor $v: got $got, brute $truth")
    }
  }

  test("s18 index health flags the hot cell and keeps the empty cell visible") {
    // 9 vectors on c0's axis, 1 on c1's, none near c2
    val e = ((0 until 9).map(i =>
        (i.toLong, Array(1f, 0.01f * i, 0f, 0f))) :+
        ((9L, Array(0.01f, 1f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val cent = Seq(
      (0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)),
      (2, Array(0f, 0f, 1f, 0f))).toDF("cid", "cv")
    val out = operators.Similarity.indexHealthOf(spark, e, cent).collect()
      .map(r => r.getAs[Int]("cid") -> r).toMap
    assert(out.size == 3)
    assert(out(0).getAs[Long]("n_vecs") == 9L)
    assert(out(0).getAs[Long]("share_bp") == 9000L)
    assert(out(0).getAs[Long]("load_bp") == 27000L) // 2.7x balanced
    assert(out(0).getAs[Boolean]("hot"))
    assert(!out(0).getAs[Boolean]("empty"))
    assert(out(1).getAs[Long]("n_vecs") == 1L)
    assert(!out(1).getAs[Boolean]("hot"))
    // the empty cell is REPORTED, not silently dropped
    assert(out(2).getAs[Long]("n_vecs") == 0L)
    assert(out(2).getAs[Boolean]("empty"))
    assert(out(2).getAs[Long]("load_bp") == 0L)
  }

  /** s22: full independent Scala re-derivation on sf0.001 — centroid
    * milli-ints, milli-quantized cosine, argmax, mean and flag — row
    * for row against the operator.
    */
  test("s22 OOD scrub: Scala re-derivation matches every row; both " +
      "flag regimes populated") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    val dim = vecs.head._2.length
    // m04's centroid rule: floor(mean * 1000) per component, BIGINT
    val cents: Map[Int, Array[Long]] = vecs.groupBy(_._3).map {
      case (lab, vs) =>
        lab -> Array.tabulate(dim) { i =>
          math.floor(vs.map(_._2(i).toDouble).sum / vs.length * 1000).toLong
        }
    }
    def milli(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000).toLong)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum.toDouble
      dot / math.sqrt((a.map(x => x * x).sum * b.map(x => x * x).sum).toDouble)
    }
    val best = vecs.map { case (id, emb, lab) =>
      val mv = milli(emb)
      val (bl, bc) = cents.toSeq
        .map { case (cl, mc) => (cl, cos(mv, mc)) }
        .minBy { case (cl, c) => (-c, cl) }
      (id, lab, bl, math.floor(bc * 10000).toLong)
    }
    val meanBp = best.map(_._4 + 10000L).sum / best.length - 10000L
    val exp = best.map { case (id, lab, bl, bp) =>
      id -> ((lab, bl, bp, bp * 10 < meanBp * 8, bl == lab))
    }.toMap
    val out = operators.Similarity.oodScrub(spark, sf0001).collect()
    assert(out.length == exp.size)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val got = (r.getAs[Int]("label"), r.getAs[Int]("best_label"),
        r.getAs[Long]("best_cos_bp"), r.getAs[Boolean]("is_ood"),
        r.getAs[Boolean]("agrees"))
      assert(got == exp(id), s"vec $id: got $got expected ${exp(id)}")
    }
    val flagged = out.count(_.getAs[Boolean]("is_ood"))
    assert(flagged > 0 && flagged < out.length, s"flagged=$flagged")
  }

  test("s23 centroid drift: hand-walked exact-value halves, zero-drift " +
      "label, shares over the total") {
    val d = Files.createTempDirectory("graft-s23").toString
    // dyadic values: exact in float AND double, so the milli-floored
    // centroid averages are order-independent and exact by hand
    Seq(
      (0L, Array(1.0f, 3.0f), 0),   // label 0, even half
      (2L, Array(3.0f, 5.0f), 0),   //   → centroid (2.0, 4.0)
      (1L, Array(2.0f, 8.0f), 0),   // label 0, odd half → (2.0, 8.0)
      (4L, Array(1.0f, 1.0f), 1),   // label 1: identical halves
      (5L, Array(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    val out = operators.Similarity.centroidDrift(spark, d).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("dist2_milli"), r.getAs[Long]("share_bp")))).toMap
    assert(out.size == 2, out.toString)
    // label 0: dist² = (2000-2000)² + (4000-8000)² = 16,000,000
    assert(out(0) == ((2L, 1L, 16000000L, 10000L)), out.toString)
    // label 1: zero drift, zero share (total guarded > 0)
    assert(out(1) == ((1L, 1L, 0L, 0L)), out.toString)
  }
}
