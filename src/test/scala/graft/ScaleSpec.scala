package graft

import java.nio.file.Files

/** Scale-linearity assertions (round-7 verdict item #2): inflate the
  * corpus 10× with independent-content copies (ScaleCheck/Inflate) and
  * assert the candidate generators' output grows ~linearly — the
  * empirical leg of the 100 TB design claims. Thresholds carry ~2×
  * slack over exactly-linear (10×): the data is deterministic, but
  * per-copy hash re-randomization legitimately moves constants (e.g.
  * d03's lo/hi half split differs per rotated copy).
  */
class ScaleSpec extends SparkSpecBase {

  private val baseN = 200L
  private val factor = 10

  private lazy val measured = {
    val work = Files.createTempDirectory("graft-scale").toString
    ScaleCheck.run(spark, sf0001, work, baseN = baseN, factor = factor)
  }
  private lazy val growth =
    measured._1.map(g => g.name -> g).toMap
  private lazy val trim = measured._2

  test("d02 minhash-LSH candidates grow ~linearly (band keys hash 4 minhashes)") {
    val g = growth("d02_cand")
    assert(g.inflated <= 20 * math.max(g.base, 5L),
      s"d02 candidates ${g.base} -> ${g.inflated}: superlinear")
  }

  test("d03 simhash candidates grow ~linearly (2^16 buckets/side)") {
    val g = growth("d03_cand")
    // per-copy half-split re-randomization moves the constant (~2x);
    // quadratic growth would be ~100x
    assert(g.inflated <= 25 * math.max(g.base, 5L),
      s"d03 candidates ${g.base} -> ${g.inflated}: superlinear")
  }

  test("d04 shared-shingle candidates grow ~linearly (df-capped, disjoint copies)") {
    val g = growth("d04_cand")
    assert(g.inflated <= 20 * math.max(g.base, 5L),
      s"d04 candidates ${g.base} -> ${g.inflated}: superlinear")
  }

  test("d13 adaptive block width: candidate SHARE shrinks where a fixed width saturates") {
    // r12 verdict #2: the widening's scale claim, measured with the
    // 15-bit floor removed (both corpora would otherwise sit on the
    // floor). share = candidates / C(n,2). At the FIXED 10-bit width
    // the random-collision share ~4/2^10 is corpus-INVARIANT, so the
    // candidate count grows ~n² (saturation — the old 60-bit layout's
    // fate past n≈8k); at the adaptive ⌈log₂n⌉+2 width (10 → 13 bits
    // here) the share shrinks ~2^(-Δb) and candidates stay ~linear.
    val fx = growth("d13_cand_fixed10")
    val ad = growth("d13_cand_logwidth")
    def share(c: Long, n: Long): Double = c.toDouble / (n.toDouble * (n - 1) / 2)
    val bigN = baseN * factor
    info(f"fixed10 share ${share(fx.base, baseN)}%.5f -> ${share(fx.inflated, bigN)}%.5f; " +
      f"adaptive ${share(ad.base, baseN)}%.5f -> ${share(ad.inflated, bigN)}%.5f")
    assert(fx.base == ad.base, "widths diverge at base: both should be 10 bits")
    // adaptive: share strictly shrinks under inflation
    assert(share(ad.inflated, bigN) < 0.6 * share(ad.base, baseN),
      s"adaptive share did not shrink: ${ad.base} -> ${ad.inflated}")
    // fixed: saturates — collides a multiple of the adaptive layout
    assert(fx.inflated > 2 * ad.inflated,
      s"fixed width did not saturate vs adaptive: ${fx.inflated} vs ${ad.inflated}")
  }

  test("d04 contract df-cap bounds stop-shingle fanout as the corpus grows") {
    // the cap's 100 TB claim at its BINDING regime (the measured
    // d04_cand row uses disjoint copies where the cap never binds):
    // every doc shares one opener trigram, so an uncapped join would
    // generate n·(n-1)/2 pairs — 4,950 then 495,000. The contract
    // cap (max(8, ceil(log2 n)) ≪ n) excludes the stop shingle at
    // BOTH sizes: candidates stay ZERO however large n grows.
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    for (n <- Seq(100, 1000)) {
      val d = Files.createTempDirectory(s"graft-d04cap-$n").toString
      (0 until n).map(i => (i.toLong, s"stop stop stop u${i}a u${i}b u${i}c",
          "en", "s", 30L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
      val cand = operators.Dedup.ngramJaccardCandidates(spark, d).count()
      assert(cand == 0L, s"n=$n: $cand stop-shingle pairs leaked past the cap")
    }
  }

  test("graph fold candidates stay batch-shaped as the lake grows 10x") {
    // GraphIngestStream's 100 TB claim: a micro-batch's fold work is
    // ∝ the batch's collisions against the stored key index, NOT
    // corpus-shaped — the frozen adaptive band layout grows bits with
    // ⌈log₂ n⌉, holding per-bucket occupancy ~flat, so a FIXED
    // 5-vector batch's candidate count must stay far under the 10×
    // the lake grew by (a flat-band layout would grow it ~10×).
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val batch = emb.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val counts = Seq(150L, 1500L).map { n =>
      val lake = emb.filter($"vec_id" >= 5 && $"vec_id" < 5 + n)
        .select($"vec_id", $"embedding")
      val bands = operators.Dedup.adaptiveBands(n)
      val kb = operators.Similarity.bandKeysOf(batch, bands)
      val kl = operators.Similarity.bandKeysOf(lake, bands)
      kb.select($"vec_id".as("src"), $"band", $"bucket")
        .join(kl.select($"vec_id".as("dst"), $"band", $"bucket"),
          Seq("band", "bucket"))
        .select($"src", $"dst").distinct().count()
    }
    assert(counts(1) <= 4 * math.max(counts(0), 5L),
      s"fold candidates ${counts(0)} -> ${counts(1)}: corpus-shaped")
  }

  test("d13 multi-block candidates are sub-quadratic (all-pairs share shrinks)") {
    // within-copy candidates are the vocabulary-correlated constant
    // (grows ×factor); cross-copy collisions exceed the uniform
    // ~4·n²/2^15 estimate because even rotated copies draw from a
    // small vocabulary (sign-sums concentrate — measured ~7× uniform
    // at this n). The robust scale signal is the candidate SHARE of
    // all-pairs: quadratic growth keeps the share constant, the
    // 15-bit blocks must shrink it markedly under 10× inflation
    // (measured: ~2.4 % → ~0.4 %; the documented hard ceiling starts
    // at n ≈ 2^15/4, past which the construction widens the
    // fingerprint — Dedup.scala d13 Scaladoc)
    val g = growth("d13_cand")
    val n0 = baseN
    val n1 = factor * n0
    val baseShareBp = 10000L * g.base / (n0 * (n0 - 1) / 2)
    val inflShareBp = 10000L * g.inflated / (n1 * (n1 - 1) / 2)
    assert(inflShareBp * 3 <= baseShareBp,
      s"d13 all-pairs share ${baseShareBp}bp -> ${inflShareBp}bp: not sub-quadratic")
  }

  test("d05 fixed 3-bit bands are the documented SUPERlinear case") {
    val g = growth("d05_cand_3bit")
    // ~bands*n^2/2^bits with bits fixed: 10x corpus => ~100x pairs.
    // This assertion pins the MOTIVATION for the log-scaled knob; if
    // it ever fails the scale story in SURVEY 5 needs rewriting.
    assert(g.inflated >= 20 * math.max(g.base, 1L),
      s"d05 3-bit candidates ${g.base} -> ${g.inflated}: expected quadratic-ish")
  }

  test("d05 log2(n)-scaled bands hold candidates ~linear") {
    val g = growth("d05_cand_autobit")
    assert(g.inflated <= 20 * math.max(g.base, 5L),
      s"d05 auto-bit candidates ${g.base} -> ${g.inflated}: superlinear")
  }

  test("t33 cross-split candidates grow ~linearly and stay a sliver of d05's") {
    val g = growth("t33_cand")
    assert(g.inflated <= 20 * math.max(g.base, 5L),
      s"t33 candidates ${g.base} -> ${g.inflated}: superlinear")
    // the cross-split restriction (benchmark side = 2% of the corpus)
    // keeps the join output well under the full self-join's — ~4% in
    // expectation; assert a loose 5x margin against the same layout
    val d05 = growth("d05_cand_autobit")
    assert(g.inflated * 5L <= math.max(d05.inflated, 1L),
      s"t33 candidates ${g.inflated} not a sliver of d05's ${d05.inflated}")
  }

  test("s19 cross-label candidates grow ~linearly under the adaptive layout") {
    val g = growth("s19_cand")
    assert(g.inflated <= 20 * math.max(g.base, 5L),
      s"s19 candidates ${g.base} -> ${g.inflated}: superlinear")
    // directed + cross-label (~7/8 of collisions on 8 near-uniform
    // labels) ⇒ bounded by ~2x d05's undirected full self-join
    val d05 = growth("d05_cand_autobit")
    assert(g.inflated <= 2 * math.max(d05.inflated, 5L),
      s"s19 candidates ${g.inflated} exceed 2x d05's ${d05.inflated}")
  }

  test("d06 PassJoin candidates stay ~linear on entropy-bearing names") {
    val g = growth("d06_cand")
    // expected counts are tiny (random 24-hex-char names) — use an
    // absolute floor so a 0 -> 40 move doesn't read as a 40x ratio
    assert(g.inflated <= 20 * math.max(g.base, 10L),
      s"d06 candidates ${g.base} -> ${g.inflated}: superlinear")
  }

  test("s04 fixed-query hybrid candidates stay ~constant as the corpus inflates") {
    val g = growth("s04_cand")
    // fixed ≤9-query set + content-disjoint copies: a query's rare-
    // shingle matches live in its own copy, so candidate volume must
    // NOT track corpus size (the old doc_id % 10 rule grew ~10x here);
    // slack covers df-cap shifts from the 10x larger shingle table
    assert(g.inflated <= 3 * math.max(g.base, 10L),
      s"s04 candidates ${g.base} -> ${g.inflated}: corpus-proportional")
  }

  test("d12 within-cell pairs track ~n^1.5 when K = ceil(sqrt(n))") {
    val g = growth("d12_pairs")
    // pairs ≈ n²/(2K): with K = semanticK(n) = ⌈√n⌉ the total is
    // ~n^1.5/2 — the balance point against the n·K build/assign pass
    // (r12 verdict #1; K ∝ n kept pairs linear but made the BUILD
    // Θ(n²/50)). Expected ratio under 10× is 10^1.5 ≈ 32; 60× covers
    // sample-trained cell imbalance while cleanly separating from
    // pinned-K quadratic (~100×)
    assert(g.base > 0 && g.inflated <= 60 * g.base,
      s"d12 pairs ${g.base} -> ${g.inflated}: worse than ~n^1.5")
  }

  test("k-means build counters grow ~sqrt(n): training sample and centroid table") {
    // the r12 verdict #1 done-criterion: the coarse-quantizer BUILD
    // must be sublinear. Training rows = min(n, 16·K) — the base
    // (n=200 ≤ 16·15) trains full, the inflated corpus (n=2000,
    // 16·45=720) SAMPLES — and the centroid table is ≤ K = ⌈√n⌉
    // (k-means may drop empty seed cells). Ratios ~3.6 and ~3 under
    // 10× inflation; full-corpus training would read 10× on both.
    val tr = growth("km_train_rows")
    val ct = growth("km_centroid_rows")
    val bigN = baseN * factor
    assert(tr.base == baseN, s"base (n-bound regime) must train full: ${tr.base}")
    assert(tr.inflated < bigN / 2,
      s"km train rows ${tr.inflated}: sampling inactive at n=$bigN")
    assert(tr.inflated <= 5 * tr.base && tr.inflated >= bigN / 5,
      s"km train rows ${tr.base} -> ${tr.inflated}: off the ~16·sqrt(n) rule")
    assert(ct.base > 0 && ct.base <= operators.Dedup.semanticK(baseN),
      s"km centroid rows ${ct.base} exceed K($baseN)")
    assert(ct.inflated <= operators.Dedup.semanticK(bigN) &&
      ct.inflated <= 4 * ct.base,
      s"km centroid rows ${ct.base} -> ${ct.inflated}: not ~sqrt(n)")
  }

  test("t19 excised-occurrence volume grows ~linearly on disjoint copies") {
    val g = growth("t19_hits")
    // within-copy duplicate structure replicates exactly ×10; only
    // rare cross-copy rotated-token collisions can push above that
    assert(g.inflated >= factor * g.base && g.inflated <= 2 * factor * math.max(g.base, 5L),
      s"t19 hits ${g.base} -> ${g.inflated}: not ~linear")
  }

  test("c02 coreset stays K(n)*cap(n)-bounded as the corpus inflates") {
    val g = growth("c02_rows")
    def bound(n: Long): Long = {
      val k = operators.Dedup.semanticK(n)
      k.toLong * math.max(5L, n / (k.toLong * 10L))
    }
    assert(g.base <= bound(baseN) && g.inflated <= bound(factor * baseN),
      s"c02 rows ${g.base} -> ${g.inflated} exceed K*cap bounds " +
        s"${bound(baseN)}/${bound(factor * baseN)}")
    // and the kept set grows with the corpus, not frozen at the base
    assert(g.inflated >= g.base, s"c02 rows shrank: ${g.base} -> ${g.inflated}")
  }

  test("t22 DSIR model stays capacity-bounded as the corpus inflates") {
    val g = growth("t22_model_rows")
    // the model is hashed features: its row count saturates at the
    // 10k bucket space no matter the corpus — THE property that makes
    // broadcasting it safe at 100 TB (corpus-sized growth would fail)
    assert(g.base > 0 && g.inflated <= 10000L,
      s"t22 model ${g.base} -> ${g.inflated}: exceeds bucket capacity")
  }

  test("t24 BPE pair vocabulary stays alphabet-bounded as the corpus inflates") {
    val g = growth("t24_pair_vocab")
    // adjacent char pairs live in the ~(26+10+punct)² space however
    // big the corpus — corpus-sized growth would make merge rounds
    // corpus-sized aggregates; rotation keeps the alphabet fixed
    assert(g.base > 0 && g.inflated <= 2500L,
      s"t24 pair vocab ${g.base} -> ${g.inflated}: exceeds alphabet bound")
    // rotation mints new pairs per copy (each copy writes a different
    // slice of the pair space), so the measured shape is sub-linear
    // growth INTO the fixed ceiling, not flatness from the start
    // (measured: 82 -> 505 of ~1300 possible at 10× inflation)
    assert(g.inflated < factor * g.base,
      s"t24 pair vocab ${g.base} -> ${g.inflated}: linear-or-worse")
  }

  test("s11 MMR pool stays constant-size as the corpus inflates") {
    val g = growth("s11_pool_rows")
    // top-10 per FIXED query: ≤ 10·|Q| rows at any corpus size, and
    // inflation must not grow it (the s04 fixed-query-set rule)
    assert(g.base > 0 && g.inflated <= 10L * operators.Similarity.annQueryIds.length)
    assert(g.inflated == g.base,
      s"s11 pool ${g.base} -> ${g.inflated}: grew with the corpus")
  }

  test("s02 max bucket occupancy stays ~flat under the adaptive bit count") {
    // bits = max(3, ceil(log2 n) - 3): 10x the corpus adds ~3 bits, so
    // expected occupancy n/2^bits is ~8 at BOTH sizes — per-probe scan
    // work is ~constant, the r11 verdict's sublinear-probe criterion
    // (the old 3 pinned planes grew max occupancy ~10x here). Slack 4x
    // over flat: occupancy is a max over multinomial buckets and the
    // pow2 boundary can leave the inflated side one bit short.
    val g = growth("s02_max_bucket")
    assert(g.base > 0 && g.inflated <= 4 * math.max(g.base, 8L),
      s"s02 max bucket ${g.base} -> ${g.inflated}: grew with the corpus")
  }

  test("ANN probe candidates grow SUBLINEARLY under the adaptive layouts") {
    // the r11 verdict's done-criterion: probed-candidate count per
    // fixed query set must not track the corpus. s02: +~3 bits at 10×
    // keeps bucket occupancy ~flat; s03: K(n) = max(10, ⌈√n⌉) keeps
    // per-query cell population ~2·n/K = 2√n (expected ~3.2× here).
    // Allow 4× over flat for multinomial scatter and pow2/K-floor
    // boundaries — linear would be ~10×.
    for (name <- Seq("s02_probe_cand", "s03_probe_cand")) {
      val g = growth(name)
      assert(g.base > 0, s"$name: empty base probe")
      assert(g.inflated <= 4 * g.base,
        s"$name ${g.base} -> ${g.inflated}: tracks the corpus (linear)")
    }
  }

  test("r37 sketch-overlap report is corpus-invariant (one row per type pair)") {
    val g = growth("r37_rows")
    assert(g.base > 0 && g.inflated == g.base,
      s"r37 rows ${g.base} -> ${g.inflated}: report tracked the corpus")
  }

  test("r17 range-join matches replicate EXACTLY linearly on user-disjoint copies") {
    val g = growth("r17_matches")
    // copies are user-disjoint and content-identical, and the bin-join
    // is deterministic: anything other than exactly 10x means the
    // candidate generator leaked pairs across copies
    assert(g.base > 0 && g.inflated == 10 * g.base,
      s"r17 matches ${g.base} -> ${g.inflated}: expected exactly 10x")
  }

  test("s15 kNN graph rows stay ≤ 3 per node as the corpus inflates") {
    val g = growth("s15_edges")
    // TopKPerKey caps out-degree at k=3 BY CONSTRUCTION — the graph
    // artifact is ∝ corpus however dense the LSH buckets get
    assert(g.base > 0 && g.base <= 3 * baseN &&
      g.inflated <= 3 * factor * baseN,
      s"s15 edges ${g.base} -> ${g.inflated} exceed the k·n bound")
    assert(g.inflated >= g.base, s"s15 edges shrank: ${g.base} -> ${g.inflated}")
  }

  test("t29 score histogram is EXACTLY copy-invariant under inflation") {
    val g = growth("t29_hist_values")
    // content-disjoint copies reproduce the base score distribution
    // exactly (cross-copy bigrams never collide ⇒ per-copy c12/c1
    // counts equal the base's) — any new value means the model side
    // leaked counts across copies; this is what keeps the bucketing
    // histogram capacity-bounded at any corpus size
    assert(g.base > 0 && g.inflated == g.base,
      s"t29 distinct scores ${g.base} -> ${g.inflated}: copies leaked")
  }

  test("r27 gap-fill grid replicates EXACTLY linearly on user-disjoint copies") {
    val g = growth("r27_grid")
    // copies are user-disjoint with identical timestamps ⇒ identical
    // per-user spans ⇒ exactly ×factor grid rows
    assert(g.base > 0 && g.inflated == factor * g.base,
      s"r27 grid ${g.base} -> ${g.inflated}: expected exactly ${factor}x")
  }

  test("t30 novel-window volume grows ~linearly on disjoint copies") {
    val g = growth("t30_novel_vol")
    // each rotated copy's novel set replicates (cross-copy windows
    // never collide); superlinear would mean novelty leaked across
    // copies, sublinear that shared windows were manufactured
    assert(g.base > 0 && g.inflated <= 12 * g.base &&
      g.inflated >= 8 * g.base,
      s"t30 novel volume ${g.base} -> ${g.inflated}: expected ~${factor}x")
  }

  test("t31 frequency histogram is EXACTLY copy-invariant under inflation") {
    val g = growth("t31_hist_values")
    // rotation preserves token multiplicities bijectively ⇒ every
    // copy reproduces the base frequency multiset on a disjoint
    // vocabulary ⇒ the DISTINCT-frequency set cannot move — this is
    // the bounded frame whose window makes the rank derivation
    // scale-free
    assert(g.base > 0 && g.inflated == g.base,
      s"t31 distinct freqs ${g.base} -> ${g.inflated}: copies leaked")
  }

  test("r29 transition matrix rows are copy-invariant (|types|² bound)") {
    val g = growth("r29_matrix_rows")
    // event types survive inflation, users are copy-disjoint ⇒ counts
    // grow, the (from, to) pair SET does not
    assert(g.base > 0 && g.inflated == g.base,
      s"r29 matrix ${g.base} -> ${g.inflated}: pair set moved")
  }

  test("s18 health report rows track K(n), never the corpus") {
    // r12/r13: the coarse layout is corpus-adaptive (K = max(10,
    // ⌈√n⌉)), so the report grows with the LAYOUT (15 → 45 under
    // this 10×), never with the corpus (200 → 2000 rows); k-means
    // may drop empty seed cells, hence ≤ K
    val g = growth("s18_report_rows")
    assert(g.base > 0 &&
      g.base <= operators.Similarity.coarseK(baseN),
      s"s18 base ${g.base} exceeds K(${baseN})")
    assert(g.inflated <= operators.Similarity.coarseK(baseN * factor),
      s"s18 rows ${g.base} -> ${g.inflated}: exceeds K(n)")
  }

  test("d16 bloom FP share stays bounded as the corpus inflates " +
      "(adaptive m)") {
    val g = growth("d16_fp_bp")
    // the integer m rule re-sizes the filter with the corpus, holding
    // fill ≈ k·0.9n/4·2^⌈log₂n⌉ ∈ [0.34, 0.68) and FPR ≈ fill³ well
    // under 20% at ANY n (measured: 0 bp at n=200, ~1100 bp at
    // n=2000); a filter PINNED at the base m would saturate toward
    // 10000 bp at 10× fill
    assert(g.base <= 2000 && g.inflated <= 2000,
      s"d16 FP share ${g.base}bp -> ${g.inflated}bp: filter saturating")
  }

  test("s21 distortion report stays nSub·K rows as the corpus inflates") {
    val g = growth("s21_report_rows")
    assert(g.base == 64 && g.inflated == 64,
      s"s21 rows ${g.base} -> ${g.inflated}: codebook-grid bound broken")
  }

  test("t09 TopK partial trim ratio is scale-invariant") {
    val (base, big) = trim
    assert(base > 0 && big > 0, s"trim metrics missing: $base, $big")
    assert(big <= base * 3 / 2,
      s"trim ratio degraded at 10x: ${base}bp -> ${big}bp")
  }
}
