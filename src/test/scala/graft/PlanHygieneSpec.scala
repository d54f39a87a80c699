package graft

/** Global plan sweep: NO contract query may plan a CartesianProduct
  * or BroadcastNestedLoopJoin unless it is on the documented
  * allowlist of deliberate tiny-broadcast scans. This is the
  * 100 TB-survival gate in spec form — a refactor that silently turns
  * a key-equality join into an all-pairs join fails here, not in
  * production.
  */
class PlanHygieneSpec extends SparkSpecBase {

  /** Queries that INTENTIONALLY scan against a broadcast tiny side. */
  private val allowed: Map[String, String] = Map(
    "s01_ann_bruteforce" -> "declared exactness baseline: corpus × broadcast query slice",
    "s09_recall_audit" -> "truth is s01's corpus × broadcast query-slice scan; the four audited families reuse their own allowlisted shapes",
    "c02_cluster_sample" -> "k-means assignment: vector × broadcast K-row centroid table (d12's scan)",
    "c04_outlier_scrub" -> "k-means assignment: vector × broadcast K-row centroid table (d12's scan); stats + flag joins are key-equality on cid",
    "s03_ann_ivf" -> "IVF assignment: every vector × broadcast 10-centroid table",
    "d12_semantic_dedup" -> "k-means rounds: vector × broadcast K-row centroid table",
    "s05_ann_pq" -> "flat-PQ code scan: codes × broadcast query slice (s06 is the bounded composition)",
    "s08_ann_sq8" -> "SQ8 scan: 1-row quant-param broadcast + codes × broadcast query slice (s05's shape)",
    "s06_ann_ivfpq" -> "IVF assignment stage shares s03's broadcast-centroid scan",
    "s07_ann_refine" -> "candidate stage IS s06's scan; refine joins are key-equality",
    "s10_range_search" -> "declared radius scan: corpus × broadcast fixed query slice (s01's shape minus the rank stage)",
    "s11_mmr_rerank" -> "candidate stage IS s01's corpus × broadcast query scan; the MMR rounds are key-equality joins over the bounded pool",
    "t24_bpe_train" -> "1-row learned-merge-pair broadcast per round (the t09/t14 1-row pattern); pair counting is a vocab-bounded aggregate",
    "t25_bpe_apply" -> "t24's 1-row merge broadcasts; the apply join is key-equality on the vocab-bounded word table",
    "t34_tokenizer_fertility" -> "t25's frame verbatim (same 1-row merge broadcasts); the dims join is key-equality on doc_id, the rollup one map-combinable aggregate",
    "t22_dsir_weights" -> "1-row split-totals broadcast; the 10k-bucket model join is key-equality",
    "s13_bm25" -> "1-row corpus-totals broadcast (t09 pattern); query/df/length joins are key-equality",
    "s18_index_health" -> "occupancy comes from s03's allowlisted broadcast-centroid assignment scan; everything after is a K-row frame",
    "s20_nprobe_sweep" -> "truth is s01's corpus × broadcast query-slice scan; candidates ride s03's broadcast-centroid assignment; the query-side cell ranking is a ≤9-row slice × broadcast K centroids",
    "t28_source_drift" -> "1-row corpus-total broadcast (t22 pattern); bucket/source joins are key-equality over capacity-bounded frames",
    "s14_rrf_fusion" -> "inputs are s02's broadcast-query bucket scan + s03's broadcast-centroid scan (both allowlisted); the fusion join is key-equality on (query, neighbor)",
    "t09_tfidf" -> "1-row corpus-count broadcast",
    "t14_domain_mix" -> "1-row corpus-total broadcast",
    "c05_dq_suite" -> "two 1-row metric frames cross-joined (bounded 1×1 — the final stack input); all corpus-sized work is one scan-aggregate + one left-anti broadcast join",
    "c06_mix_plan" -> "t14's 1-row corpus-total broadcast inside the |langs|-row weight frame; every doc-keyed join is key-equality",
    "t15_mix_resample" -> "1-row min-language-count broadcast (t14's pattern)",
    "c09_token_budget" -> "1-row budget/weight-sum totals broadcast over the |sources|-row frame (t14's pattern); the only corpus-sized work is one scan-aggregate",
    "r12_approx_stats" -> "1-row max-cents broadcast sizing the histogram width (t09 pattern); KMV and bucket joins are key-equality on status",
    "s22_ood_scrub" -> "OOD scoring: vector scan × broadcast K-row centroid table (s03's shape; struct-argmax collapses the fan-out before the shuffle) + 1-row corpus-mean broadcast (t09 pattern)",
    "s24_ann_ivfsq8" -> "IVF assignment stage shares s03's broadcast-centroid scan; 1-row quant-param broadcast (s08's shape); the probe scan is a key-equality join on cell",
    "r34_volume_anomaly" -> "1-row frontier-day broadcast over the |types|-row rollup (t09 pattern); all corpus-sized work is one (type, day) map-combinable aggregate",
    "r36_basket_affinity" -> "1-row order-total broadcast (t09 pattern); pairs come from a key-equality self-join on the order key with basket-size-bounded fanout, margins are key-equality joins",
    "r37_sketch_overlap" -> "the |types|²-row pair frame is a tiny non-equi self-join of the ≤|types|-row estimate table; every corpus-sized step is one distinct scan + bounded TopKPerKey, and the union stage is a key-equality explode join over ≤|types|·k sketch rows")

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name plans no cartesian/nested-loop join" +
        (if (allowed.contains(name)) " (allowlisted broadcast scan)" else "")) {
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      if (!allowed.contains(name)) {
        assert(!plan.contains("CartesianProduct"), plan.take(1500))
        assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
      } else {
        // allowlisted: still never an un-broadcast cartesian
        assert(!plan.contains("CartesianProduct"), plan.take(1500))
      }
    }
  }
}
