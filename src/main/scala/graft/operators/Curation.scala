package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c01 — the end-to-end corpus-curation DAG as ONE declarative query:
  *
  *   quality gate (t02) → keep-best exact dedup (d08) →
  *   deterministic stratified sample (t11) → context-window pack (t10)
  *
  * This is the composition a training-data pipeline actually runs,
  * and the point of building every stage as DataFrame algebra: the
  * stages fuse into a single Catalyst plan (one scan, one dedup
  * shuffle, one pack window — the sample is a scan-level filter), so
  * "pipeline" is just a bigger query, not an orchestration layer.
  */
object Curation {

  def curate(s: SparkSession, dir: String, minQualityBp: Int = 4000,
      capacity: Int = 512, nShards: Int = 8): DataFrame = {
    val qualityBp = round(Text.qualityScore(col("text")) * 10000).cast("long")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        qualityBp.as("quality_bp"),
        md5(Text.normalize(col("text"))).as("content_hash"),
        Text.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .filter(col("quality_bp") >= minQualityBp)
    // keep-best per content group (argmax quality, min doc_id on ties)
    val keeper = base.groupBy(col("content_hash"))
      .agg(max(struct(col("quality_bp").as("q"), (-col("doc_id")).as("nid")))
        .as("m"))
      .select(col("content_hash"), (-col("m.nid")).as("doc_id"))
    val deduped = base.join(keeper, Seq("content_hash", "doc_id"))
    // deterministic hash-bucket sample with per-language rates — the
    // SAME transform t11 and the streaming twin use (one definition)
    val sampled = TextOps.sampleTransform(deduped).drop("keep_pct")
    // context-window packing over (lang, sub-shard)
    val w = Window.partitionBy(col("lang"), col("shard_id"))
      .orderBy(col("doc_id"))
    sampled
      .withColumn("shard_id", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("prev_cum",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard_id"), col("quality_bp"),
        col("n_tokens"),
        floor(col("prev_cum") / capacity).cast("long").as("bin_id"),
        (col("prev_cum") % capacity).as("bin_offset"))
      .orderBy(col("lang"), col("shard_id"), col("doc_id"))
  }

  /** c02 — cluster-balanced coreset sampling: from each k-means cell
    * keep the `cap` most CENTRAL vectors (smallest distance to the
    * cell's own centroid, vec_id tie-break) — the diversity-balancing
    * selection stage (SemDeDup/DCLM shape: dedup-then-balance) that
    * keeps a curated corpus from being dominated by its biggest
    * semantic clusters. K and cap both derive from the corpus count
    * with integer rules ([[Dedup.semanticK]]; cap = max(5, n/(10K)))
    * so the oracle replays them and neither is a fixed constant that
    * breaks at 100× (the r7 lesson).
    *
    * Scale shape: one k-means (VectorAgg.kmeansCentroids — broadcast
    * centroids, struct-min argmin, one row per vector to the
    * shuffle), a broadcast rejoin for the assigned centroid's d2, and
    * a bounded TopKPerKey on cell — never a corpus sort. d2 is the
    * double |c|²−2v·c both engines fold sequentially (FloatVecDot),
    * floored to milli-units only at the output edge.
    */
  def clusterSample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vector
    graft.plans.GraftExtensions.install(s)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val n = graft.TableStats.rowCount(s, dir, "embeddings")(emb.count())
    val k = Dedup.semanticK(n)
    val cap = math.max(5L, n / (k.toLong * 10L)).toInt
    // the SAME (K = semanticK(n), 16K-sample) build as the whole
    // s03-family — ride the coarseCentroids memo instead of
    // re-running the clusterer per query (r13 optimization)
    val cent = Similarity.coarseCentroids(s, dir)
    val scored = Similarity.coarseAssign(s, dir)
      .join(broadcast(cent), "cid")
      .withColumn("d2", Vector.dot(col("cv"), col("cv"))
        - lit(2.0) * Vector.dot(col("embedding"), col("cv")))
    val w = Window.partitionBy(col("cid")).orderBy(col("d2"), col("vec_id"))
    graft.plans.TopK.perKey(scored, Seq(col("cid")),
        Seq(col("d2").asc, col("vec_id").asc), cap)
      .withColumn("rn", row_number().over(w))
      .select(col("cid").as("cell"), col("rn"), col("vec_id"),
        floor(col("d2") * 1000).cast("long").as("d2_milli"))
      .orderBy(col("cell"), col("rn"))
  }

  /** c04 — embedding-space OUTLIER SCRUB: vectors far from their own
    * k-means cell center are flagged — the mis-encoded/garbage-input
    * filter a corpus build runs over its embedding table (a vector
    * 2.5× its cell's mean squared distance is an encoder failure or
    * out-of-domain junk, not a cluster member). Reuses d12's K-free
    * deterministic k-means (K = ⌈√n⌉, sample-trained — cells are
    * ~√n vectors and the per-cell stats one K-row aggregate at any
    * scale); the TRUE squared distance |v−c|² works in
    * milli-floored integers, the cell mean is an integer DIV, and the
    * outlier rule (10·d2 > 25·mean, cells ≥ 5 members) is pure
    * integer arithmetic — the oracle replays every round CTE-for-CTE.
    *
    * Scale shape: assignment is the broadcast-centroid struct-min
    * scan (allowlisted); per-cell stats are ONE map-combinable
    * K-row aggregate; the flag join is key-equality on cid. Linear
    * in corpus vectors.
    */
  def outlierScrub(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vector
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val n = graft.TableStats.rowCount(s, dir, "embeddings")(emb.count())
    // shared memoized build — see clusterSample
    val cent = Similarity.coarseCentroids(s, dir)
    val asg = Similarity.coarseAssign(s, dir)
      .join(broadcast(cent), Seq("cid"))
      .select(col("vec_id"), col("cid"),
        floor((Vector.dot(col("embedding"), col("embedding"))
          + Vector.dot(col("cv"), col("cv"))
          - lit(2.0) * Vector.dot(col("embedding"), col("cv"))) * 1000)
          .cast("long").as("d2_milli"))
      .cache() // feeds the cell stats AND the flag join
    val stats = asg.groupBy(col("cid"))
      .agg(count(lit(1)).cast("long").as("n_cell"),
        sum(col("d2_milli")).cast("long").as("sum_d2m"))
    asg.join(stats, Seq("cid"))
      .select(col("vec_id"), col("cid").as("cell"), col("d2_milli"),
        col("n_cell"),
        expr("CAST(sum_d2m DIV n_cell AS BIGINT)").as("cell_mean_milli"))
      .withColumn("outlier",
        col("n_cell") >= 5L &&
          col("d2_milli") * 10L > col("cell_mean_milli") * 25L)
      .orderBy(col("vec_id"))
  }

  /** c03 — the corpus DATASET CARD: the per-source summary every
    * released training corpus ships (docs, languages, token/char
    * volume, exact-dup share) plus the all-sources total row — the
    * governance/report artifact of a corpus build, produced as one
    * query. Duplication is CORPUS-WIDE (a doc duplicated across
    * sources counts as duplicated in both sources' rows — the
    * cross-source contamination a card must surface), reusing d01's
    * normalized content hash.
    *
    * Scale shape: one scan computes per-doc stats + content hash
    * (cached — it feeds the corpus-wide hash count AND the enriched
    * join in one plan); one hash-keyed map-combinable count; one
    * key-equality join back; rollup(source) is an Expand over
    * |sources|+1 grouping sets with map-side partials. Integer
    * DIV for the ratio columns — no float to diverge cross-engine.
    * 'ALL' labels the rollup total (sources are src0..srcN by
    * construction, so the label cannot collide).
    */
  def corpusCard(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        Text.tokenCountWs(col("text")).cast("long").as("n_tokens"),
        md5(Text.normalize(col("text"))).as("h"))
      .cache() // feeds the hash count and the enriched join
    val hs = base.groupBy(col("h")).agg(count(lit(1)).as("nc"))
    base.join(hs, Seq("h"))
      .rollup(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        sum(when(col("nc") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_dup_docs"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("n_langs"), col("n_tokens"), col("n_chars"),
        col("n_dup_docs"))
      .withColumn("dup_bp",
        expr("CAST(n_dup_docs * 10000 DIV n_docs AS BIGINT)"))
      .withColumn("mean_chars", expr("CAST(n_chars DIV n_docs AS BIGINT)"))
      .orderBy(col("source"))
  }

  /** c05 — declarative DATA-QUALITY expectation suite (the
    * Deequ/Great-Expectations shape): a fixed battery of checks over
    * the orders table — row count, completeness(o_custkey),
    * uniqueness(o_orderkey), accepted-values(o_orderstatus),
    * numeric range(o_totalprice), referential
    * integrity(o_custkey → customer) — evaluated as ONE Spark job
    * emitting one row per check with its observed metric (integer
    * basis points) and pass verdict. This is the ingest gate a lake
    * runs before publishing a partition; the reference pipeline's
    * scattered per-field null checks are this, systematized.
    *
    * Scale shape: the five single-table metrics come from ONE scan
    * (a single aggregate — count/conditional-count/count-distinct
    * partials all map-side-combinable; the count-distinct is the one
    * Expand, r18's documented profile shape — swap to HLL++ at 100 TB
    * for a bp-tolerant uniqueness check). Referential integrity is
    * one left-anti-shaped broadcast join aggregated to a count. The
    * final per-check rows are a row-local stack over the two 1-row
    * frames — no further shuffle. Thresholds are integers; verdicts
    * can't straddle a float ulp.
    */
  def dqSuite(s: SparkSession, dir: String): DataFrame =
    dqChecks(Tables.orders(s, dir), Tables.customer(s, dir))

  /** c05's check battery over EXPLICIT orders/customer frames — the
    * shared code path streaming.DqStream runs per micro-batch (the
    * ingest gate is the same suite pointed at a delivery instead of
    * the table), so stream/batch parity holds by construction.
    */
  def dqChecks(o: DataFrame, cust: DataFrame): DataFrame = {
    val m = o.agg(
      count(lit(1)).cast("long").as("n"),
      count(col("o_custkey")).cast("long").as("n_custkey"),
      countDistinct(col("o_orderkey")).cast("long").as("n_key"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .cast("long").as("n_status_ok"),
      sum(when(col("o_totalprice") >= 0 && col("o_totalprice") < 10000000, 1L)
        .otherwise(0L)).cast("long").as("n_price_ok"))
    val orphans = o.join(
        cust.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_orphan"))
    m.crossJoin(orphans)
      .select(expr(
        """stack(6,
          'row_count',            n,                                  n > 0,
          'completeness_custkey', n_custkey * 10000 DIV greatest(n, 1),        n_custkey = n,
          'uniqueness_orderkey',  n_key * 10000 DIV greatest(n, 1),            n_key = n,
          'accepted_status',      n_status_ok * 10000 DIV greatest(n, 1),      n_status_ok = n,
          'price_in_range',       n_price_ok * 10000 DIV greatest(n, 1),       n_price_ok = n,
          'ref_integrity_customer', (n - n_orphan) * 10000 DIV greatest(n, 1), n_orphan = 0
        ) AS (check_name, metric_bp, passed)"""))
      .select(col("check_name"), col("metric_bp").cast("long").as("metric_bp"),
        col("passed"))
      .orderBy(col("check_name"))
  }

  /** c06 — the training-MIX PLAN: one decision row per document,
    * composing the engine's scoring operators into the keep/drop
    * table a corpus build actually materializes before tokenizing —
    * precedence: quality gate (t23's classifier) → perplexity tail
    * cull (t29's tercile, the CCNet "discard tail" move) → language
    * rebalancing sample (t14's target-mix weight capped at 10⁴ bp,
    * applied via the t11/t15 salted hash-Bernoulli — deterministic,
    * replayable, no RNG). Every decision carries its reason
    * ('drop_quality' / 'drop_tail' / 'drop_sampled' / 'keep'), which
    * is what makes the table auditable — a governance requirement,
    * not a nicety, once the corpus ships.
    *
    * Scale shape: t23 is a pure projection; t29's tercile frame joins
    * back on doc_id (its histogram is capacity-bounded, §2.6); the
    * language weights are a |langs|-row broadcast; the sampling
    * decision is row-local hashing. Two doc-keyed key-equality joins
    * total — linear at any corpus size, and each input operator keeps
    * its own documented scale story.
    */
  def mixPlan(s: SparkSession, dir: String): DataFrame =
    mixPlanFrame(s, dir).orderBy(col("doc_id"))

  /** c06's unsorted body — the factored-body rule: consumers joining
    * or re-aggregating the decision table (CorpusPipeline) ride this,
    * not the contract query's ORDER BY.
    */
  private[graft] def mixPlanFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val terc = TextOps.perplexityTerciles(s, dir)
      .select(col("doc_id"), col("tercile"))
    val qual = TextOps.qualityFrame(s, dir)
      .select(col("doc_id"), col("label").as("quality_ok"))
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total_docs"))
    val weights = counts.join(broadcast(total), lit(true))
      .select(col("lang"),
        least(expr("CAST(CASE WHEN lang = 'en' THEN 4000 ELSE 1500 END" +
          " * total_docs DIV n_docs AS BIGINT)"), lit(10000L)).as("keep_bp"))
    val bucket = pmod(conv(substring(
      md5(concat(lit("c06"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long"), lit(10000L))
    docs.join(terc, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(broadcast(weights), Seq("lang"))
      .withColumn("bucket", bucket)
      .withColumn("decision",
        when(!col("quality_ok"), lit("drop_quality"))
          .when(col("tercile") === 2, lit("drop_tail"))
          .when(col("bucket") < col("keep_bp"), lit("keep"))
          .otherwise(lit("drop_sampled")))
      .select(col("doc_id"), col("lang"), col("tercile"), col("quality_ok"),
        col("keep_bp"), col("bucket"), col("decision"),
        (col("decision") === "keep").as("kept"))
  }

  /** c08 — leakage-SAFE train/val/test SPLIT builder: splits are
    * assigned per NEAR-DUP CLUSTER (d07's connected components), not
    * per document — the FIX for exactly what t18 audits: a per-doc
    * hash split puts a val/test doc's train near-twin on the other
    * side and silently inflates every eval number; hashing the
    * CLUSTER id keeps each dup family on one side by construction,
    * so t18's straddling-pair set over this assignment is empty — a
    * theorem, not a measurement (any d02-verified pair is an edge,
    * edges stay within components, components share a split).
    * Same salted-md5 80/10/10 bucket rule as t18/t11 (deterministic,
    * replayable, no RNG), applied to cluster_id.
    *
    * Scale shape: d07's documented bounded-iteration CC (checkpointed
    * label propagation, edges from the linear d02 band join) plus ONE
    * row-local hash projection. The closing orderBy makes the
    * contract sort SELF-CONTAINED (round-10 advice): it is adjacent
    * to d07's identical doc_id sort, so EliminateSorts collapses the
    * pair and no extra exchange is paid — but the determinism no
    * longer depends on that upstream sort surviving future edits.
    */
  def safeSplit(s: SparkSession, dir: String): DataFrame =
    safeSplitFrame(s, dir).orderBy(col("doc_id"))

  /** c08's unsorted body (the factored-body rule for joins over it). */
  private[graft] def safeSplitFrame(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClustersFrame(s, dir)
      .withColumn("b", pmod(conv(substring(
          md5(concat(lit("split"), col("cluster_id").cast("string"))), 1, 8),
        16, 10).cast("long"), lit(10L)))
      .select(col("doc_id"), col("cluster_id"),
        when(col("b") <= 7, "train").when(col("b") === 8, "val")
          .otherwise("test").as("split"))

  /** c07 — the curation CASCADE report: stage-by-stage survivor
    * counts through the training-split pipeline — quality gate (t23)
    * → exact dedup (d01's canon rule among the gate's survivors) →
    * decontamination (t12) → perplexity tail cull (t29) — one row
    * per stage with n_in / n_kept / n_dropped / drop_bp. This is the
    * yield report every corpus build publishes next to c06's per-doc
    * decision table (c06 answers "why was THIS doc dropped", c07
    * answers "how much did EACH STAGE cost"), and the regression
    * alarm between builds: a stage whose drop_bp moves is a pipeline
    * change before any model metric shows it.
    *
    * Stage semantics worth stating: dedup canon is chosen AMONG
    * quality survivors — a canonical copy killed by the gate hands
    * canon to the next surviving copy instead of silently dropping
    * the whole hash group. The universe is the training split
    * (doc_id % 50 ≠ 0, t12's convention — benchmark docs never enter
    * a training mix).
    *
    * Scale shape: each flag rides its own operator's documented plan
    * (t23 pure projection, t12 linear shingle semi-join, t29
    * capacity-bounded histogram); the per-doc flag frame is cached
    * (it feeds the canon aggregate AND the stage counts — the
    * re-execution rule); the cascade itself is ONE conditional
    * aggregate to a 1-row frame and a row-local 5-row stack (the c05
    * shape). Three doc-keyed key-equality joins total.
    */
  def cascadeReport(s: SparkSession, dir: String): DataFrame = {
    val train = Tables.documents(s, dir).filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), md5(Text.normalize(col("text"))).as("h"))
    val qual = TextOps.qualityFrame(s, dir)
      .select(col("doc_id"), col("label"))
    val cont = TextOps.decontFrame(s, dir)
      .select(col("doc_id"), col("contaminated"))
    val terc = TextOps.perplexityTerciles(s, dir)
      .select(col("doc_id"), col("tercile"))
    val f = train.join(qual, "doc_id").join(cont, "doc_id")
      .join(terc, "doc_id")
      .cache() // feeds the canon aggregate AND the stage counts
    val canon = f.filter(col("label")).groupBy(col("h"))
      .agg(min(col("doc_id")).as("canon"))
    val s2 = col("label") && col("doc_id") === col("canon")
    val s3 = s2 && !col("contaminated")
    val s4 = s3 && col("tercile") =!= 2
    f.join(canon, Seq("h"), "left")
      .agg(count(lit(1)).cast("long").as("n0"),
        sum(when(col("label"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(s2, 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(s3, 1L).otherwise(0L)).cast("long").as("n3"),
        sum(when(s4, 1L).otherwise(0L)).cast("long").as("n4"))
      .select(expr("""stack(5,
          0, 'ingest',        n0, n0,
          1, 'quality_gate',  n0, n1,
          2, 'exact_dedup',   n1, n2,
          3, 'decontaminate', n2, n3,
          4, 'tail_cull',     n3, n4) AS (ord, stage, n_in, n_kept)"""))
      .select(col("ord").cast("int").as("ord"), col("stage"),
        col("n_in").cast("long").as("n_in"),
        col("n_kept").cast("long").as("n_kept"))
      .withColumn("n_dropped", expr("n_in - n_kept"))
      .withColumn("drop_bp",
        expr("CAST((n_in - n_kept) * 10000 DIV greatest(n_in, 1) AS BIGINT)"))
      .orderBy(col("ord"))
  }

  /** c09 — TOKEN-BUDGET EPOCH PLAN: per source, how many epochs a
    * token-budgeted training run takes from it, with the ≤4-epoch
    * repeat cap of the data-constrained-scaling literature (repeating
    * data is near-free up to ~4 epochs, then value decays rapidly —
    * Muennighoff et al. 2023) — the allocation table a corpus build
    * materializes once it knows its compute budget and its per-domain
    * desirability weights.
    *
    * Budget = 3× the corpus's token volume (a corpus-derived integer
    * stand-in for the compute-side token count). The per-domain
    * desirability weight is an EXTERNAL input in production (human or
    * model-judged domain quality feeding the mix policy, the t14/c06
    * seam); the gate derives one deterministically from the source
    * name (1 + (md5 % 10000) % 16 — the double-mod IS the contract
    * constant, oracle-mirrored; the t23 integer-hash idiom) so the
    * plan spans all three regimes the operator must price: CAPPED
    * sources (target > 4× available — the plan reports the shortfall
    * the budget cannot buy), fitting sources (1–4 epochs), and
    * undersubscribed ones (< 1 epoch — the sampling case).
    *
    * Scale shape: ONE doc scan → a |sources|-row map-combinable token
    * aggregate → a 1-row totals broadcast (the t14/t09 pattern);
    * everything after is integer arithmetic on a |sources|-row frame.
    */
  def tokenBudgetPlan(s: SparkSession, dir: String): DataFrame = {
    val avail = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(sum(graft.functions.Text.tokenCountWs(col("text")).cast("long"))
        .cast("long").as("avail_tokens"))
      .withColumn("w", expr(
        "1L + CAST(conv(substring(md5(source), 1, 8), 16, 10) AS BIGINT)" +
        " % 10000 % 16"))
    val totals = avail.agg(
      sum(col("avail_tokens") * col("w")).cast("long").as("sw"),
      (sum(col("avail_tokens")) * 3L).cast("long").as("budget"))
    avail.join(broadcast(totals), lit(true))
      .withColumn("target_tokens",
        expr("CAST(budget * (avail_tokens * w) DIV sw AS BIGINT)"))
      .withColumn("served_tokens",
        expr("CAST(least(target_tokens, 4 * avail_tokens) AS BIGINT)"))
      .select(col("source"), col("avail_tokens"), col("w").as("weight"),
        col("target_tokens"), col("served_tokens"),
        expr("CAST(served_tokens * 10000 DIV greatest(avail_tokens, 1) AS BIGINT)")
          .as("epochs_bp"),
        expr("CAST((target_tokens - served_tokens) * 10000" +
          " DIV greatest(target_tokens, 1) AS BIGINT)").as("shortfall_bp"),
        (col("target_tokens") > col("served_tokens")).as("capped"))
      .orderBy(col("source"))
  }

  /** c10 — CURRICULUM training order: the corpus in easy-first stage
    * order (curriculum learning, Bengio et al. 2009, as corpus builds
    * apply it — anneal from low- to high-perplexity data), with a
    * deterministic pseudo-random order WITHIN each stage. Stage =
    * t29's perplexity tercile (head = easiest first); within-stage
    * order = t16's salted-hash shuffle (shard = hash mod 8, position
    * = rank within shard) — so a reader streams (stage, shard, pos)
    * and gets easy→hard globally, shuffled locally, reproducibly on
    * any engine (same salt ⇒ same permutation; a new epoch is a new
    * salt, never a new scan pattern).
    *
    * Scale shape: t29's capacity-bounded histogram tercile (never an
    * ntile over a global rank) + a broadcast tercile probe join, then
    * ONE hash-partition shuffle with a WITHIN-(stage, shard) sort —
    * no total-order exchange; shard count is the read-parallelism
    * knob exactly as in t16.
    */
  def curriculum(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("stage"), col("shard_id"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    TextOps.perplexityTerciles(s, dir)
      .select(col("doc_id"), col("tercile").as("stage"))
      .withColumn("shuffle_key",
        md5(concat(lit("curr"), col("doc_id").cast("string"))))
      .withColumn("shard_id",
        pmod(conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("stage"), col("shard_id"), col("pos"))
      .orderBy(col("stage"), col("shard_id"), col("pos"))
  }

  /** c11 — WEAK-SUPERVISION labeling functions + majority vote (the
    * Snorkel/data-programming recipe: many cheap heuristic labelers,
    * each voting keep(+1)/drop(−1)/abstain(0), combined by vote —
    * how corpus-quality labels get bootstrapped when no hand labels
    * exist; the voted label is what a t23-style classifier then
    * trains on). Four LFs over one token scan:
    *
    *   lf_len   length prior        — ≥55 tokens keep, <20 drop
    *   lf_stop  stopword-rate band  — 0 abstains (no evidence),
    *            ≥16% drop (boilerplate), else keep
    *   lf_rep   distinct-token rate — ≥40% keep, <32% drop (loops)
    *   lf_kw    content keywords    — 'slow' drops, else 'spark'
    *            keeps, neither abstains
    *
    * All thresholds are integer basis-point rules both engines replay
    * (`nd·100 ≥ n·40`, never a float ratio). vote = Σ lf; label =
    * keep / drop / abstain by vote sign. Every LF's three regimes and
    * all three vote classes are populated at sf0.001/0.01/0.1
    * (measured), so the gate compares real disagreement, not a
    * constant column.
    *
    * Scale shape: row-local arithmetic on one documents scan — no
    * join, no shuffle beyond the contract sort. 100 TB cost is the
    * scan itself; LFs widen the projection, never the plan.
    */
  def weakLabels(s: SparkSession, dir: String): DataFrame =
    weakLabelsFrame(s, dir).orderBy(col("doc_id"))

  /** c11's unsorted body (the factored-body rule — c12 re-aggregates
    * it without inheriting the contract sort).
    */
  private[graft] def weakLabelsFrame(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"),
        size(array_distinct(col("toks"))).as("nd"),
        expr("size(filter(toks, x -> x = 'the' OR x = 'a'))").as("nstop"),
        array_contains(col("toks"), "slow").as("has_slow"),
        array_contains(col("toks"), "spark").as("has_spark"))
      .select(col("doc_id"),
        when(col("n") >= 55, 1).when(col("n") < 20, -1).otherwise(0)
          .cast("int").as("lf_len"),
        when(col("nstop") * 100 >= col("n") * 16, -1)
          .when(col("nstop") === 0, 0).otherwise(1)
          .cast("int").as("lf_stop"),
        when(col("nd") * 100 >= col("n") * 40, 1)
          .when(col("nd") * 100 < col("n") * 32, -1).otherwise(0)
          .cast("int").as("lf_rep"),
        when(col("has_slow"), -1).when(col("has_spark"), 1).otherwise(0)
          .cast("int").as("lf_kw"))
      .withColumn("vote",
        (col("lf_len") + col("lf_stop") + col("lf_rep") + col("lf_kw"))
          .cast("int"))
      .withColumn("label",
        when(col("vote") > 0, "keep").when(col("vote") < 0, "drop")
          .otherwise("abstain"))

  /** c12 — the LF ANALYSIS report over c11's votes (Snorkel's
    * `LFAnalysis`): per labeling function — coverage (how often it
    * votes at all), agreement with the majority label, and conflict
    * (it voted keep on a majority-drop doc or vice versa), each in
    * basis points of the corpus. This is the dashboard that tells
    * you which heuristic is dead weight (coverage ≈ 0), which is
    * redundant (agreement ≈ coverage) and which is actively fighting
    * the ensemble (conflict high) — the feedback loop weak
    * supervision is tuned by.
    *
    * Scale shape: c11's row-local frame unpivoted 4× via a row-local
    * explode of a fixed-width (lf, vote) array, then ONE 4-row
    * map-combinable aggregate. No join; the denominator rides the
    * same aggregate (count per LF = corpus count, so no second scan
    * or broadcast of a global total is needed).
    */
  def lfReport(s: SparkSession, dir: String): DataFrame =
    weakLabelsFrame(s, dir)
      .select(col("vote"), explode(array(
        struct(lit("lf_len").as("lf"), col("lf_len").as("v")),
        struct(lit("lf_stop").as("lf"), col("lf_stop").as("v")),
        struct(lit("lf_rep").as("lf"), col("lf_rep").as("v")),
        struct(lit("lf_kw").as("lf"), col("lf_kw").as("v")))).as("e"))
      .select(col("e.lf").as("lf"), col("e.v").as("v"), col("vote"))
      .groupBy(col("lf"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("n_active"),
        sum(when(col("v") === 1 && col("vote") > 0, 1L)
          .when(col("v") === -1 && col("vote") < 0, 1L)
          .otherwise(0L)).as("n_agree"),
        sum(when(col("v") === 1 && col("vote") < 0, 1L)
          .when(col("v") === -1 && col("vote") > 0, 1L)
          .otherwise(0L)).as("n_conflict"))
      .select(col("lf"),
        col("n_active").cast("long").as("n_active"),
        expr("CAST(n_active * 10000 DIV n_docs AS BIGINT)")
          .as("coverage_bp"),
        expr("CAST(n_agree * 10000 DIV n_docs AS BIGINT)")
          .as("agree_bp"),
        expr("CAST(n_conflict * 10000 DIV n_docs AS BIGINT)")
          .as("conflict_bp"))
      .orderBy(col("lf"))

  /** c13 — pairwise LF CORRELATION matrix over c11's votes (the
    * other half of Snorkel's LFAnalysis: c12 scores each heuristic
    * against the ensemble, c13 scores them against EACH OTHER): for
    * every unordered LF pair — overlap (both voted), agreement (both
    * voted, same direction) and conflict (both voted, opposite
    * directions), each in basis points of the corpus. Two LFs whose
    * agreement ≈ overlap are redundant (drop one — labeling-function
    * evaluation cost is real when LFs call models); a pair with high
    * conflict marks a systematic disagreement the vote can't resolve
    * by counting (the signal that a weighted label model should
    * replace majority vote).
    *
    * Scale shape: c11's row-local frame → a row-local fixed-width
    * explode of the 6 unordered (lf_a < lf_b) pair structs → ONE
    * 6-row map-combinable aggregate. No join (the oracle replays the
    * pairing as a per-doc self-join; the Spark plan never pays one —
    * the pair set is a compile-time constant).
    */
  def lfCorrelation(s: SparkSession, dir: String): DataFrame = {
    val lfs = Seq("lf_kw", "lf_len", "lf_rep", "lf_stop")
    val pairs = for {
      a <- lfs; b <- lfs if a < b
    } yield struct(lit(a).as("lf_a"), lit(b).as("lf_b"),
      col(a).as("va"), col(b).as("vb"))
    weakLabelsFrame(s, dir)
      .select(explode(array(pairs: _*)).as("p"))
      .select(col("p.lf_a").as("lf_a"), col("p.lf_b").as("lf_b"),
        col("p.va").as("va"), col("p.vb").as("vb"))
      .groupBy(col("lf_a"), col("lf_b"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("va") =!= 0 && col("vb") =!= 0, 1L).otherwise(0L))
          .as("n_overlap"),
        sum(when(col("va") =!= 0 && col("va") === col("vb"), 1L)
          .otherwise(0L)).as("n_agree"),
        sum(when(col("va") * col("vb") < 0, 1L).otherwise(0L))
          .as("n_conflict"))
      .select(col("lf_a"), col("lf_b"),
        col("n_overlap").cast("long").as("n_overlap"),
        expr("CAST(n_overlap * 10000 DIV n_docs AS BIGINT)")
          .as("overlap_bp"),
        expr("CAST(n_agree * 10000 DIV n_docs AS BIGINT)").as("agree_bp"),
        expr("CAST(n_conflict * 10000 DIV n_docs AS BIGINT)")
          .as("conflict_bp"))
      .orderBy(col("lf_a"), col("lf_b"))
  }
}
