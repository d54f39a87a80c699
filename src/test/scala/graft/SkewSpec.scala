package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key skew drill (round-7 verdict item #3): one user owns ~50% of
  * events; one language owns ~50% of documents. Asserts which
  * operators keep per-task input bounded under that skew and
  * documents (here and in SURVEY.md §5) which ones concentrate and
  * what the mitigation is:
  *
  *  - BOUNDED by key design: w01/w02 key on (time bucket, event_type)
  *    — the hot user's rows diffuse across time buckets, and the
  *    hash-aggregate's partial phase combines before the shuffle;
  *    t10 sub-shards its pack window by pmod(doc_id, nShards), so a
  *    hot language fans out over nShards reducers; r10 is the salting
  *    pattern itself.
  *  - CONCENTRATING by semantics: r08/r09/w03 need per-user ORDERED
  *    state, so the user_id exchange puts the hot user's half of the
  *    corpus in one task. They complete (sort-based processing
  *    spills; state per row is O(1)), but wall-clock degrades to the
  *    hot key's size. Mitigation at 100 TB is NOT r10 salting (order
  *    would break): time-chunk then merge boundaries — the streaming
  *    Sessionizer does exactly this incrementally — or t10-style
  *    sub-sharding where the window's order constraint allows it.
  *
  * The concentration numbers are measured on the REAL exchange
  * layout: repartition(32, <op's keys>) + spark_partition_id() is the
  * same HashPartitioning the op's window/agg plans.
  */
class SkewSpec extends SparkSpecBase {

  private val N = 20000L
  private val HotShare = 0.5

  /** events.parquet with user 0 owning 50% of rows; ts written as
    * long nanos (the driver testdata's TIMESTAMP(NANOS) shape that
    * Tables.events expects under nanosAsLong).
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-skew").toString
    val base = 1704067200L * 1000000000L // 2024-01-01 UTC in ns
    spark.range(N).select(
      col("id").as("event_id"),
      // hot user: one event/min with a 2h jump every 50 events (so
      // sessionize produces many sessions, not one giant one); cold
      // users: spread over 100 ids, one event / 90 s
      when(col("id") < (N * HotShare).toLong, lit(0L))
        .otherwise(pmod(col("id"), lit(100L)) + 1L).as("user_id"),
      (lit(base) + col("id") * 60L * 1000000000L +
        floor(col("id") / 50) * 7200L * 1000000000L).as("ts"),
      element_at(array(lit("view"), lit("click"), lit("purchase"), lit("error")),
        (pmod(col("id"), lit(4L)) + 1).cast("int")).as("event_type"),
      (pmod(col("id"), lit(1000L)).cast("double") / 10.0).as("value"),
      concat(lit("{\"k\": "), pmod(col("id"), lit(100L)), lit("}")).as("props"))
      .write.parquet(s"$d/events.parquet")
    // documents: lang "en" owns 50%, rest over 9 langs
    spark.range(N).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(2L)) === 0, "en")
        .otherwise(concat(lit("l"), pmod(col("id"), lit(9L)))).as("lang"),
      concat_ws(" ", lit("alpha"), lit("beta"), pmod(col("id"), lit(7L)),
        lit("gamma delta epsilon zeta")).as("text"),
      lit("synthetic").as("source"), lit(40L).as("n_chars"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  /** Max fraction of rows landing in one of 32 hash partitions of
    * `keys` — the op's real exchange layout.
    */
  private def maxPartitionShare(df: DataFrame, keys: Seq[String]): Double = {
    val total = df.count().toDouble
    val biggest = df.repartition(32, keys.map(col): _*)
      .groupBy(spark_partition_id()).count()
      .agg(max(col("count"))).head().getLong(0)
    biggest / total
  }

  test("skew corpus: hot user holds ~50% of events") {
    val events = Tables.events(spark, dir)
    val hot = events.filter(col("user_id") === 0).count()
    assert(math.abs(hot.toDouble / N - HotShare) < 0.01)
  }

  test("r08 sessionize completes under skew; user_id exchange concentrates (documented)") {
    val out = operators.Relational.sessionize(spark, dir)
    val agg = out.agg(sum(col("n_events"))).head().getLong(0)
    assert(agg == N, s"sessionize lost rows: $agg != $N")
    // the hot user produces many sessions (the 2h jumps split them)
    assert(out.filter(col("user_id") === 0).count() > 100)
    // and the documented concentration is real: one task owns ~half
    val share = maxPartitionShare(Tables.events(spark, dir), Seq("user_id"))
    assert(share > 0.4, f"expected user_id exchange to concentrate, got $share%.2f")
  }

  test("r09 running window completes under skew (one output row per input)") {
    assert(operators.Relational.runningWindow(spark, dir).count() == N)
  }

  test("w01 tumbling window: time-bucketed keys diffuse the hot user") {
    val out = operators.Relational.tumblingWindow(spark, dir)
    assert(out.agg(sum(col("n_events"))).head().getLong(0) == N)
    val events = Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
    val share = maxPartitionShare(events, Seq("ws", "event_type"))
    assert(share < 0.10,
      f"w01 exchange should be diffused by time bucketing, got $share%.2f")
  }

  test("w02 sliding window: window()-generated keys diffuse the hot user") {
    val out = operators.Relational.slidingWindow(spark, dir)
    // each event lands in 3 sliding windows
    assert(out.agg(sum(col("n_events"))).head().getLong(0) == 3 * N)
  }

  test("w03 session_window completes under skew; keys on user_id concentrate (documented)") {
    val out = operators.Relational.sessionWindow(spark, dir)
    assert(out.agg(sum(col("n_events"))).head().getLong(0) == N)
  }

  test("r20 chunked sessionize equals r08 and bounds the hot user's task share") {
    val plain = operators.Relational.sessionize(spark, dir).collect()
    val chunked = operators.Relational.sessionizeChunked(spark, dir).collect()
    assert(plain.length == chunked.length,
      s"session count ${plain.length} != ${chunked.length}")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"))
    val byKey = chunked.map(r => key(r) -> r).toMap
    plain.foreach { p =>
      val c = byKey(key(p))
      assert(c.getAs[Long]("n_events") == p.getAs[Long]("n_events"), s"$p")
      assert(c.getAs[java.sql.Timestamp]("session_start") ==
        p.getAs[java.sql.Timestamp]("session_start"), s"$p")
      assert(c.getAs[java.sql.Timestamp]("session_end") ==
        p.getAs[java.sql.Timestamp]("session_end"), s"$p")
      // partials merge in a different float order than one flat sum —
      // equality after round(2) is the contract the oracle checks too
      assert(c.getAs[Double]("session_value") ==
        p.getAs[Double]("session_value"), s"$p")
    }
    // the whole point: (user_id, chunk) diffuses what user_id alone
    // concentrates (~0.5 measured by the r08 drill above)
    val events = Tables.events(spark, dir)
      .withColumn("chunk", floor(unix_timestamp(col("ts")) / 86400L))
    val share = maxPartitionShare(events, Seq("user_id", "chunk"))
    assert(share < 0.20,
      f"chunked exchange should bound the hot user, got $share%.2f")
  }

  test("r24 chained funnel equals r22 under skew; exchanges carry partial MINs") {
    // r22's sort_array walk ships the hot user's WHOLE ordered run
    // (50% of the corpus) through one exchange into one task's array;
    // r24's three exchanges carry one partial-min row per (user, map
    // partition) — per-task state is O(1) however hot the user is
    val a = operators.Relational.funnel(spark, dir).collect().map(_.toString)
    val b = operators.Relational.funnelChained(spark, dir).collect()
      .map(_.toString)
    assert(a.sameElements(b), s"skew corpus diverged: ${a.length}/${b.length}")
    val plan = operators.Relational.funnelChained(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), plan.take(2000))
    // and r22's plan really does carry the array through the shuffle
    val plan22 = operators.Relational.funnel(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan22.contains("collect_list"), plan22.take(2000))
  }

  test("t10 sequence pack: sub-sharding bounds the hot language's reducer share") {
    val out = operators.TextOps.sequencePack(spark, dir)
    assert(out.count() == N)
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), pmod(col("doc_id"), lit(8L)).as("shard_id"))
    val share = maxPartitionShare(docs, Seq("lang", "shard_id"))
    // hot lang (50%) / 8 shards ~ 6.25% per key; partitions may hold
    // a few keys
    assert(share < 0.20,
      f"t10 shards should bound the hot language, got $share%.2f")
  }
}
