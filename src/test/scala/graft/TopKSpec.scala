package graft

import graft.plans.{GraftExtensions, TopK}
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator must match the row_number-window
  * formulation exactly, plan as partial+final (only k rows per key
  * per partition cross the shuffle), and handle ties/small groups.
  */
class TopKSpec extends SparkSpecBase {

  private lazy val session = { GraftExtensions.install(spark); spark }

  test("TopK.perKey equals the window formulation on orders") {
    val s = session
    val df = Tables.orders(s, sf0001)
    val viaTopK = TopK.perKey(df, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("plan shows the two-phase exec with one exchange between") {
    val s = session
    val df = TopK.perKey(Tables.orders(s, sf0001), Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(o_custkey"),
      plan.take(1500))
  }

  test("groups smaller than k pass through whole") {
    val s = session
    import s.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val out = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc), 5)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((1, 10), (1, 20), (2, 5)))
  }

  test("partial phase flush-on-cap never drops a qualifying row") {
    import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
    val s = session
    import s.implicits._
    // 10 interleaved keys × 10 rows each; cap of 3 keys forces many
    // mid-partition flushes of the buffer map
    val df = Seq.tabulate(100)(i => (i % 10, i)).toDF("k", "v").coalesce(1)
    val child = df.queryExecution.executedPlan
    val out = child.output
    val partial = graft.plans.TopKPerKeyExec(
      Seq(out(0)), Seq(SortOrder(out(1), Descending)), 2,
      partial = true, child, flushKeys = 3)
    val rows = partial.execute().map(r => (r.getInt(0), r.getInt(1))).collect()
    // flushing may forward extra per-segment rows (final phase trims),
    // but the true global top-2 of every key must survive
    val byKey = rows.groupBy(_._1)
    (0 until 10).foreach { k =>
      val got = byKey(k).map(_._2).toSet
      assert(got.contains(k + 90) && got.contains(k + 80),
        s"key $k lost a top row: $got")
    }
    assert(rows.length <= 100)
  }

  test("SQLMetrics expose the pre-shuffle trim ratio and flush count") {
    import org.apache.spark.sql.catalyst.expressions.{Descending, SortOrder}
    val s = session
    import s.implicits._
    val df = Seq.tabulate(100)(i => (i % 10, i)).toDF("k", "v").coalesce(1)
    val child = df.queryExecution.executedPlan
    val out = child.output
    // ample cap: no flushes, full pre-shuffle trim (100 → 10 keys × 2)
    val trimmed = graft.plans.TopKPerKeyExec(
      Seq(out(0)), Seq(SortOrder(out(1), Descending)), 2,
      partial = true, child, flushKeys = 1 << 16)
    assert(trimmed.execute().count() == 20)
    assert(trimmed.metrics("numInputRows").value == 100)
    assert(trimmed.metrics("numOutputRows").value == 20)
    assert(trimmed.metrics("numFlushes").value == 0)
    // tiny cap over interleaved keys: the flush counter must fire
    // (flushed segments forward extra rows — the trim ratio metric is
    // exactly how a plan audit would SEE the cap being undersized)
    val flushy = graft.plans.TopKPerKeyExec(
      Seq(out(0)), Seq(SortOrder(out(1), Descending)), 2,
      partial = true, child, flushKeys = 3)
    val n = flushy.execute().count()
    assert(flushy.metrics("numOutputRows").value == n)
    assert(flushy.metrics("numFlushes").value >= 1,
      s"expected >=1 flush, got ${flushy.metrics("numFlushes").value}")
  }
}
