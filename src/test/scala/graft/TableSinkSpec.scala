package graft

import java.nio.file.Files
import graft.sources.TableSink

/** Lake-layout plumbing: partition pruning actually prunes, and
  * bucketed joins actually skip the exchange.
  */
class TableSinkSpec extends SparkSpecBase {

  test("partitioned write prunes directories on partition filter") {
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    TableSink.writePartitioned(
      Tables.documents(spark, sf0001), out, Seq("lang"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.length >= 3, s"expected lang= partition dirs, got ${dirs.toSeq}")
    val pruned = spark.read.parquet(out).filter("lang = 'en'")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed:\n${scan.take(1500)}")
    assert(pruned.count() ==
      Tables.documents(spark, sf0001).filter("lang = 'en'").count())
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      TableSink.writeBucketed(
        Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      TableSink.writeBucketed(
        Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          spark.table("orders_b")("o_orderkey") === spark.table("lineitem_b")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
