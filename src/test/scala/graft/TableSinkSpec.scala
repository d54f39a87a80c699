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

  test("appendIfAbsent: re-running the same batch adds zero rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-merge").toString + "/invoices"
    // two invoices, one with two line items (same key tuple)
    val batch1 = Seq(
      (1, "INV-1", "2023-05-01", "item a", 10.0),
      (1, "INV-1", "2023-05-01", "item b", 20.0),
      (1, "INV-2", "2023-05-02", "item c", 30.0))
      .toDF("company_id", "invoice_number", "invoice_date", "description", "total")
    assert(TableSink.appendIfAbsent(batch1, out) == 3) // first load: all rows
    assert(TableSink.appendIfAbsent(batch1, out) == 0) // re-run: idempotent
    assert(spark.read.parquet(out).count() == 3)
    // a later batch with one known + one new invoice loads only the new
    // one, keeping ALL its line items
    val batch2 = Seq(
      (1, "INV-2", "2023-05-02", "item c", 30.0),   // duplicate key
      (1, "INV-3", "2023-05-03", "item d", 40.0),
      (1, "INV-3", "2023-05-03", "item e", 50.0))
      .toDF("company_id", "invoice_number", "invoice_date", "description", "total")
    assert(TableSink.appendIfAbsent(batch2, out) == 2)
    assert(spark.read.parquet(out).count() == 5)
    assert(spark.read.parquet(out)
      .filter("invoice_number = 'INV-3'").count() == 2)
    // null keys (parser misses) must also be idempotent — the
    // anti-join is null-SAFE, so a replayed null-keyed row is a dupe
    val nullBatch = Seq(
      (1, null.asInstanceOf[String], "2023-05-04", "item f", 60.0))
      .toDF("company_id", "invoice_number", "invoice_date", "description", "total")
    assert(TableSink.appendIfAbsent(nullBatch, out) == 1)
    assert(TableSink.appendIfAbsent(nullBatch, out) == 0)
    assert(spark.read.parquet(out).count() == 6)
  }

  test("compact collapses many small files into few, preserving rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    // 20 tiny appends → ≥20 small files
    (1 to 20).foreach { i =>
      Seq((i, s"row$i")).toDF("id", "v")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(out)
    }
    def parquetFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles >= 20)
    val before = spark.read.parquet(out).collect().toSet
    TableSink.compact(spark, out, targetBytes = 1L << 30) // everything → 1 file
    assert(parquetFiles == 1, s"expected 1 file, got $parquetFiles")
    assert(spark.read.parquet(out).collect().toSet == before)
  }

  test("z-ordered write: files cover small rectangles on BOTH keys") {
    import org.apache.spark.sql.functions.{col, max, min}
    val base = Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    TableSink.writeZOrdered(li, s"$base/z", Seq("l_partkey", "l_suppkey"))
    li.repartition(8).write.parquet(s"$base/rr") // round-robin baseline
    def avgSpread(dir: String, c: String): Double = {
      val global = li.agg(min(col(c)), max(col(c))).head()
      val width = (global.getLong(1) - global.getLong(0)).toDouble
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length >= 4, s"expected multiple files in $dir")
      val spreads = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble / width
      }
      spreads.sum / spreads.length
    }
    // the z-layout's min/max footprint must beat round-robin on BOTH
    // interleaved keys — that is the data-skipping property
    for (c <- Seq("l_partkey", "l_suppkey")) {
      val z = avgSpread(s"$base/z", c)
      val rr = avgSpread(s"$base/rr", c)
      assert(z < rr * 0.8, s"$c: z-order spread $z not < 0.8 * $rr")
    }
    // layout change only: the rows are all still there
    assert(spark.read.parquet(s"$base/z").count() == li.count())
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
