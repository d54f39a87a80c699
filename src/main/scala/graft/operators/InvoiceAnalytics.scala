package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's five analytics queries (reference:
  * analytics.sql:56-100) re-pointed at the testdata star schema. The
  * `invoices` table maps to orders (header: invoice_number=o_orderkey,
  * invoice_date=o_orderdate, total_amount=o_totalprice) + lineitem
  * (detail rows) + supplier/part dims.
  *
  * Scale notes: each query is a single hash-aggregate shuffle;
  * supplier/part dims are broadcast; sums that feed the oracle are
  * rounded to 2dp on both sides (see SURVEY.md §6).
  */
object InvoiceAnalytics {

  /** 3.1 — documents processed per group (count distinct invoice per
    * order status; analytics.sql:57-62 groups by the distinct key
    * itself, which degenerates to 1 — we keep the shape but group by
    * status so the answer is non-trivial).
    */
  def docsProcessed(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_orderkey")).as("quantity"))
      .orderBy(col("o_orderstatus"))

  /** 3.2 — total invoice value per customer (sum DISTINCT total;
    * analytics.sql:65-71).
    */
  def invoiceTotalValue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(round(sum_distinct(col("o_totalprice")), 2).as("total_value"))
      .orderBy(col("total_value").desc, col("o_custkey"))

  /** 3.3 — top 5 suppliers by total value (analytics.sql:74-81).
    * supplier is a broadcast dim; the agg shuffles once on s_name.
    */
  def topSuppliers(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name").as("supplier_name"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total_spent"))
      .orderBy(col("total_spent").desc, col("supplier_name"))
      .limit(5)

  /** 3.4 — most common products/line items (analytics.sql:84-91). */
  def commonProducts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name").as("description"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("description"))
      .limit(5)

  /** 3.5 — monthly spending trend (analytics.sql:94-100). */
  def monthlyTrend(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("total_value"))
      .orderBy(col("month"))
}
