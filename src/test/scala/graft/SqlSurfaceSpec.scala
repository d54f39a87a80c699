package graft

import org.apache.spark.sql.functions._

/** The pure-SQL user surface: a reference user who writes SQL (the
  * reference ships analytics.sql, not DataFrames) can register the
  * lake tables as views and run their queries through spark.sql —
  * including the graft extensions (graft_dot, and the rewritten
  * bounded top-k under any row_number-top-N window they write).
  */
class SqlSurfaceSpec extends SparkSpecBase {

  private lazy val views: Unit = {
    graft.plans.GraftExtensions.install(spark)
    Seq("lineitem", "supplier", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf0001/$t.parquet").createOrReplaceTempView(t)
    }
  }

  test("analytics-style SQL matches the DataFrame operator") {
    views
    val sql = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(sql == df && sql.nonEmpty)
  }

  test("graft_dot is callable from SQL and agrees with the Column API") {
    views
    val sql = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS n2
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.Vector.dot(col("embedding"), col("embedding")).as("n2"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == df && sql.nonEmpty)
  }

  test("a user's SQL row_number top-N window gets the bounded TopKPerKey") {
    views
    val q = spark.sql(
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 2""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "RewriteWindowTopK did not fire on the SQL window")
    // and it is still correct: rn bounded, groups complete
    val rows = q.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rn") <= 2))
  }
}
