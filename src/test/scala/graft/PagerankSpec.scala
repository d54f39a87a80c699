package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** Hand-computed contract for r25's two integer power-iteration
  * rounds on a 2-customer / 2-supplier purchase graph — the oracle
  * proves cross-engine parity, this proves the arithmetic is the one
  * documented (r₀=1000; rₖ₊₁ = 150 + (850·Σ rₖ(u) DIV deg(u)) DIV
  * 1000).
  */
class PagerankSpec extends SparkSpecBase {
  import spark.implicits._

  test("r25: two rounds of integer PageRank on a hand graph") {
    val dir = Files.createTempDirectory("graft-pr").toString
    // c1 buys from p1 and p2 (two orders); c2 buys from p1.
    // A repeated (order, supplier) line must NOT double an edge.
    Seq((100L, 1L), (100L, 2L), (100L, 2L), (101L, 1L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    Seq((100L, 1L), (101L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    // Undirected graph: c1–p1, c1–p2, c2–p1. Degrees c1=2, c2=1,
    // p1=2, p2=1. Round 1: r1(p1) = 150+850*(500+1000)//1000 = 1425,
    // r1(p2) = 150+850*500//1000 = 575, r1(c1)=1425, r1(c2)=575.
    // Round 2: r2(p1) = 150+850*(1425//2 + 575//1)//1000
    //        = 150+850*1287//1000 = 1243;
    // r2(p2) = 150+850*(1425//2)//1000 = 150+605 = 755.
    val rows = operators.Relational.purchasePagerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_customers"),
        r.getAs[Long]("rank_milli")))
    assert(rows.toSeq == Seq((1L, 2L, 1243L), (2L, 1L, 755L)), rows.mkString(", "))
  }
}
