package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** Semantic contract of r21 (Relational.cdcApply): last-writer-wins
  * changelog fold with surfaced deletes — checked against hand-walked
  * op histories on a tiny orders table.
  */
class CdcApplySpec extends SparkSpecBase {
  import spark.implicits._

  test("r21 folds insert/update/delete histories to last-writer state") {
    val d = Files.createTempDirectory("graft-cdc").toString
    // key 1: I only; key 3: I+U; key 7: I+D; key 21: I+U+D
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, 10L, "O", 100.0, ts, "1-URGENT"),
      (3L, 10L, "O", 200.0, ts, "1-URGENT"),
      (7L, 10L, "O", 300.0, ts, "1-URGENT"),
      (21L, 10L, "O", 400.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/orders.parquet")
    val rows = operators.Relational.cdcApply(spark, d).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Long]("n_ops"), r.getAs[Long]("last_seq"),
          r.getAs[String]("status"), Option(r.getAs[Any]("final_total")))).toMap
    assert(rows.keySet == Set(1L, 3L, 7L, 21L))
    assert(rows(1L) == ((1L, 1L, "live", Some(100.0))))
    // update wins: +10% floor-cents reprice
    assert(rows(3L) == ((2L, 2L, "live", Some(220.0))))
    // delete wins and is SURFACED, value nulled
    assert(rows(7L) == ((2L, 3L, "deleted", None)))
    assert(rows(21L) == ((3L, 3L, "deleted", None)))
  }
}
