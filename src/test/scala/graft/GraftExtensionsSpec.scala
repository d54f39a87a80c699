package graft

import graft.functions.Vector
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must rewrite the HOF dot-product
  * pattern to FloatVecDot (visible in the optimized plan) without
  * changing results; graft_dot must be callable from SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // shared session + live install() — robust to suite ordering (a
  // fresh-session .withExtensions(GraftExtensions) path behaves the
  // same; install() is the already-running-session route)
  private lazy val spark: SparkSession = {
    val s = SparkSpecBase.session
    GraftExtensions.install(s)
    s
  }

  test("optimizer rewrites HOF dot to FloatVecDot, same results") {
    import spark.implicits._
    // a file source keeps the projection in the optimized plan (a
    // LocalRelation would be constant-folded before we can look)
    val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.5f, -1f, 2f), Array(1f, 1f, 1f)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(Vector.dotHof(col("a"), col("b")).as("d"))
      .orderBy("d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("floatvecdot") || optimized.contains("FloatVecDot"),
      s"rewrite did not fire:\n$optimized")
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.5, 32.0))
  }

  test("rule leaves non-dot aggregates alone") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") + y.cast("double")),   // sum, not product
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("floatvecdot"))
    assert(df.collect().head.getDouble(0) == 10.0)
  }

  test("graft_dot is callable from SQL") {
    import spark.implicits._
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect()
    assert(r.head.getDouble(0) == 11.0)
  }
}
