package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation (the Aggregator/TypedColumn path): mean
  * embedding vector per label — the centroid computation an IVF index
  * build runs over the whole corpus. The buffer is (component sums,
  * count): fixed-size, mergeable, the same contract as any Spark
  * partial aggregate.
  */
object VectorAgg {

  case class LabeledVec(label: Int, embedding: Array[Float])

  object MeanVector extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    }

    override def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) Array.empty else r._1.map(_ / r._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** m04 — label centroids, exploded to one row per (label, idx)
    * component with the value floored to milli-units: scalar columns
    * only (a top-level array column breaks the cross-engine row
    * sort/hash), and the floor absorbs float-summation-order ulps.
    */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("label"), col("embedding"))
      .as[LabeledVec]
      .groupByKey(_.label)
      .mapValues(_.embedding)
      .agg(MeanVector.toColumn.name("centroid"))
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "c")))
      .select(col("label"), (col("pos") + 1).cast("int").as("idx"),
        floor(col("c") * 1000).cast("long").as("c_milli"))
      .orderBy(col("label"), col("idx"))
  }

  /** Internal (s03 IVF): per-label mean centroid as a float array —
    * the un-exploded form of m04, reused as real IVF centroids.
    */
  def centroidVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("label"), col("embedding"))
      .as[LabeledVec]
      .groupByKey(_.label)
      .mapValues(_.embedding)
      .agg(MeanVector.toColumn.name("centroid"))
      .toDF("label", "centroid")
      // floor to milli-units BEFORE use so downstream cosine math is
      // bit-identical to an oracle that rebuilds the same centroids
      .select(col("label").as("cid"),
        transform(col("centroid"), x =>
          (floor(x * 1000) / lit(1000.0)).cast("float")).as("cv"))
  }
}
