package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Read-side helper for the foreachBatch `batch_id=*` overwrite
  * sinks: always read with the sink's EXPLICIT schema, and tolerate a
  * freshly started stream whose first batch has not landed yet.
  * Schema inference on a path with no partitions throws
  * AnalysisException — exactly the dashboard-polls-too-early shape a
  * live profile reader must survive (round-10 advice).
  */
object BatchReads {

  /** The folded grains under `outPath/batch_id=*` as one frame with
    * `schema` (plus the discovered batch_id partition column, when
    * any partition exists); an EMPTY frame with `schema` when the
    * path is absent or holds no batch partition yet.
    */
  def batches(s: SparkSession, outPath: String,
      schema: StructType): DataFrame = {
    val p = new Path(outPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    if (hasBatch) s.read.schema(schema).parquet(outPath)
    else s.createDataFrame(java.util.Collections.emptyList[Row](), schema)
  }
}
