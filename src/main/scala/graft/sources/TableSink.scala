package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side plumbing for the 100 TB layout decisions: partitioned
  * parquet for pruning, bucketed tables for shuffle-free co-located
  * joins. (The reference's "sink" is a postgres INSERT loop
  * (db_connection.py); at scale the lake layout IS the sink.)
  */
object TableSink {

  /** Hive-style partitioned parquet: downstream filters on the
    * partition columns prune whole directories at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted table in the session catalog: equi-joins and
    * aggregations on the bucket key skip the exchange entirely —
    * the co-located-join strategy for repeated large-table joins.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
