package graft.sources

import graft.functions.Parse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion plumbing (reference: lib/pipeline_runner.py —
  * recursive file walk → per-file text extraction → doc-type routing).
  * Spark-first: `binaryFile` scan gives (path, modificationTime,
  * length, content) distributed over executors; text decode for
  * text-like files is in-engine; the OCR step for scanned media is the
  * stubbed decode in operators.Multimodal.
  */
object DocSource {

  /** Scan a directory tree of raw document files as binary blobs with
    * doc-type routing on filename — the distributed twin of
    * pipeline_runner.run_extraction_pipeline's file loop.
    */
  def scanFiles(spark: SparkSession, root: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        col("path"),
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("modificationTime").as("mod_time"),
        col("length").as("byte_len"),
        col("content"))
      .withColumn("doc_type", Parse.docType(col("file_name"), lit(null)))

  /** Decode text-like payloads to lines — one row per (file, line),
    * the unit every reference parser consumes.
    */
  def textLines(files: DataFrame): DataFrame =
    files
      .withColumn("text", decode(col("content"), "UTF-8"))
      .select(col("path"), col("file_name"), col("doc_type"),
        posexplode(split(col("text"), "\r?\n")).as(Seq("line_no", "line")))
}
