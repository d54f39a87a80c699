package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents table (SURVEY.md §2.6).
  * All single-pass projections — no shuffle at all except final sort;
  * at 100 TB these run at parquet-scan speed with `text` the only
  * wide column read.
  */
object TextOps {

  /** t01 — whitespace + BPE-ish token counting. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.tokenCountWs(col("text")).as("n_tokens_ws"),
        Text.tokenCountBpe(col("text")).as("n_tokens_bpe"))
      .orderBy(col("doc_id"))

  /** t02 — heuristic quality scoring. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.tokenCountWs(col("text")).as("n_words"),
        Text.stopwordCount(col("text")).as("n_stopwords"),
        Text.punctCount(col("text")).as("n_punct"),
        Text.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** t03 — marker-word language ID vs the labeled lang column. */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        Text.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** t04 — positional rolling-hash fingerprint. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
}
