package graft.sources

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, lit, shiftright, when}

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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Idempotent re-runs of appendIfAbsent
    * and streaming micro-batches accumulate small files; at 100 TB
    * the file count (not the byte count) is what kills scan planning
    * and shuffle fan-in, so periodic compaction is part of the sink's
    * contract. Sizing uses the directory's on-disk footprint; the
    * rewrite is a single repartition (round-robin — no skew) through
    * a temp dir so a crash never leaves the table half-compacted.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    replaceDir(spark, path) { tmp =>
      spark.read.parquet(path).repartition(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    nFiles
  }

  /** CRASH-safe directory replacement: materialize the new content at
    * a sibling temp path via `write`, then swap with two checked
    * renames — a crash leaves either the intact original (recoverable
    * at `__compact_old`) or the new directory live, never a
    * half-written mix. NOT concurrency-safe: between the two renames
    * `path` briefly does not exist, and a reader that listed files
    * pre-swap fails mid-scan on the deleted originals (refreshByPath
    * below fixes only THIS session's listing cache) — quiesce
    * readers/folds of `path` around the swap, the offline-maintenance
    * contract every caller here runs under. Shared by [[compact]] and
    * the streaming index segment merges (PostingIngestStream/
    * GraphIngestStream `compact` — a merge that read its input from
    * the live `path` is safe because `write` fully materializes into
    * the temp dir before any rename).
    */
  def replaceDir(spark: org.apache.spark.sql.SparkSession, path: String)
      (write: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"replaceDir: could not move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back
      throw new java.io.IOException(s"replaceDir: could not publish $tmp")
    }
    fs.delete(old, true)
    // the session's FileStatusCache still lists the pre-swap files;
    // without this, the next read of `path` throws FILE_NOT_EXIST
    spark.catalog.refreshByPath(path)
    // and the session-keyed memos (coarse centroids, PQ codebooks,
    // table stats, ranked shingles) may hold artifacts TRAINED on the
    // pre-swap corpus — evict them so the next consumer re-derives
    // (r12 advice: the re-create-frames rule only covered frames the
    // caller created itself)
    graft.SessionMemos.invalidate(spark, path)
  }

  /** Z-order layout write: multi-key data skipping. Each key column
    * is rank-bucketized to `bits` bits via sketch-based quantile
    * boundaries (one `approxQuantile` pass — no sort, no skew
    * sensitivity), the bucket codes are bit-interleaved into one
    * z-value, and the write is range-partitioned + sorted on it. Every
    * output file then covers a small hyper-rectangle of the key space,
    * so parquet min/max footer stats prune most files for predicates
    * on ANY of the keys — where a single-column sort only skips on its
    * leading column. This is the layout decision that turns a 100 TB
    * multi-tenant fact scan into a handful of file reads; the z-value
    * is a transient column, dropped before the bytes land.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      nFiles: Int = 8, bits: Int = 4,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(cols.nonEmpty && bits * cols.size <= 30,
      "z-value must fit an int: bits * cols.size <= 30")
    val nBuckets = 1 << bits
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE sketch pass computes every column's boundaries (the
    // multi-column approxQuantile overload) — not a scan per key
    val allBounds = df.stat.approxQuantile(cols.toArray, qs, 0.001)
    // ascending quantile boundaries per column; the fold nests `when`s
    // so the highest exceeded boundary wins — a codegen'd bucketizer
    def bucketOf(c: String, bounds: Array[Double]): Column =
      bounds.zipWithIndex.foldLeft(lit(0)) { case (acc, (b, i)) =>
        when(col(c).cast("double") > b, i + 1).otherwise(acc)
      }
    val codes = cols.zip(allBounds).map { case (c, b) => bucketOf(c, b) }
    val nc = cols.size
    val zCol = (0 until bits).flatMap { p =>
      codes.zipWithIndex.map { case (bc, ci) =>
        (shiftright(bc.cast("int"), p).bitwiseAND(lit(1)) *
          lit(1 << (p * nc + (nc - 1 - ci)))).cast("long")
      }
    }.reduce(_ + _)
    df.withColumn("__z", zCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Idempotent load: append only rows whose key tuple is absent from
    * the existing table — the reference's pre-insert
    * `invoice_exists(company_id, invoice_number, invoice_date)` check
    * (db_connection.py:72-88) re-expressed as one left-anti join
    * against the current snapshot's distinct keys, so a re-run of the
    * same batch adds zero rows. Like the reference, an already-loaded
    * key suppresses ALL its incoming rows (an invoice's line items
    * load together or not at all); new keys keep every row. The
    * anti-join is a key-equality join on a distinct-key set that is
    * usually tiny relative to the data — AQE broadcasts it — and the
    * batch is materialized (cached) before the append so the write
    * never scans the directory it is appending to.
    * Returns the number of rows actually appended.
    */
  def appendIfAbsent(df: DataFrame, path: String,
      keys: Seq[String] = Seq("company_id", "invoice_number", "invoice_date")): Long = {
    val spark = df.sparkSession
    val existingKeys =
      try Some(spark.read.parquet(path).select(keys.map(col): _*).distinct())
      catch { case _: AnalysisException => None } // first load: nothing there
    // null-SAFE key equality (<=>): parsers legitimately emit null
    // keys (regex miss), and a null-unsafe anti-join would re-append
    // such rows on every replay — exactly the dupes this sink exists
    // to prevent
    val fresh = existingKeys.fold(df) { ex =>
      val exR = ex.toDF(keys.map("__ex_" + _): _*)
      val cond = keys.map(k => df(k) <=> exR("__ex_" + k)).reduce(_ && _)
      df.join(exR, cond, "left_anti")
    }.cache()
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(path)
    fresh.unpersist()
    n
  }
}
