package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation: a directory of raw document files as
  * a structured table of text lines with doc-type routing —
  * `spark.read.format("graft-docs").load(dir)`.
  *
  * The distributed twin of the reference's per-file loop
  * (lib/pipeline_runner.py:45-113) as a first-class Spark source:
  * one input partition per file (the natural unit of work — files
  * partition evenly across 1000 executors), column pruning pushed
  * into the reader (a `select(file_name)` never materializes line
  * text), and doc-type routing applied at scan time.
  */
object DocTextSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("file_name", StringType, nullable = false),
    StructField("doc_type", StringType, nullable = false),
    StructField("line_no", IntegerType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Filename → type, mirroring pipeline_runner.detect_doc_type:4-21. */
  def docType(fileName: String): String = {
    val n = fileName.toLowerCase
    if (n.contains("award letter")) "nc_award_letter"
    else if (n.contains("bids as read")) "nc_bids_as_read"
    else if (n.contains("bid tabs")) "nc_bid_tabs"
    else if (n.contains("invitation to bid")) "nc_invitation_to_bid"
    else if (n.contains("item c")) "nc_item_c"
    else "invoice"
  }
}

class DocTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocTextSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new DocTable(properties.get("path"))
}

class DocTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-docs(`$root`)"
  override def schema(): StructType = DocTextSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocScanBuilder(root)
}

class DocScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var required: StructType = DocTextSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** doc_type / file_name predicates prune whole FILES at planning
    * time (both are functions of the file name alone — no file is
    * even opened). Filters are still returned as residual so Spark
    * re-applies them: pruning is an optimization, never a correctness
    * dependency.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("doc_type", _) | EqualTo("file_name", _) => true
      case In("doc_type", _) | In("file_name", _) => true
      case _ => false
    }
    filters // all residual — re-evaluated row-wise for safety
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DocScan(root, required, pushed)
}

case class DocFilePartition(file: String) extends InputPartition

class DocScan(root: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {
  import org.apache.spark.sql.sources.{EqualTo, In}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def fileSurvives(path: String): Boolean = {
    val name = new HPath(path).getName
    val dtype = DocTextSource.docType(name)
    pushed.forall {
      case EqualTo("doc_type", v) => dtype == v
      case EqualTo("file_name", v) => name == v
      case In("doc_type", vs) => vs.contains(dtype)
      case In("file_name", vs) => vs.contains(name)
      case _ => true
    }
  }

  /** File listing through the Hadoop FileSystem API (resolved from
    * the path's scheme + the session's Hadoop conf), so the source
    * works against local paths, HDFS, and object stores alike —
    * `listFiles(recursive = true)` is the one listing call the
    * object-store connectors optimize into a flat LIST. Runs on the
    * driver (like every Spark file source's planning pass); the
    * per-file reads happen on executors through the same API.
    */
  private def driverConf: Configuration =
    try org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    catch { case _: Throwable => new Configuration() }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = driverConf
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(conf)
    val it = fs.listFiles(rootPath, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) buf += st.getPath.toString
    }
    buf.toArray.sorted.filter(fileSurvives)
      .map(DocFilePartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the session's Hadoop conf (object-store credentials, HA
    // nameservices, …) must reach the executors: Configuration is not
    // serializable, so ship its entries as a plain Map and rebuild on
    // the reader side — a fresh empty Configuration there would fail
    // on exactly the storage systems this source exists to support
    val conf = driverConf
    val entries = {
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new DocReaderFactory(required, entries)
  }
}

class DocReaderFactory(required: StructType,
    confEntries: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DocPartitionReader(p.asInstanceOf[DocFilePartition].file, required,
      confEntries)
}

/** Reads one file through the Hadoop FileSystem API (executor-side);
  * emits only the pruned columns.
  */
class DocPartitionReader(file: String, required: StructType,
    confEntries: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {
  private val fileName = new HPath(file).getName
  private val dtype = DocTextSource.docType(fileName)
  private lazy val lines: Array[String] = {
    val p = new HPath(file)
    val conf = new Configuration()
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val out = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
    finally in.close()
    new String(out.toByteArray, StandardCharsets.UTF_8).split("\r?\n", -1)
  }
  private var i = -1

  private val fieldGen: Array[Int => Any] = required.fields.map { f =>
    f.name match {
      case "path" => (_: Int) => UTF8String.fromString(file)
      case "file_name" => (_: Int) => UTF8String.fromString(fileName)
      case "doc_type" => (_: Int) => UTF8String.fromString(dtype)
      case "line_no" => (n: Int) => n
      case "line" => (n: Int) => UTF8String.fromString(lines(n))
    }
  }

  override def next(): Boolean = { i += 1; i < lines.length }
  override def get(): InternalRow =
    new GenericInternalRow(fieldGen.map(g => g(i)).toArray[Any])
  override def close(): Unit = ()
}
