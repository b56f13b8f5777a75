package graft.sources.v2

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch SINK with the full commit protocol — the Spark-native
  * answer to the reference's most fragile operation, rename-as-commit
  * (`CephRgwFileSystem.java:310-313` implements rename as S3A copy+delete,
  * and SURVEY.md §7 flags job-commit-by-rename as the hazard to design
  * away). DSv2 replaces path-rename atomicity with an explicit two-phase
  * protocol: each task buffers rows and surrenders them ONLY through its
  * `WriterCommitMessage`; the driver's `commit(messages)` installs all
  * task outputs atomically, and `abort()` (task- or job-level) discards
  * buffered rows so a failed job leaves NO partial table — the property
  * rename-based committers approximate with temp dirs.
  *
  * The store is an in-process map (the smallest thing that can prove the
  * protocol; a real sink would stage files/objects per task). Tables are
  * readable back through the same provider, with column pruning.
  *
  * Usage: `df.write.format("graft.sources.v2.MemSink").option("name", t)
  * .mode("overwrite"|"append").save()`; read back with
  * `spark.read.format(...).option("name", t).load()`.
  */
class MemSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemSink.store.get(MemSink.tableName(options)).map(_._1)
      .getOrElse(new StructType())
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(MemSink.tableName(new CaseInsensitiveStringMap(properties)), schema)
}

object MemSink {
  /** name → (schema, committed rows). Replaced atomically at job commit. */
  val store: TrieMap[String, (StructType, Vector[InternalRow])] = TrieMap.empty
  /** Test hook: abort() bumps this so specs can assert cleanup ran. */
  val aborts = new java.util.concurrent.atomic.AtomicLong(0)

  def tableName(options: CaseInsensitiveStringMap): String = {
    val n = options.get("name")
    require(n != null && n.nonEmpty, "MemSink requires option(\"name\", ...)")
    n
  }
}

class MemTable(name: String, schema0: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType =
    if (schema0.nonEmpty) schema0 else MemSink.store.get(name).map(_._1).getOrElse(schema0)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(name)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema())
}

class MemWriteBuilder(name: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, doTruncate)
  }
}

/** Driver-side job coordinator. `commit` is the ONLY point where task output
  * becomes visible, and it installs every task's rows in one map update —
  * torn states (some tasks visible, some not) cannot exist, unlike a
  * rename-per-file committer mid-job.
  */
class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.iterator
      .map(_.asInstanceOf[MemCommitMessage])
      .toSeq.sortBy(_.partitionId) // deterministic row order across runs
      .flatMap(_.rows).toVector
    val prev =
      if (truncate) Vector.empty
      else MemSink.store.get(name).map(_._2).getOrElse(Vector.empty)
    MemSink.store.put(name, (schema, prev ++ incoming))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    MemSink.aborts.incrementAndGet()
    // buffered rows were only ever reachable via the messages — dropping
    // them IS the cleanup; the committed store is untouched.
  }
}

case class MemCommitMessage(partitionId: Int, rows: Seq[InternalRow])
    extends WriterCommitMessage

class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      private val failPart =
        Option(System.getProperty("graft.memsink.failPartition")).map(_.toInt)
      override def write(record: InternalRow): Unit = {
        if (failPart.contains(partitionId))
          throw new RuntimeException(s"injected failure in partition $partitionId")
        buf += record.copy() // unsafe-row buffers are reused per record
      }
      override def commit(): WriterCommitMessage = MemCommitMessage(partitionId, buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

class MemScanBuilder(name: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val full: StructType =
    MemSink.store.get(name).map(_._1).getOrElse(new StructType())
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new MemScan(name, full, required)
}

class MemScan(name: String, full: StructType, required: StructType)
    extends Scan with Batch {
  private val rows = MemSink.store.get(name).map(_._2).getOrElse(Vector.empty)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_mem($name) rows=${rows.size}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    MemReaderFactory(
      required.fieldNames.map(full.fieldIndex),
      full.fields.map(_.dataType))
}

/** Top-level (no outer capture) so the factory serializes to executors. */
case class MemReaderFactory(
    idx: Array[Int],
    types: Array[org.apache.spark.sql.types.DataType]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rs = p.asInstanceOf[MemPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rs.length }
      override def get(): InternalRow = {
        val r = rs(i)
        new GenericInternalRow(idx.map(j => r.get(j, types(j))))
      }
      override def close(): Unit = ()
    }
}

case class MemPartition(rows: Vector[InternalRow]) extends InputPartition
