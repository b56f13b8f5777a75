package graft.sources.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException,
  TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces,
  SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITABLE companion of [[GraftCatalog]]: a DataSource V2 `TableCatalog`
  * over a staging directory, supporting `CREATE NAMESPACE`, `CREATE TABLE`,
  * `CREATE TABLE AS SELECT`, `INSERT INTO`, `DROP TABLE`, and table rename
  * through SQL —
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_stage", classOf[GraftStagingCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft_stage.root", "/scratch/stage")
  *   spark.sql("CREATE TABLE graft_stage.work.t AS SELECT * FROM src")
  *   spark.sql("INSERT INTO graft_stage.work.t SELECT * FROM more")
  * }}}
  *
  * This is the catalog face of the reference's create/write surface
  * (`CephRgwFileSystem.create/mkdirs/rename/delete`, `/root/reference/src/
  * main/java/org/apache/hadoop/fs/cephrgw/CephRgwFileSystem.java:216-289`,
  * and the buffered object writer `CephRgwOutputStream.java:35-63`), where
  * [[GraftCatalog]] mirrors only its read side. Layout: `root/<ns>/<table>/`
  * is a directory of parquet part files. Both reads and writes delegate to
  * Spark's native `ParquetTable` (a DSv2 `FileTable`, which implements
  * `SupportsWrite`), so catalog-addressed writes get the real committer
  * protocol — task-attempt staging, job commit, no torn tables on failure —
  * and reads keep the vectorized scan + pushdown stack.
  *
  * The declared schema travels in a `_graft_schema.json` sidecar (written by
  * `createTable`, read by `loadTable`): an empty just-created table has no
  * parquet footers to infer from, and the leading underscore keeps the
  * sidecar invisible to Spark's file listing. DDL is intentionally
  * single-level (`root/<ns>/<table>`) to match the reference's
  * bucket/pseudo-directory nesting.
  */
class GraftStagingCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: File = _

  private val SchemaSidecar = GraftStagingCatalog.SchemaSidecar

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new File(Option(options.get("root")).getOrElse {
      // Throwaway-session fallback; announce it LOUDLY so a typo'd
      // `spark.sql.catalog.<name>.root` conf key (which lands here and
      // "loses" previously staged tables in a fresh temp dir) is visible in
      // the first lines of any log rather than silently absorbed.
      val tmp = Files.createTempDirectory("graft_stage_").toString
      System.err.println(
        s"[GraftStagingCatalog:$name] WARNING: option 'root' not set " +
          s"(spark.sql.catalog.$name.root) — staging tables go to throwaway " +
          s"temp dir $tmp and will NOT survive this session")
      tmp
    })
    root.mkdirs()
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): File = namespace match {
    case Array(ns) => new File(root, ns)
    case _         => null
  }

  private def requireNs(namespace: Array[String]): File = {
    val d = nsDir(namespace)
    if (d == null || !d.isDirectory) throw new NoSuchNamespaceException(namespace)
    d
  }

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Array(d.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { requireNs(namespace); Array.empty } // single-level hierarchy

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = nsDir(namespace)
    d != null && d.isDirectory
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val d = requireNs(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> d.getAbsolutePath).asJava
  }

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit = {
    val d = nsDir(ns)
    if (d == null) throw new IllegalArgumentException(
      s"$catalogName supports single-level namespaces, got ${ns.mkString(".")}")
    d.mkdirs()
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName: namespace properties are immutable")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val d = requireNs(ns)
    val tables = Option(d.listFiles()).getOrElse(Array.empty)
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    deleteRecursively(d)
  }

  // ---- tables ------------------------------------------------------------

  private def tableDir(ident: Identifier): File = {
    val ns = nsDir(ident.namespace())
    if (ns == null) null else new File(ns, ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = requireNs(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
      .sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d != null && d.isDirectory
  }

  private def qualified(ident: Identifier): String =
    s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}"

  private def parquetTable(name: String, paths: Seq[String],
      declared: Option[StructType]): ParquetTable =
    ParquetTable(name, SparkSession.active, CaseInsensitiveStringMap.empty(),
      paths, declared, classOf[ParquetFileFormat])

  override def loadTable(ident: Identifier): Table = {
    import GraftStagingCatalog._
    val d = tableDir(ident)
    if (d == null || !d.isDirectory) throw new NoSuchTableException(ident)
    // CURRENT reads resolve through the latest manifest when one exists —
    // after an OPTIMIZE rewrite the directory holds both the compacted
    // files and the originals (retained for time travel), and only the
    // manifest knows which set is current. A table with no commits yet
    // (just created, or pre-versioning) falls back to the directory.
    val readPaths = versionManifests(d).lastOption match {
      case Some((_, mf)) => manifestFiles(mf).map(f => new File(d, f).getAbsolutePath)
      case None          => Seq(d.getAbsolutePath)
    }
    new VersionedStagingTable(
      parquetTable(qualified(ident), readPaths, declaredSchema(d)),
      parquetTable(qualified(ident), Seq(d.getAbsolutePath), declaredSchema(d)), d)
  }

  // ---- time travel -------------------------------------------------------
  //
  // Every committed batch write (CTAS, INSERT INTO) also records a version
  // manifest `_graft_versions/v<N>.json` = {"ts": <commit millis>, "files":
  // [<current file names at commit>]} — written AFTER the delegate committer
  // succeeds, so an aborted job leaves no version. INSERT OVERWRITE is
  // refused (the write builder exposes no truncate face) and OPTIMIZE
  // rewrites never delete, so every manifest's file set remains readable
  // until VACUUM explicitly drops its version — what makes `VERSION AS OF`
  // sound without Delta-style tombstone tracking. `SELECT … FROM
  // graft_stage.ns.t VERSION AS OF 2` resolves through loadTable(ident,
  // version); `TIMESTAMP AS OF` picks the latest manifest at-or-before the
  // requested time. The reproducible-training story: a run pins the corpus
  // version it trained on and can re-read that exact file set while
  // ingestion keeps appending. Maintenance (file compaction + version
  // retention) lives in [[StagingMaintenance]].

  private def manifestTable(ident: Identifier, d: File, mf: File, label: String): Table = {
    import GraftStagingCatalog._
    parquetTable(s"${qualified(ident)}$label",
      manifestFiles(mf).map(f => new File(d, f).getAbsolutePath), declaredSchema(d))
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    import GraftStagingCatalog._
    val d = tableDir(ident)
    if (d == null || !d.isDirectory) throw new NoSuchTableException(ident)
    val v =
      try version.stripPrefix("v").toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$catalogName: invalid version '$version' for ${ident.name()} " +
            "(expected a commit number, e.g. VERSION AS OF 2)")
      }
    val mf = new File(new File(d, VersionsDir), s"v$v.json")
    if (!mf.isFile) {
      val have = versionManifests(d).map(_._1)
      throw new IllegalArgumentException(
        s"$catalogName: ${ident.name()} has no version $v " +
          s"(available: ${if (have.isEmpty) "none" else have.mkString(", ")})")
    }
    manifestTable(ident, d, mf, s"@v$v")
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    import GraftStagingCatalog._
    val d = tableDir(ident)
    if (d == null || !d.isDirectory) throw new NoSuchTableException(ident)
    val millis = timestamp / 1000L // Spark passes microseconds since epoch
    val at = versionManifests(d).takeWhile { case (_, f) => commitMillis(f) <= millis }
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"$catalogName: ${ident.name()} has no committed version at or before " +
          s"timestamp ${millis}ms")
    val (v, mf) = at.last
    manifestTable(ident, d, mf, s"@v$v")
  }

  /** Wraps the read and write delegates so every committed batch write also
    * records a version manifest. Deliberately NOT a `FileTable`: that keeps
    * INSERTs on the pure DSv2 write path (Spark's V1 fallback rule matches
    * only FileTable relations), so the commit hook below sees every write.
    * Reads go through the manifest-pinned delegate; writes target the table
    * DIRECTORY (new part files land beside the old). The write builder
    * exposes no truncate/overwrite face — staging tables are append-only,
    * the invariant that keeps old versions readable.
    */
  private class VersionedStagingTable(readDelegate: ParquetTable,
      writeDelegate: ParquetTable, dir: File)
      extends Table with SupportsRead with SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsDelete
      with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
    override def name(): String = readDelegate.name
    override def schema(): StructType = readDelegate.schema
    override def capabilities(): util.Set[TableCapability] = readDelegate.capabilities()
    override def partitioning(): Array[Transform] = readDelegate.partitioning()
    override def properties(): util.Map[String, String] = readDelegate.properties()
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      readDelegate.newScanBuilder(options)

    // `DELETE FROM <catalog table> WHERE <pred>` — copy-on-write row-level
    // delete, the lakehouse shape: the CURRENT file set is rewritten
    // without the matching rows and committed as a NEW version
    // (kind=delete); the original files stay on disk, so every earlier
    // `VERSION AS OF` still reads the pre-delete table until VACUUM
    // reclaims it. Object-store reality: files are immutable, deletion is
    // replacement — the same rule OPTIMIZE already follows for layout.
    // Only predicates expressible as V1 source filters are accepted
    // (canDeleteWhere); Spark raises a clear error otherwise.
    override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
      filters.forall(f => GraftStagingCatalog.filterToColumn(f).isDefined)

    override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
      GraftStagingCatalog.deleteWhere(dir, filters)

    // SQL UPDATE / MERGE INTO (and DELETE with predicates the metadata path
    // can't translate) via Spark's GROUP-BASED row-level operation
    // framework: Spark reads the affected groups through this operation's
    // scan, computes the full replacement rows, and writes them back
    // through the write builder — whose commit REPLACES the current file
    // set as a new version (kind = update/merge/delete). Group granularity
    // here is the whole table — always correct; file-granular grouping is
    // the zone-map-pruned refinement. Old files stay on disk, so every
    // pre-rewrite version remains pinnable until VACUUM — the same
    // copy-on-write contract as the metadata DELETE path.
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
      new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
        override def build(): org.apache.spark.sql.connector.write.RowLevelOperation =
          new org.apache.spark.sql.connector.write.RowLevelOperation {
            override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command =
              info.command()
            // The scan deliberately exposes NO pushdown surface (a bare
            // build()-only ScanBuilder): if the rewrite's condition reached
            // the parquet reader, files with no matching rows would vanish
            // from the replacement output — and since the commit below
            // replaces the WHOLE current set, their rows would be lost.
            // Stripping pushdown forces a full-table read, making
            // replacement = whole table the invariant the commit relies
            // on. (File-granular grouping — rewrite only affected files,
            // keep the rest — is the zone-map refinement, and requires
            // capturing the scan's post-pruning file set.)
            override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
              val sb = readDelegate.newScanBuilder(options)
              new ScanBuilder {
                override def build(): org.apache.spark.sql.connector.read.Scan = sb.build()
              }
            }
            override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
              new WriteBuilder {
                override def build(): Write = new Write {
                  override def toBatch: BatchWrite = new BatchWrite {
                    private val inner = writeDelegate.newWriteBuilder(lwi).build().toBatch
                    // ReplaceData's query emits leading bookkeeping columns
                    // (`__row_operation`) ahead of the data columns, and the
                    // plain writing task hands rows over UNPROJECTED (the
                    // row projection only applies on the metadata-write
                    // path) — so the factory binds the declared write
                    // schema to the TRAILING fields before the parquet
                    // writer sees the row.
                    override def createBatchWriterFactory(
                        pinfo: PhysicalWriteInfo): DataWriterFactory =
                      new TrailingFieldsWriterFactory(
                        inner.createBatchWriterFactory(pinfo), lwi.schema())
                    override def useCommitCoordinator(): Boolean =
                      inner.useCommitCoordinator()
                    override def onDataWriterCommit(message: WriterCommitMessage): Unit =
                      inner.onDataWriterCommit(message)
                    override def commit(messages: Array[WriterCommitMessage]): Unit = {
                      val before = GraftStagingCatalog.dataFiles(dir).toSet
                      inner.commit(messages)
                      val fresh = GraftStagingCatalog.dataFiles(dir).filterNot(before)
                      // whole-table groups: the replacement files ARE the
                      // new current set
                      GraftStagingCatalog.writeExplicitManifest(dir, fresh,
                        kind = info.command().toString.toLowerCase)
                    }
                    override def abort(messages: Array[WriterCommitMessage]): Unit =
                      inner.abort(messages)
                  }
                }
              }
          }
      }
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val inner = writeDelegate.newWriteBuilder(info)
      // Exactly-once streaming appends: a writer may tag the commit with
      // its micro-batch id (`.option("graft.batch-id", id)`). The id is
      // recorded INSIDE the version manifest — one atomic file write — so
      // "data committed" and "batch recorded" cannot tear apart, and a
      // crash-redelivered batch is detected and skipped (its staged task
      // files are aborted away). This is the catalog-sink analogue of the
      // SegmentedIndex's per-batchId segments.
      val batchId = Option(info.options.get("graft.batch-id")).map(_.toLong)
      new WriteBuilder {
        override def build(): Write = new Write {
          private val innerWrite = inner.build()
          override def description(): String = innerWrite.description()
          override def toBatch: BatchWrite = new BatchWrite {
            private val d = innerWrite.toBatch
            override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
              d.createBatchWriterFactory(info)
            override def useCommitCoordinator(): Boolean = d.useCommitCoordinator()
            override def onDataWriterCommit(message: WriterCommitMessage): Unit =
              d.onDataWriterCommit(message)
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              if (batchId.exists(GraftStagingCatalog.committedBatchIds(dir).contains)) {
                d.abort(messages) // replay of a committed batch: discard staged files
                return
              }
              // Snapshot the data files BEFORE the committer moves this
              // job's task files in: the manifest then records exactly this
              // commit's delta. Files from a crashed earlier job (committer
              // succeeded, manifest write died) stay orphaned — invisible
              // to manifest-pinned reads, reclaimed by VACUUM — instead of
              // being silently absorbed into a later version, which would
              // duplicate rows when the failed statement is retried.
              val before = GraftStagingCatalog.dataFiles(dir).toSet
              d.commit(messages)
              // only a SUCCESSFUL commit becomes a version
              GraftStagingCatalog.writeCommitManifest(dir, before, batchId)
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit =
              d.abort(messages)
          }
        }
      }
    }
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName: partitioned staging tables are not supported")
    requireNs(ident.namespace())
    val d = tableDir(ident)
    if (d.isDirectory) throw new TableAlreadyExistsException(ident)
    d.mkdirs()
    Files.write(new File(d, SchemaSidecar).toPath,
      schema.json.getBytes(StandardCharsets.UTF_8))
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMN`: schema evolution the way the reference's
    * schema-on-read deployment does it — the DECLARED schema (the sidecar)
    * widens, existing parquet files are untouched, and the reader surfaces
    * NULL for the new column on old files (Spark's parquet reader fills
    * missing read-schema columns with null, the same mechanism FsParitySpec
    * proves path-based via mergeSchema). Only top-level nullable ADD is
    * supported; everything else (drops, renames, type changes) would require
    * rewriting immutable files — refused, matching object-store reality.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (d == null || !d.isDirectory) throw new NoSuchTableException(ident)
    val sidecar = new File(d, SchemaSidecar)
    var schema: StructType =
      if (sidecar.isFile)
        DataType.fromJson(new String(
          Files.readAllBytes(sidecar.toPath), StandardCharsets.UTF_8)).asInstanceOf[StructType]
      else SparkSession.active.read.parquet(d.getAbsolutePath).schema
    changes.foreach {
      case add: TableChange.AddColumn =>
        if (add.fieldNames().length != 1)
          throw new UnsupportedOperationException(
            s"$catalogName: only top-level ADD COLUMN is supported, " +
              s"got ${add.fieldNames().mkString(".")}")
        if (schema.fieldNames.exists(_.equalsIgnoreCase(add.fieldNames()(0))))
          throw new IllegalArgumentException(
            s"$catalogName: column ${add.fieldNames()(0)} already exists in ${ident.name()}")
        if (!add.isNullable)
          throw new UnsupportedOperationException(
            s"$catalogName: added columns must be nullable (existing files " +
              "surface NULL for them)")
        schema = schema.add(add.fieldNames()(0), add.dataType(), nullable = true)
      case other =>
        throw new UnsupportedOperationException(
          s"$catalogName: unsupported ALTER TABLE change $other (only ADD COLUMN)")
    }
    Files.write(sidecar.toPath, schema.json.getBytes(StandardCharsets.UTF_8))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d != null && d.isDirectory && deleteRecursively(d)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (from == null || !from.isDirectory) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (to == null) throw new NoSuchNamespaceException(newIdent.namespace())
    if (to.isDirectory) throw new TableAlreadyExistsException(newIdent)
    requireNs(newIdent.namespace())
    if (!from.renameTo(to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  private def deleteRecursively(f: File): Boolean = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}

/** Serializable writer-factory adapter for the row-level (ReplaceData)
  * write path: binds the declared write schema to the TRAILING fields of
  * each incoming row, stripping ReplaceData's leading bookkeeping columns
  * (`__row_operation`) that the plain writing task does not project away.
  * The projection is built lazily on the executor from the first row's
  * arity; offset 0 degrades to pass-through.
  */
private class TrailingFieldsWriterFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    schema: StructType) extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private var proj: UnsafeProjection = _
      private var passThrough = false
      override def write(row: InternalRow): Unit = {
        if (proj == null && !passThrough) {
          val offset = row.numFields - schema.length
          require(offset >= 0,
            s"row has ${row.numFields} fields for a ${schema.length}-column write schema")
          if (offset == 0) passThrough = true
          else proj = UnsafeProjection.create(schema.fields.toIndexedSeq.zipWithIndex.map {
            case (f, i) => BoundReference(offset + i, f.dataType, f.nullable)
          })
        }
        w.write(if (passThrough) row else proj(row))
      }
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}

/** Manifest machinery shared by the catalog and [[StagingMaintenance]]. */
object GraftStagingCatalog {
  private[catalog] val SchemaSidecar = "_graft_schema.json"
  private[catalog] val VersionsDir = "_graft_versions"
  private val VersionFile = "^v(\\d+)\\.json$".r

  private[catalog] def declaredSchema(d: File): Option[StructType] = {
    val sidecar = new File(d, SchemaSidecar)
    if (sidecar.isFile)
      Some(DataType.fromJson(new String(
        Files.readAllBytes(sidecar.toPath), StandardCharsets.UTF_8)).asInstanceOf[StructType])
    else None
  }

  private[catalog] def versionManifests(d: File): Seq[(Long, File)] =
    Option(new File(d, VersionsDir).listFiles()).getOrElse(Array.empty).toIndexedSeq
      .flatMap { f =>
        f.getName match {
          case VersionFile(v) => Some(v.toLong -> f)
          case _              => None
        }
      }.sortBy(_._1)

  private[catalog] def manifestFiles(mf: File): Seq[String] = {
    val txt = new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
    val body = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']'))
    if (body.trim.isEmpty) Seq.empty
    else "\"([^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  private[catalog] def commitMillis(mf: File): Long = {
    val txt = new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
    "\"ts\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
  }

  /** Data files of the table dir (excludes the schema sidecar, the versions
    * dir, and committer temporaries).
    */
  private[catalog] def dataFiles(d: File): Seq[String] =
    Option(d.listFiles()).getOrElse(Array.empty).toIndexedSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).sorted

  private def writeManifest(d: File, files: Seq[String],
      batchId: Option[Long] = None, kind: String = "commit"): Long = {
    val vd = new File(d, VersionsDir)
    vd.mkdirs()
    val next = versionManifests(d).lastOption.map(_._1).getOrElse(0L) + 1L
    val bid = batchId.map(b => s""""batchId":$b,""").getOrElse("")
    val json = s"""{"ts":${System.currentTimeMillis()},"kind":"$kind",$bid"files":[${
      // distinct: under concurrent commits a racer's files can arrive both
      // via the previous-current set AND via this commit's directory delta
      // (its `before` snapshot predates the racer's move) — a double-listed
      // file would read its rows twice
      files.distinct.sorted.map(f => "\"" + f + "\"").mkString(",")}]}"""
    // temp + atomic rename: a manifest either exists complete or not at
    // all — the property the exactly-once batch-id ledger leans on
    val tmp = new File(vd, s".v$next.json.tmp")
    Files.write(tmp.toPath, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, new File(vd, s"v$next.json").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Micro-batch ids recorded by prior commits (the exactly-once ledger). */
  private[catalog] def committedBatchIds(d: File): Set[Long] =
    versionManifests(d).flatMap { case (_, f) =>
      val txt = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      "\"batchId\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }.toSet

  /** Commit hook: the new version = previous current set ∪ exactly the
    * files this commit's job moved in (the before/after directory delta).
    * Pre-OPTIMIZE originals (on disk, not current) and orphans from crashed
    * commits are both in `before`, so neither can enter the new version —
    * the former stay time-travel-only, the latter stay invisible until
    * VACUUM reclaims them.
    */
  private[catalog] def writeCommitManifest(d: File, before: Set[String],
      batchId: Option[Long] = None): Unit =
    synchronized {
      val cur = versionManifests(d).lastOption
        .map { case (_, f) => manifestFiles(f) }.getOrElse(Seq.empty)
      writeManifest(d, cur ++ dataFiles(d).filterNot(before), batchId)
    }

  /** Maintenance commit (OPTIMIZE / DELETE): the new version is EXACTLY
    * `files`, marked with a non-commit kind so file-diff consumers (the
    * change feed) know the file sets on either side are not append-
    * comparable.
    */
  private[catalog] def writeExplicitManifest(d: File, files: Seq[String],
      kind: String = "optimize"): Long =
    synchronized { writeManifest(d, files, kind = kind) }

  /** Translate a V1 source filter to a Column predicate; None = can't push
    * this delete (Spark then raises its standard unsupported-delete error).
    */
  private[catalog] def filterToColumn(
      f: org.apache.spark.sql.sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case And(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r)  => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(c)    => filterToColumn(c).map(not)
      case AlwaysTrue()  => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  /** Copy-on-write DELETE: rewrite the current file set without the rows
    * matching `filters` (conjunction; empty = delete everything, the
    * TRUNCATE face) and commit the rewrite as a new kind=delete version.
    * Same temp-write + move-then-manifest choreography as OPTIMIZE — a
    * crash mid-move leaves unreferenced files, never a torn version.
    */
  private[catalog] def deleteWhere(d: File,
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val pred = filters.flatMap(filterToColumn(_)).reduceOption(_ && _).getOrElse(lit(true))
    val current = versionManifests(d).lastOption
      .map { case (_, mf) => manifestFiles(mf) }.getOrElse(dataFiles(d))
    val kept: Seq[String] =
      if (current.isEmpty) Seq.empty
      else {
        val reader = spark.read
        declaredSchema(d).foreach(reader.schema)
        val remaining = reader
          .parquet(current.map(f => new File(d, f).getAbsolutePath): _*)
          .where(!pred)
        val tmp = new File(d, s"_delete_${System.nanoTime()}")
        remaining.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val moved = Option(tmp.listFiles()).getOrElse(Array.empty).toIndexedSeq
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map { f =>
            val target = new File(d, s"del-${tmp.getName.stripPrefix("_delete_")}-${f.getName}")
            if (!f.renameTo(target))
              throw new IllegalStateException(s"delete: move $f -> $target failed")
            target.getName
          }
        Option(tmp.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        tmp.delete()
        moved
      }
    writeExplicitManifest(d, kept, kind = "delete")
  }

  private[catalog] def manifestKind(mf: File): String = {
    val txt = new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
    "\"kind\":\"([a-z]+)\"".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("commit")
  }
}

/** Table-maintenance operations for [[GraftStagingCatalog]] tables — the
  * catalog-face answer to the object store's two operational hazards, the
  * same ones the streaming side's SegmentedIndex compaction addresses:
  *
  *  - '''optimize''': every INSERT commit lands one part-file set; a table
  *    fed by many small commits accretes many small files (the classic
  *    object-store pile-up — the reference's deployment target). OPTIMIZE
  *    rewrites the CURRENT file set into `targetFiles` compacted files and
  *    commits them as a NEW version; the originals stay on disk so every
  *    earlier `VERSION AS OF` still reads its exact file set.
  *  - '''vacuum''': bounded version retention. Drops all but the last
  *    `retainLast` manifests and deletes data files no retained version
  *    references — reclaiming the space OPTIMIZE deliberately left behind.
  *
  * Both are driver-side metadata+rewrite operations (like a lakehouse
  * OPTIMIZE/VACUUM pair), deliberately outside the SQL surface: they change
  * layout, never content.
  */
object StagingMaintenance {
  import GraftStagingCatalog._

  private def tableDir(spark: SparkSession, catalog: String, ns: String,
      table: String): File = {
    val root = spark.conf.getOption(s"spark.sql.catalog.$catalog.root")
      .getOrElse(throw new IllegalArgumentException(
        s"spark.sql.catalog.$catalog.root is not set"))
    val d = new File(new File(root, ns), table)
    if (!d.isDirectory)
      throw new IllegalArgumentException(s"no staging table at $d")
    d
  }

  /** Compact the current file set into `targetFiles` files, committed as a
    * new version. Returns (filesBefore, filesAfter, newVersion).
    *
    * `clusterBy`: when set, the rewrite RANGE-partitions and sorts on that
    * column instead of hash-scattering — CLUSTER BY as a maintenance
    * operation (the lakehouse OPTIMIZE-with-clustering shape). Commits
    * arrive in ingestion order, so every file of an unclustered table spans
    * the whole keyspace and zone maps ([[analyze]]/[[prunedScan]]) can
    * skip nothing; after a clustered rewrite the per-file [min,max] ranges
    * are disjoint and a range predicate touches ~its fraction of files.
    * Layout only, never content — same manifest rules as a plain OPTIMIZE.
    */
  def optimize(spark: SparkSession, catalog: String, ns: String, table: String,
      targetFiles: Int = 4, clusterBy: Option[String] = None): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.col
    val d = tableDir(spark, catalog, ns, table)
    val current = versionManifests(d).lastOption
      .map { case (_, mf) => manifestFiles(mf) }.getOrElse(dataFiles(d))
    if (current.isEmpty) return (0, 0, -1L)
    val reader = spark.read
    declaredSchema(d).foreach(reader.schema)
    val df = reader.parquet(current.map(f => new File(d, f).getAbsolutePath): _*)
    // rewrite into a staging subdir (underscore-prefixed: invisible to data
    // listings), then move the compacted parts into the table dir under
    // unique names BEFORE committing the manifest that references them —
    // a crash mid-move leaves unreferenced files, never a torn version
    val tmp = new File(d, s"_optimize_${System.nanoTime()}")
    val laid = clusterBy match {
      case Some(c) => df.repartitionByRange(targetFiles, col(c)).sortWithinPartitions(col(c))
      case None    => df.repartition(targetFiles)
    }
    laid.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val moved = Option(tmp.listFiles()).getOrElse(Array.empty).toIndexedSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val target = new File(d, s"opt-${tmp.getName.stripPrefix("_optimize_")}-${f.getName}")
        if (!f.renameTo(target))
          throw new IllegalStateException(s"optimize: move $f -> $target failed")
        target.getName
      }
    deleteRecursively(tmp)
    val v = writeExplicitManifest(d, moved)
    (current.size, moved.size, v)
  }

  /** Append-only change data feed: the rows added in versions
    * `(fromVersion, toVersion]`. Because commits only ADD files, the
    * row-level delta is exactly the FILE-level delta between the two
    * manifests — a metadata diff plus a scan of only the new files, no
    * row comparison anywhere. Refused across an OPTIMIZE boundary (its
    * manifest rewrites the file set without changing rows, so a file diff
    * there would misreport the whole table as changed) — read the two
    * versions directly in that case. This is the incremental-consumer
    * primitive: a downstream job remembers the version it last processed
    * and reads forward from there instead of re-scanning the table.
    */
  def changesBetween(spark: SparkSession, catalog: String, ns: String,
      table: String, fromVersion: Long, toVersion: Long): org.apache.spark.sql.DataFrame = {
    require(fromVersion <= toVersion, s"from $fromVersion > to $toVersion")
    val d = tableDir(spark, catalog, ns, table)
    val manifests = versionManifests(d).toMap
    def mf(v: Long): File = manifests.getOrElse(v,
      throw new IllegalArgumentException(
        s"$catalog.$ns.$table has no version $v (vacuumed or never committed)"))
    ((fromVersion + 1) to toVersion).foreach { v =>
      val kind = manifestKind(mf(v))
      if (kind != "commit")
        throw new IllegalArgumentException(
          s"change feed crosses ${kind.toUpperCase} at version $v: file sets " +
            "are not append-comparable across a rewrite — read the versions directly")
    }
    val fromFiles =
      if (fromVersion == 0L) Set.empty[String] else manifestFiles(mf(fromVersion)).toSet
    val newFiles = manifestFiles(mf(toVersion)).filterNot(fromFiles)
    val reader = spark.read
    declaredSchema(d).foreach(reader.schema)
    if (newFiles.isEmpty)
      reader.schema(declaredSchema(d).getOrElse(
        spark.read.parquet(d.getAbsolutePath).schema))
        .parquet() // empty relation with the table schema
    else reader.parquet(newFiles.map(f => new File(d, f).getAbsolutePath): _*)
  }

  // ---- zone maps (file-level min/max data skipping) ----------------------
  //
  // The object-store answer to "don't read what can't match": per-file
  // min/max statistics harvested from the parquet FOOTERS (a metadata-only
  // positional read — the same access pattern the reference's
  // CephRgwInputStream.read(position,...) exists to make cheap,
  // CephRgwInputStream.java:103-120), persisted in a `_graft_stats.tsv`
  // sidecar, and consulted at read time to skip whole files whose
  // [min,max] range cannot intersect the predicate. File-granular skipping
  // sits ABOVE the row-group skipping Spark's parquet reader already does
  // (FsParitySpec proves that layer): at 100 TB it is the difference
  // between listing-and-opening every object and touching only the
  // partitions of the keyspace the query asks for. Files are immutable, so
  // stats never go stale; ANALYZE is incremental (only files without
  // recorded stats are footer-read).

  private val StatsSidecar = "_graft_stats.tsv"

  /** (file, column) -> (min, max), from the stats sidecar. */
  private def readStats(d: File): Map[(String, String), (Long, Long)] = {
    val f = new File(d, StatsSidecar)
    if (!f.isFile) Map.empty
    else java.nio.file.Files.readAllLines(f.toPath).asScala
      .filter(_.nonEmpty).map { line =>
        val Array(file, col, mn, mx) = line.split("\t", 4)
        (file, col) -> (mn.toLong, mx.toLong)
      }.toMap
  }

  /** Files the CURRENT version reads (manifest-pinned when versioned). */
  private def currentFiles(d: File): Seq[String] =
    versionManifests(d).lastOption
      .map { case (_, mf) => manifestFiles(mf) }.getOrElse(dataFiles(d))

  /** Harvest per-file min/max for integral `columns` from parquet footers —
    * no data pages are read. Incremental: files already covered by the
    * sidecar are skipped (files are immutable). Returns the number of files
    * newly analyzed.
    */
  def analyze(spark: SparkSession, catalog: String, ns: String, table: String,
      columns: Seq[String]): Int = synchronized {
    import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
    val d = tableDir(spark, catalog, ns, table)
    val existing = readStats(d)
    val todo = currentFiles(d)
      .filterNot(f => columns.forall(c => existing.contains((f, c))))
    val conf = spark.sessionState.newHadoopConf()
    val lines = todo.flatMap { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(new File(d, f).getAbsolutePath), conf))
      try {
        val byCol = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
        columns.flatMap { c =>
          val ranges = byCol.getOrElse(c, Seq.empty).map(_.getStatistics).collect {
            case s: LongStatistics if s.hasNonNullValue => (s.getMin, s.getMax)
            case s: IntStatistics if s.hasNonNullValue  => (s.getMin.toLong, s.getMax.toLong)
          }
          // no usable stats (non-integral type, all-null, or stats absent):
          // record nothing — the pruner keeps the file conservatively
          if (ranges.isEmpty) None
          else Some(s"$f\t$c\t${ranges.map(_._1).min}\t${ranges.map(_._2).max}")
        }
      } finally reader.close()
    }
    if (lines.nonEmpty) {
      val out = new File(d, StatsSidecar)
      val prev = if (out.isFile)
        new String(java.nio.file.Files.readAllBytes(out.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
      else ""
      java.nio.file.Files.write(out.toPath,
        (prev + lines.mkString("", "\n", "\n"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    todo.size
  }

  /** Zone-map-pruned scan: read only current files whose recorded
    * [min,max] on `column` intersects [lo,hi] (files without stats are
    * read conservatively), then apply the row-level predicate on top —
    * pruning is file-granular, it never substitutes for the filter.
    * Returns (dataframe, filesCurrent, filesRead).
    */
  def prunedScan(spark: SparkSession, catalog: String, ns: String, table: String,
      column: String, lo: Long, hi: Long): (org.apache.spark.sql.DataFrame, Int, Int) =
    prunedScan(spark, catalog, ns, table, Seq((column, lo, hi)))

  /** Conjunctive zone-map pruning: a file survives only if EVERY
    * predicate's [lo,hi] can intersect its recorded range — ranges compose
    * by AND, so two individually-weak predicates can together prune a file
    * (or everything) that neither alone could. All row-level predicates
    * still apply after the scan.
    */
  def prunedScan(spark: SparkSession, catalog: String, ns: String, table: String,
      preds: Seq[(String, Long, Long)]): (org.apache.spark.sql.DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preds.nonEmpty, "prunedScan needs at least one predicate")
    val d = tableDir(spark, catalog, ns, table)
    val stats = readStats(d)
    val current = currentFiles(d)
    val keep = current.filter { f =>
      preds.forall { case (column, lo, hi) =>
        stats.get((f, column)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None           => true
        }
      }
    }
    val reader = spark.read
    declaredSchema(d).foreach(reader.schema)
    val df =
      if (keep.isEmpty)
        reader.schema(declaredSchema(d).getOrElse(
          spark.read.parquet(d.getAbsolutePath).schema)).parquet()
      else reader.parquet(keep.map(f => new File(d, f).getAbsolutePath): _*)
    val cond = preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .foldLeft(lit(true))(_ && _)
    (df.where(cond), current.size, keep.size)
  }

  /** DESCRIBE-HISTORY face: one row per retained version manifest —
    * (version, kind, n_files, batch_id). Timestamps are deliberately NOT
    * exposed here (wall-clock noise); they remain in the manifest for
    * `TIMESTAMP AS OF`. This is how an operator audits what happened to a
    * table: which commits were appends, which were maintenance rewrites,
    * which streaming batch each append belongs to.
    */
  def history(spark: SparkSession, catalog: String, ns: String,
      table: String): org.apache.spark.sql.DataFrame = {
    val d = tableDir(spark, catalog, ns, table)
    val rows = versionManifests(d).map { case (v, mf) =>
      val txt = new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
      val bid = "\"batchId\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
      (v, manifestKind(mf), manifestFiles(mf).size.toLong, bid)
    }
    import spark.implicits._
    rows.toDF("version", "kind", "n_files", "batch_id")
  }

  /** Keep only the last `retainLast` versions; delete every data file no
    * retained version references. Returns the deleted file names.
    */
  def vacuum(spark: SparkSession, catalog: String, ns: String, table: String,
      retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "vacuum must retain at least the current version")
    val d = tableDir(spark, catalog, ns, table)
    val manifests = versionManifests(d)
    val (drop, keep) = manifests.splitAt(math.max(0, manifests.size - retainLast))
    val referenced = keep.flatMap { case (_, f) => manifestFiles(f) }.toSet
    drop.foreach { case (_, f) => f.delete() }
    val dead = dataFiles(d).filterNot(referenced)
    dead.foreach(f => new File(d, f).delete())
    dead
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
