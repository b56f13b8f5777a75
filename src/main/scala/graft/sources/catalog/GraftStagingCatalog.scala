package graft.sources.catalog

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  * ALL metadata I/O goes through the Hadoop `FileSystem` API resolved from
  * the root path's scheme — the exact contract the reference implements for
  * object storage (`CephRgwFileSystem.java:42` registers `cephrgw://`) — so
  * the catalog can be pointed at `file://`, HDFS, or a `cephrgw://`-style
  * store unchanged. Crucially, the version-manifest commit does NOT depend
  * on atomic rename (the reference's own rename is S3A copy-then-delete,
  * `CephRgwFileSystem.java:310-313` — not atomic): a commit is
  * `FileSystem.create(vN.json, overwrite = false)` — CREATE-EXCLUSIVE — so
  * version N either exists complete under exactly one writer or does not
  * exist. Losing the create race means another writer committed N first;
  * append commits recompute and retry as N+1, rewrite commits (OPTIMIZE /
  * DELETE / UPDATE / MERGE) abort with a conflict instead of silently
  * dropping the racer's rows (optimistic concurrency — the lost-update
  * guard).
  *
  * The declared schema travels in a `_graft_schema.json` sidecar (written by
  * `createTable`, read by `loadTable`): an empty just-created table has no
  * parquet footers to infer from, and the leading underscore keeps the
  * sidecar invisible to Spark's file listing. DDL is intentionally
  * single-level (`root/<ns>/<table>`) to match the reference's
  * bucket/pseudo-directory nesting.
  */
class GraftStagingCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var root: Path = _
  private var fs: FileSystem = _

  private val SchemaSidecar = GraftStagingCatalog.SchemaSidecar

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val rootStr = Option(options.get("root")).getOrElse {
      // Throwaway-session fallback; announce it LOUDLY so a typo'd
      // `spark.sql.catalog.<name>.root` conf key (which lands here and
      // "loses" previously staged tables in a fresh temp dir) is visible in
      // the first lines of any log rather than silently absorbed.
      val tmp = java.nio.file.Files.createTempDirectory("graft_stage_").toString
      System.err.println(
        s"[GraftStagingCatalog:$name] WARNING: option 'root' not set " +
          s"(spark.sql.catalog.$name.root) — staging tables go to throwaway " +
          s"temp dir $tmp and will NOT survive this session")
      tmp
    }
    val raw = new Path(rootStr)
    fs = raw.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    root = fs.makeQualified(raw)
    fs.mkdirs(root)
  }

  override def name(): String = catalogName

  private def isDir(p: Path): Boolean =
    try fs.getFileStatus(p).isDirectory catch { case _: FileNotFoundException => false }

  private def nsDir(namespace: Array[String]): Path = namespace match {
    case Array(ns) => new Path(root, ns)
    case _         => null
  }

  private def requireNs(namespace: Array[String]): Path = {
    val d = nsDir(namespace)
    if (d == null || !isDir(d)) throw new NoSuchNamespaceException(namespace)
    d
  }

  private def listDirs(p: Path): Seq[FileStatus] =
    (try fs.listStatus(p).toIndexedSeq catch { case _: FileNotFoundException => Seq.empty })
      .filter(_.isDirectory)

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    listDirs(root).map(d => Array(d.getPath.getName)).sortBy(_.head).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { requireNs(namespace); Array.empty } // single-level hierarchy

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = nsDir(namespace)
    d != null && isDir(d)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val d = requireNs(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> d.toString).asJava
  }

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit = {
    val d = nsDir(ns)
    if (d == null) throw new IllegalArgumentException(
      s"$catalogName supports single-level namespaces, got ${ns.mkString(".")}")
    fs.mkdirs(d)
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName: namespace properties are immutable")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val d = requireNs(ns)
    if (listDirs(d).nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} is not empty")
    fs.delete(d, true)
  }

  // ---- tables ------------------------------------------------------------

  private def tableDir(ident: Identifier): Path = {
    val ns = nsDir(ident.namespace())
    if (ns == null) null else new Path(ns, ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = requireNs(namespace)
    listDirs(d).map(_.getPath.getName)
      .filterNot(_.startsWith("_")) // sidecar dirs (_graft_views) are not tables
      .map(Identifier.of(namespace, _)).sortBy(_.name).toArray
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d != null && !ident.name().startsWith("_") && isDir(d)
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
    if (d == null || !isDir(d)) throw new NoSuchTableException(ident)
    // CURRENT reads resolve through the latest manifest when one exists —
    // after an OPTIMIZE rewrite the directory holds both the compacted
    // files and the originals (retained for time travel), and only the
    // manifest knows which set is current. A table with no commits yet
    // (just created, or pre-versioning) falls back to the directory. The
    // resolved version number is the SNAPSHOT this table object reads; a
    // row-level rewrite through it commits against exactly that base
    // (optimistic concurrency).
    val (snapshotVersion, readPaths) = versionManifests(fs, d).lastOption match {
      case Some((v, mf)) => (v, manifestFiles(fs, mf).map(f => new Path(d, f).toString))
      case None          => (0L, Seq(d.toString))
    }
    new VersionedStagingTable(
      parquetTable(qualified(ident), readPaths, declaredSchema(fs, d)),
      parquetTable(qualified(ident), Seq(d.toString), declaredSchema(fs, d)),
      d, snapshotVersion)
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

  private def manifestTable(ident: Identifier, d: Path, mf: Path, label: String): Table = {
    import GraftStagingCatalog._
    parquetTable(s"${qualified(ident)}$label",
      manifestFiles(fs, mf).map(f => new Path(d, f).toString), declaredSchema(fs, d))
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    import GraftStagingCatalog._
    val d = tableDir(ident)
    if (d == null || !isDir(d)) throw new NoSuchTableException(ident)
    val v =
      try version.stripPrefix("v").toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$catalogName: invalid version '$version' for ${ident.name()} " +
            "(expected a commit number, e.g. VERSION AS OF 2)")
      }
    val mf = new Path(new Path(d, VersionsDir), s"v$v.json")
    if (!isFile(fs, mf)) {
      val have = versionManifests(fs, d).map(_._1)
      throw new IllegalArgumentException(
        s"$catalogName: ${ident.name()} has no version $v " +
          s"(available: ${if (have.isEmpty) "none" else have.mkString(", ")})")
    }
    manifestTable(ident, d, mf, s"@v$v")
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    import GraftStagingCatalog._
    val d = tableDir(ident)
    if (d == null || !isDir(d)) throw new NoSuchTableException(ident)
    val millis = timestamp / 1000L // Spark passes microseconds since epoch
    val at = versionManifests(fs, d).takeWhile { case (_, f) => commitMillis(fs, f) <= millis }
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
      writeDelegate: ParquetTable, dir: Path, snapshotVersion: Long)
      extends Table with SupportsRead with SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsDelete
      with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
    private val tableFs = fs
    override def name(): String = readDelegate.name
    override def schema(): StructType = readDelegate.schema
    override def capabilities(): util.Set[TableCapability] = readDelegate.capabilities()
    override def partitioning(): Array[Transform] = readDelegate.partitioning()
    override def properties(): util.Map[String, String] = readDelegate.properties()
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      val inner = readDelegate.newScanBuilder(options)
      // Zone-map integration with the PLAIN scan path: when the table has a
      // stats sidecar (ANALYZE ran), wrap the builder so pushed filters are
      // additionally consulted against the per-file [min,max] ranges and
      // non-intersecting files are dropped from the planned splits — plain
      // `SELECT … WHERE` gets file skipping without the prunedScan side API.
      val stats = StagingMaintenance.readStatsFor(tableFs, dir)
      if (stats.isEmpty) inner
      else inner match {
        case fb: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =>
          new ZoneMapScanBuilder(fb, stats)
        case other => other
      }
    }

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
      GraftStagingCatalog.deleteWhere(tableFs, dir, filters, snapshotVersion)

    // SQL UPDATE / MERGE INTO (and DELETE with predicates the metadata path
    // can't translate) via Spark's GROUP-BASED row-level operation
    // framework: Spark reads the affected groups through this operation's
    // scan, computes the full replacement rows, and writes them back
    // through the write builder — whose commit REPLACES the current file
    // set as a new version (kind = update/merge/delete). Group granularity
    // here is the whole table — always correct; file-granular grouping is
    // the zone-map-pruned refinement. Old files stay on disk, so every
    // pre-rewrite version remains pinnable until VACUUM — the same
    // copy-on-write contract as the metadata DELETE path. The commit
    // carries the snapshot version this table resolved as its base: if the
    // table advanced past it (a racing append or rewrite committed), the
    // commit ABORTS with a conflict instead of replacing the current set
    // from a stale snapshot — the classic lost-update guard.
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
      new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
        override def build(): org.apache.spark.sql.connector.write.RowLevelOperation =
          new org.apache.spark.sql.connector.write.RowLevelOperation {
            override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command =
              info.command()
            // The replacement scan exposes NO row-level pushdown — every
            // filter expression is returned as still-to-evaluate, so the
            // parquet reader always hands back FULL rows and the commit's
            // "replacement = everything the query emitted" invariant can
            // never lose rows to a reader-side filter. The filters ARE
            // harvested for FILE pruning, though: a planned conjunct that
            // zone maps prove unsatisfiable on a file means that file
            // contributes no rows to the replacement query (the same
            // conjunct is evaluated above the scan), so the file is
            // dropped from the planned splits — the group-based DELETE
            // fallback skips reading files it would delete outright, and
            // any rewrite with a range condition skips provably-irrelevant
            // I/O. Pruning changes which bytes are read, never which rows
            // the query produces; with no stats or no translatable
            // condition the scan degrades to the full snapshot.
            // (Carrying pruned files into the new version BY NAME — true
            // file-granular grouping — is sound only on the metadata
            // DELETE fast path, where the predicate's polarity is known;
            // see deleteWhere. Here a pruned file may equally mean "fully
            // deleted", so the commit always uses exactly the query's
            // output.)
            override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
              val sb = readDelegate.newScanBuilder(options)
              new ScanBuilder
                  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {
                private var v1: Array[org.apache.spark.sql.sources.Filter] = Array.empty
                override def pushFilters(
                    filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
                    : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
                  v1 = filters.flatMap(ZoneMapScanBuilder.toV1).toArray
                  filters // nothing consumed: rows are never filtered here
                }
                override def pushedFilters
                    : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
                  Array.empty
                override def build(): org.apache.spark.sql.connector.read.Scan = {
                  val scan = sb.build()
                  val stats = StagingMaintenance.readStatsFor(tableFs, dir)
                  scan match {
                    case fscan: org.apache.spark.sql.execution.datasources.v2.FileScan
                        if stats.nonEmpty && v1.nonEmpty =>
                      new ZoneMapPrunedScan(fscan, stats, v1)
                    case other => other
                  }
                }
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
                      val before = GraftStagingCatalog.dataFiles(tableFs, dir).toSet
                      inner.commit(messages)
                      val fresh = GraftStagingCatalog.dataFiles(tableFs, dir).filterNot(before)
                      // whole-snapshot replacement: the new current set is
                      // exactly what the query emitted — valid ONLY if the
                      // table is still at the snapshot the rewrite scanned
                      GraftStagingCatalog.writeExplicitManifest(tableFs, dir, fresh,
                        kind = info.command().toString.toLowerCase,
                        expectedBase = Some(snapshotVersion))
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
      // recorded INSIDE the version manifest — one create-exclusive file
      // write — so "data committed" and "batch recorded" cannot tear
      // apart, and a crash-redelivered batch is detected and skipped (its
      // staged task files are aborted away). This is the catalog-sink
      // analogue of the SegmentedIndex's per-batchId segments.
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
              if (batchId.exists(GraftStagingCatalog.committedBatchIds(tableFs, dir).contains)) {
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
              val before = GraftStagingCatalog.dataFiles(tableFs, dir).toSet
              d.commit(messages)
              // only a SUCCESSFUL commit becomes a version
              GraftStagingCatalog.writeCommitManifest(tableFs, dir, before, batchId)
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
    if (isDir(d)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(d)
    GraftStagingCatalog.writeString(fs, new Path(d, SchemaSidecar), schema.json)
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
    if (d == null || !isDir(d)) throw new NoSuchTableException(ident)
    val sidecar = new Path(d, SchemaSidecar)
    var schema: StructType =
      if (GraftStagingCatalog.isFile(fs, sidecar))
        DataType.fromJson(GraftStagingCatalog.readString(fs, sidecar)).asInstanceOf[StructType]
      else SparkSession.active.read.parquet(d.toString).schema
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
    GraftStagingCatalog.writeString(fs, sidecar, schema.json)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    d != null && isDir(d) && fs.delete(d, true)
  }

  // ---- stored procedures (SQL CALL faces of StagingMaintenance) ----------

  private def procedureFor(name: String)
      : Option[org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure] =
    name.toLowerCase match {
      case "optimize" => Some(StagingProcedures.optimize(catalogName))
      case "analyze"  => Some(StagingProcedures.analyze(catalogName))
      case "vacuum"   => Some(StagingProcedures.vacuum(catalogName))
      case "history"  => Some(StagingProcedures.history(catalogName))
      case _          => None
    }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    // accept both CALL cat.proc(...) and CALL cat.system.proc(...)
    val nsOk = ident.namespace().isEmpty || ident.namespace().sameElements(Array("system"))
    (if (nsOk) procedureFor(ident.name()) else None).getOrElse(
      throw new RuntimeException(
        s"$catalogName: unknown procedure ${ident.namespace().mkString(".")}.${ident.name()} " +
          "(available: optimize, analyze, vacuum, history)"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array("analyze", "history", "optimize", "vacuum")
        .map(Identifier.of(namespace, _))
    else Array.empty

  /** DDL rename of a table DIRECTORY. This is a user-facing management
    * operation, not a commit primitive — nothing in the versioning protocol
    * depends on its atomicity (on the reference's store it is S3A
    * copy-then-delete, `CephRgwFileSystem.java:310-313`; commits here use
    * create-exclusive manifests instead).
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (from == null || !isDir(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (to == null) throw new NoSuchNamespaceException(newIdent.namespace())
    if (isDir(to)) throw new TableAlreadyExistsException(newIdent)
    requireNs(newIdent.namespace())
    if (!fs.rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
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

/** Manifest machinery shared by the catalog and [[StagingMaintenance]].
  * Every function addresses storage exclusively through the Hadoop
  * `FileSystem` handle passed in — the API surface the reference implements
  * over object storage — never `java.io.File`.
  */
object GraftStagingCatalog {
  private[catalog] val SchemaSidecar = "_graft_schema.json"
  private[catalog] val VersionsDir = "_graft_versions"
  private val VersionFile = "^v(\\d+)\\.json$".r

  private[catalog] def isFile(fs: FileSystem, p: Path): Boolean =
    try fs.getFileStatus(p).isFile catch { case _: FileNotFoundException => false }

  private[catalog] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, UTF_8)
    } finally in.close()
  }

  /** Plain (idempotent-overwrite) small-file write — sidecars only, never
    * manifests: a manifest must be create-exclusive ([[tryCreateExclusive]]).
    */
  private[catalog] def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  /** CREATE-EXCLUSIVE write: succeeds iff `p` did not exist — the commit
    * primitive that replaces rename-as-commit (SURVEY §7's object-store
    * hazard; the reference's own rename is copy-then-delete,
    * `CephRgwFileSystem.java:310-313`). Returns false when the create was
    * lost to a racer; any other I/O failure propagates.
    */
  private[catalog] def tryCreateExclusive(fs: FileSystem, p: Path, s: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(s.getBytes(UTF_8)) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: IOException if isFile(fs, p) => false // FS reported the race as a plain IOE
    }

  private[catalog] def declaredSchema(fs: FileSystem, d: Path): Option[StructType] = {
    val sidecar = new Path(d, SchemaSidecar)
    if (isFile(fs, sidecar))
      Some(DataType.fromJson(readString(fs, sidecar)).asInstanceOf[StructType])
    else None
  }

  private[catalog] def versionManifests(fs: FileSystem, d: Path): Seq[(Long, Path)] =
    (try fs.listStatus(new Path(d, VersionsDir)).toIndexedSeq
     catch { case _: FileNotFoundException => Seq.empty })
      .flatMap { f =>
        f.getPath.getName match {
          case VersionFile(v) => Some(v.toLong -> f.getPath)
          case _              => None
        }
      }.sortBy(_._1)

  private[catalog] def manifestFiles(fs: FileSystem, mf: Path): Seq[String] =
    parseManifestFiles(readString(fs, mf))

  private[catalog] def parseManifestFiles(txt: String): Seq[String] = {
    val body = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']'))
    if (body.trim.isEmpty) Seq.empty
    else "\"([^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  private[catalog] def commitMillis(fs: FileSystem, mf: Path): Long =
    "\"ts\":(\\d+)".r.findFirstMatchIn(readString(fs, mf)).map(_.group(1).toLong).getOrElse(0L)

  /** Data files of the table dir (excludes the schema sidecar, the versions
    * dir, and committer temporaries).
    */
  private[catalog] def dataFiles(fs: FileSystem, d: Path): Seq[String] =
    (try fs.listStatus(d).toIndexedSeq catch { case _: FileNotFoundException => Seq.empty })
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted

  private def manifestJson(files: Seq[String], batchId: Option[Long], kind: String): String = {
    val bid = batchId.map(b => s""""batchId":$b,""").getOrElse("")
    s"""{"ts":${System.currentTimeMillis()},"kind":"$kind",$bid"files":[${
      // distinct: under concurrent commits a racer's files can arrive both
      // via the previous-current set AND via this commit's directory delta
      // (its `before` snapshot predates the racer's move) — a double-listed
      // file would read its rows twice
      files.distinct.sorted.map(f => "\"" + f + "\"").mkString(",")}]}"""
  }

  /** Micro-batch ids recorded by prior commits (the exactly-once ledger). */
  private[catalog] def committedBatchIds(fs: FileSystem, d: Path): Set[Long] =
    versionManifests(fs, d).flatMap { case (_, f) =>
      "\"batchId\":(\\d+)".r.findFirstMatchIn(readString(fs, f)).map(_.group(1).toLong)
    }.toSet

  /** Commit hook for APPENDS: the new version = previous current set ∪
    * exactly the files this commit's job moved in (the before/after
    * directory delta). Pre-OPTIMIZE originals (on disk, not current) and
    * orphans from crashed commits are both in `before`, so neither can
    * enter the new version — the former stay time-travel-only, the latter
    * stay invisible until VACUUM reclaims them. Appends MERGE: losing the
    * create-exclusive race just re-reads the advanced current set and
    * retries as the next version — no append is ever lost and none
    * conflicts.
    */
  private[catalog] def writeCommitManifest(fs: FileSystem, d: Path, before: Set[String],
      batchId: Option[Long] = None): Unit =
    synchronized {
      val vd = new Path(d, VersionsDir)
      fs.mkdirs(vd)
      var committed = false
      while (!committed) {
        val latest = versionManifests(fs, d).lastOption
        val cur = latest.map { case (_, f) => manifestFiles(fs, f) }.getOrElse(Seq.empty)
        val next = latest.map(_._1).getOrElse(0L) + 1L
        committed = tryCreateExclusive(fs, new Path(vd, s"v$next.json"),
          manifestJson(cur ++ dataFiles(fs, d).filterNot(before), batchId, "commit"))
      }
    }

  /** Maintenance/rewrite commit (OPTIMIZE / DELETE / UPDATE / MERGE): the
    * new version is EXACTLY `files`, marked with a non-commit kind so
    * file-diff consumers (the change feed) know the file sets on either
    * side are not append-comparable. When `expectedBase` is set, the commit
    * is OPTIMISTIC: it succeeds only if the table is still at that version —
    * a racing commit in between means this rewrite computed its replacement
    * from a stale snapshot (its output would silently drop the racer's
    * rows), so it aborts with a conflict and the caller decides whether to
    * retry from the new current state.
    */
  private[catalog] def writeExplicitManifest(fs: FileSystem, d: Path, files: Seq[String],
      kind: String = "optimize", expectedBase: Option[Long] = None): Long =
    synchronized {
      val vd = new Path(d, VersionsDir)
      fs.mkdirs(vd)
      var out = -1L
      while (out < 0) {
        val latest = versionManifests(fs, d).lastOption.map(_._1).getOrElse(0L)
        expectedBase.foreach { base =>
          if (latest != base)
            throw new java.util.ConcurrentModificationException(
              s"$kind conflict on $d: rewrite computed against version $base " +
                s"but the table is now at version $latest — a concurrent commit " +
                "landed in between; re-run the statement against the current state")
        }
        if (tryCreateExclusive(fs, new Path(vd, s"v${latest + 1}.json"),
            manifestJson(files, None, kind)))
          out = latest + 1
        // lost the create race: loop re-reads the advanced version — with an
        // expectedBase that re-read throws the conflict above
      }
      out
    }

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
    * TRUNCATE face) and commit the rewrite as a new kind=delete version
    * against `baseVersion` (optimistic — a racing commit aborts it). SQL
    * DELETE semantics: a row is deleted only when the predicate is TRUE —
    * rows where it evaluates NULL (e.g. a post-ALTER column that old files
    * surface as NULL) MUST survive, so the survivor filter is
    * NOT(coalesce(pred, false)), never the raw negation (!NULL is NULL,
    * which would silently drop every NULL-predicate row).
    *
    * FILE-GRANULAR when zone maps exist: a file whose recorded [min,max]
    * proves the predicate can match NO row needs no rewrite — it carries
    * into the new version BY NAME, untouched. Only files the stats cannot
    * rule out are read, filtered, and rewritten. On a clustered 100 TB
    * table a ranged delete then rewrites its slice of files, not the
    * table — the Delta/Iceberg copy-on-write shape. Unanalyzed files are
    * conservatively rewritten (correct, just not minimal).
    */
  private[catalog] def deleteWhere(fs: FileSystem, d: Path,
      filters: Array[org.apache.spark.sql.sources.Filter], baseVersion: Long): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val spark = SparkSession.active
    val pred = filters.flatMap(filterToColumn(_)).reduceOption(_ && _).getOrElse(lit(true))
    val current = versionManifests(fs, d).lastOption
      .map { case (_, mf) => manifestFiles(fs, mf) }.getOrElse(dataFiles(fs, d))
    val stats = StagingMaintenance.readStatsFor(fs, d)
    // conjunction semantics: ANY filter proven unsatisfiable on a file's
    // range makes the whole predicate false there → the file is untouched
    val (touched, untouched) = current.partition(f =>
      filters.forall(fl => ZoneMapPrunedScan.canMatch(stats, f, fl)))
    val kept: Seq[String] =
      if (touched.isEmpty) untouched
      else {
        val reader = spark.read
        declaredSchema(fs, d).foreach(reader.schema)
        val remaining = reader
          .parquet(touched.map(f => new Path(d, f).toString): _*)
          .where(not(coalesce(pred, lit(false))))
        val token = java.util.UUID.randomUUID().toString.take(12)
        val tmp = new Path(d, s"_delete_$token")
        remaining.write.mode("overwrite").parquet(tmp.toString)
        val moved = fs.listStatus(tmp).toIndexedSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val target = new Path(d, s"del-$token-${f.getPath.getName}")
            if (!fs.rename(f.getPath, target))
              throw new IllegalStateException(s"delete: move ${f.getPath} -> $target failed")
            target.getName
          }
        fs.delete(tmp, true)
        untouched ++ moved
      }
    writeExplicitManifest(fs, d, kept, kind = "delete", expectedBase = Some(baseVersion))
  }

  private[catalog] def manifestKind(fs: FileSystem, mf: Path): String =
    "\"kind\":\"([a-z]+)\"".r.findFirstMatchIn(readString(fs, mf))
      .map(_.group(1)).getOrElse("commit")
}
