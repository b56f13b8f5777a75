package graft.sources.catalog

import java.io.FileNotFoundException
import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces,
  Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A read-only DataSource V2 `TableCatalog` over a directory of parquet
  * corpora: each scale-factor subdirectory is a namespace, each
  * `<table>.parquet` file inside it a table, so the whole corpus is
  * SQL-addressable with three-part names —
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft_cat.root", "/root/testdata")
  *   spark.sql("SELECT count(*) FROM graft_cat.`sf0.01`.lineitem")
  * }}}
  *
  * This is the catalog face of the reference's mount-a-bucket namespace
  * (`CephRgwFileSystem.initialize` binds `cephrgw://bucket/` to an RGW
  * bucket and exposes its pseudo-directories; `/root/reference/src/main/java/
  * org/apache/hadoop/fs/cephrgw/CephRgwFileSystem.java:110-135`): here the
  * root directory is the mount, subdirectories are namespaces, and files are
  * tables. All metadata I/O goes through the Hadoop `FileSystem` API
  * resolved from the root path's scheme — the exact contract the reference
  * implements — so the corpus catalog mounts `file://`, HDFS, or a
  * `cephrgw://`-style object store unchanged (same port its writable
  * sibling [[GraftStagingCatalog]] got a round earlier). `loadTable`
  * delegates to Spark's own `ParquetTable`, so catalog scans get the full
  * native read stack — vectorized reader, PushedFilters, ReadSchema
  * pruning — identical to path-based reads. DDL (create / alter / drop /
  * rename) is refused: the corpus is immutable input, matching the
  * reference's read-side contract.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: Path = _
  private var fs: FileSystem = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val raw = new Path(options.getOrDefault("root", "/root/testdata"))
    fs = raw.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    root = fs.makeQualified(raw)
  }

  override def name(): String = catalogName

  private def isDir(p: Path): Boolean =
    try fs.getFileStatus(p).isDirectory catch { case _: FileNotFoundException => false }

  private def list(p: Path): Seq[FileStatus] =
    try fs.listStatus(p).toIndexedSeq catch { case _: FileNotFoundException => Seq.empty }

  private def nsDir(namespace: Array[String]): Path = namespace match {
    case Array(ns) => new Path(root, ns)
    case _         => null
  }

  private def requireNs(namespace: Array[String]): Path = {
    val d = nsDir(namespace)
    if (d == null || !isDir(d)) throw new NoSuchNamespaceException(namespace)
    d
  }

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    list(root)
      .filter(d => d.isDirectory &&
        list(d.getPath).exists(_.getPath.getName.endsWith(".parquet")))
      .map(d => Array(d.getPath.getName)).sortBy(_.head).toArray

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

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")

  // ---- tables ------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = requireNs(namespace)
    list(d)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getPath.getName.stripSuffix(".parquet")))
      .sortBy(_.name).toArray
  }

  private def tablePath(ident: Identifier): Path = {
    val d = nsDir(ident.namespace())
    if (d == null) null else new Path(d, s"${ident.name()}.parquet")
  }

  private def exists(p: Path): Boolean =
    try { fs.getFileStatus(p); true } catch { case _: FileNotFoundException => false }

  override def tableExists(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    p != null && exists(p)
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (p == null || !exists(p)) throw new NoSuchTableException(ident)
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(p.toString),
      None,
      classOf[ParquetFileFormat])
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
}
