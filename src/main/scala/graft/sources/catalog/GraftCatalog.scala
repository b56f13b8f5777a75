package graft.sources.catalog

import java.io.File
import java.util
import scala.jdk.CollectionConverters._

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
  * tables. `loadTable` delegates to Spark's own `ParquetTable`, so catalog
  * scans get the full native read stack — vectorized reader, PushedFilters,
  * ReadSchema pruning — identical to path-based reads. DDL (create / alter /
  * drop / rename) is refused: the corpus is immutable input, matching the
  * reference's read-side contract.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new File(options.getOrDefault("root", "/root/testdata"))
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

  override def listNamespaces(): Array[Array[String]] = {
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).exists(_.exists(_.getName.endsWith(".parquet"))))
    dirs.map(d => Array(d.getName)).sortBy(_.head)
  }

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

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(s"$catalogName is a read-only catalog")

  // ---- tables ------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = requireNs(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getName.stripSuffix(".parquet")))
      .sortBy(_.name)
  }

  private def tableFile(ident: Identifier): File =
    new File(nsDir(ident.namespace()), s"${ident.name()}.parquet")

  override def tableExists(ident: Identifier): Boolean = {
    val f = tableFile(ident)
    f != null && f.exists()
  }

  override def loadTable(ident: Identifier): Table = {
    val f = tableFile(ident)
    if (f == null || !f.exists()) throw new NoSuchTableException(ident)
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(f.getAbsolutePath),
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
