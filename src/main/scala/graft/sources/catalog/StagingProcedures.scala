package graft.sources.catalog

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter,
  UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` faces for the staging catalog's maintenance operations —
  * Spark 4's DSv2 stored-procedure surface (`ProcedureCatalog`). With these
  * the ENTIRE table-management lifecycle is SQL-driven, no Scala API in
  * sight:
  *
  * {{{
  *   CALL graft_stage.optimize('ws', 't', 4, 'k')   -- compact + CLUSTER BY
  *   CALL graft_stage.analyze('ws', 't', 'k,ts')    -- zone-map stats
  *   CALL graft_stage.vacuum('ws', 't', 2)          -- version retention
  *   CALL graft_stage.history('ws', 't')            -- DESCRIBE HISTORY
  * }}}
  *
  * Each procedure delegates to the [[StagingMaintenance]] implementation
  * (one code path, two faces) and returns its summary as a one-shot
  * `LocalScan` — the convention lakehouse procedure catalogs follow.
  */
private[catalog] object StagingProcedures {

  private final class RowsScan(out: StructType, rs: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = out
  }

  private def one(out: StructType, values: Any*): JIterator[Scan] =
    Collections.singletonList[Scan](
      new RowsScan(out, Array(new GenericInternalRow(values.toArray)))).iterator()

  private def spark: SparkSession = SparkSession.active

  /** Common shape: an UnboundProcedure that binds to itself (the argument
    * schema is fixed) and runs on the driver.
    */
  private abstract class MaintenanceProc(procName: String, desc: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // reads/mutates table state
  }

  def optimize(catalog: String): UnboundProcedure =
    new MaintenanceProc("optimize",
      "compact the current file set into target_files files as a new version; " +
        "cluster_by range-partitions + sorts on a column for zone-map locality") {
      private val out = StructType(Seq(
        StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false),
        StructField("version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("target_files", IntegerType).defaultValue("4").build(),
        ProcedureParameter.in("cluster_by", StringType)
          .defaultValue("CAST(NULL AS STRING)").build(),
        ProcedureParameter.in("partition_by", StringType)
          .defaultValue("CAST(NULL AS STRING)").build(),
        ProcedureParameter.in("scope", StringType).defaultValue("'all'").build(),
        // scope='small' binpack floor: files at/above it carry by name
        ProcedureParameter.in("min_size_bytes", LongType)
          .defaultValue("CAST(NULL AS BIGINT)").build(),
        // predicate-scoped maintenance: only files the filter can touch
        // (zone maps + partition paths) rewrite; the rest carry by name
        ProcedureParameter.in("where_filter", StringType)
          .defaultValue("CAST(NULL AS STRING)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val cluster = if (input.isNullAt(3)) None else Some(input.getUTF8String(3).toString)
        val part = if (input.isNullAt(4)) None else Some(input.getUTF8String(4).toString)
        val scope = input.getUTF8String(5).toString
        require(scope == "all" || scope == "stray" || scope == "small" ||
            scope == "dvs" || scope == "deltas",
          s"optimize scope must be 'all', 'stray', 'small', 'dvs', or " +
            s"'deltas', got '$scope'")
        val minSize = if (input.isNullAt(6)) None else Some(input.getLong(6))
        require((scope == "small") == minSize.isDefined,
          "scope='small' requires min_size_bytes (and min_size_bytes requires scope='small')")
        val where = if (input.isNullAt(7)) None else Some(input.getUTF8String(7).toString)
        val (b, a, v) =
          if (scope == "dvs") {
            // DV-only fold: counts are SIDECARS before/after, zero data
            // files move (r13)
            require(cluster.isEmpty && part.isEmpty && where.isEmpty,
              "scope='dvs' takes no cluster_by/partition_by/where_filter")
            StagingMaintenance.compactDvs(spark, catalog,
              input.getUTF8String(0).toString, input.getUTF8String(1).toString)
          } else if (scope == "deltas") {
            // scoped delta fold: counts are files REWRITTEN/DROPPED among
            // the delta-covered set; uncovered files carry by name (r14)
            require(cluster.isEmpty && part.isEmpty && where.isEmpty,
              "scope='deltas' takes no cluster_by/partition_by/where_filter")
            StagingMaintenance.foldDeltas(spark, catalog,
              input.getUTF8String(0).toString, input.getUTF8String(1).toString)
          } else StagingMaintenance.optimize(spark, catalog,
            input.getUTF8String(0).toString, input.getUTF8String(1).toString,
            input.getInt(2), cluster, part, strayOnly = scope == "stray",
            minBytes = minSize, whereFilter = where)
        one(out, b, a, v)
      }
    }

  /** Partition-spec evolution: re-declare the layout transforms without
    * rewriting data — see [[StagingMaintenance.setPartitionSpec]].
    */
  def setPartitionSpec(catalog: String): UnboundProcedure =
    new MaintenanceProc("set_partition_spec",
      "retire the current partition spec and declare a new one; old-layout " +
        "files keep pruning through the retired spec, no data is rewritten") {
      private val out = StructType(Seq(
        StructField("spec", StringType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("spec", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val spec = input.getUTF8String(2).toString
        StagingMaintenance.setPartitionSpec(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, spec)
        one(out, org.apache.spark.unsafe.types.UTF8String.fromString(spec))
      }
    }

  def analyze(catalog: String): UnboundProcedure =
    new MaintenanceProc("analyze",
      "harvest per-file zone-map (min/max) stats for the comma-separated columns " +
        "from parquet footers; incremental over already-covered files") {
      private val out = StructType(Seq(
        StructField("files_analyzed", IntegerType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("columns", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val cols = input.getUTF8String(2).toString.split(",").map(_.trim).filter(_.nonEmpty)
        val n = StagingMaintenance.analyze(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          cols.toIndexedSeq)
        one(out, n)
      }
    }

  def bloom(catalog: String): UnboundProcedure =
    new MaintenanceProc("bloom",
      "build per-file Bloom filters for the comma-separated columns — " +
        "point-lookup (equality/IN) file pruning where min/max ranges overlap; " +
        "incremental over already-covered files") {
      private val out = StructType(Seq(
        StructField("files_bloomed", IntegerType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("columns", StringType).build(),
        ProcedureParameter.in("expected_items", LongType).defaultValue("100000").build(),
        ProcedureParameter.in("fpp", DoubleType).defaultValue("0.001").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val cols = input.getUTF8String(2).toString.split(",").map(_.trim).filter(_.nonEmpty)
        val n = StagingMaintenance.analyzeBloom(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          cols.toIndexedSeq, input.getLong(3), input.getDouble(4))
        one(out, n)
      }
    }

  def vacuum(catalog: String): UnboundProcedure =
    new MaintenanceProc("vacuum",
      "keep the last retain_last versions plus everything committed within " +
        "retain_hours; delete unreferenced data files") {
      private val out = StructType(Seq(
        StructField("files_deleted", IntegerType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("retain_last", IntegerType).defaultValue("1").build(),
        ProcedureParameter.in("retain_hours", DoubleType)
          .defaultValue("CAST(NULL AS DOUBLE)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val window =
          if (input.isNullAt(3)) None
          else Some((input.getDouble(3) * 3600000.0).toLong)
        val dead = StagingMaintenance.vacuum(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          input.getInt(2), window)
        one(out, dead.size)
      }
    }

  def detail(catalog: String): UnboundProcedure =
    new MaintenanceProc("detail",
      "operational snapshot of a table: current version, file/byte counts, " +
        "partition columns, analyzed columns, retained version count") {
      private val out = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("n_bytes", LongType, nullable = false),
        StructField("partition_cols", StringType, nullable = false),
        StructField("analyzed_cols", StringType, nullable = false),
        StructField("n_versions", LongType, nullable = false),
        StructField("auto_analyze_failures", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val (v, files, bytes, parts, acols, nvers, aaFails) = StagingMaintenance.detail(
          spark, catalog, input.getUTF8String(0).toString, input.getUTF8String(1).toString)
        one(out, v, files, bytes, UTF8String.fromString(parts),
          UTF8String.fromString(acols), nvers, aaFails)
      }
    }

  /** Incremental clone refresh — see [[TableClone.sync]]. */
  def sync(catalog: String): UnboundProcedure =
    new MaintenanceProc("sync",
      "absorb the clone source's versions committed since the clone's " +
        "watermark by borrowing their newly-added files — zero-copy " +
        "incremental refresh; pass keys => 'k1[,k2…]' to follow source " +
        "REWRITES through the row-level change feed (keyed MERGE apply)") {
      private val out = StructType(Seq(
        StructField("from_version", LongType, nullable = false),
        StructField("to_version", LongType, nullable = false),
        StructField("absorbed", LongType, nullable = false),
        StructField("clone_version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("keys", StringType)
          .defaultValue("CAST(NULL AS STRING)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val keys =
          if (input.isNullAt(2)) Seq.empty[String]
          else input.getUTF8String(2).toString.split(',').toSeq
            .map(_.trim).filter(_.nonEmpty)
        val (f, t, n, v) = TableClone.sync(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, keys)
        one(out, f, t, n, v)
      }
    }

  /** Compliance purge across all readable history — see [[StagingPurge]]. */
  def purge(catalog: String): UnboundProcedure =
    new MaintenanceProc("purge",
      "physically remove every row matching the predicate from EVERY " +
        "readable version (main, branches, tags, time travel) while keeping " +
        "the version history itself — the right-to-be-forgotten operation " +
        "DELETE (new-version-only) cannot be") {
      private val out = StructType(Seq(
        StructField("files_rewritten", IntegerType, nullable = false),
        StructField("files_dropped", IntegerType, nullable = false),
        StructField("rows_purged", LongType, nullable = false),
        StructField("versions_touched", IntegerType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("where_filter", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val (rw, dr, rows, vers) = StagingPurge.purge(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          input.getUTF8String(2).toString)
        one(out, rw, dr, rows, vers)
      }
    }

  /** Zero-copy shallow clone — see [[TableClone]]. */
  def cloneTable(catalog: String): UnboundProcedure =
    new MaintenanceProc("clone",
      "zero-copy shallow clone: a new table whose first version references " +
        "the source snapshot's files in place; vacuum-safe both ways " +
        "(clone registers on the source, source vacuum exempts borrowed files)") {
      private val out = StructType(Seq(
        StructField("source_version", LongType, nullable = false),
        StructField("files", IntegerType, nullable = false),
        StructField("clone_version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("target_tbl", StringType).build(),
        ProcedureParameter.in("target_ns", StringType)
          .defaultValue("CAST(NULL AS STRING)").build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("CAST(NULL AS BIGINT)").build(),
        ProcedureParameter.in("tag", StringType)
          .defaultValue("CAST(NULL AS STRING)").build(),
        ProcedureParameter.in("branch", StringType)
          .defaultValue("CAST(NULL AS STRING)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val ns = input.getUTF8String(0).toString
        val (srcV, n, v) = TableClone.clone(spark, catalog, ns,
          input.getUTF8String(1).toString,
          if (input.isNullAt(3)) ns else input.getUTF8String(3).toString,
          input.getUTF8String(2).toString,
          if (input.isNullAt(4)) None else Some(input.getLong(4)),
          if (input.isNullAt(5)) None else Some(input.getUTF8String(5).toString),
          if (input.isNullAt(6)) None else Some(input.getUTF8String(6).toString))
        one(out, srcV, n, v)
      }
    }

  def restore(catalog: String): UnboundProcedure =
    new MaintenanceProc("restore",
      "metadata-only rollback: commit a new version referencing exactly the " +
        "file set of an earlier version (fails if VACUUM reclaimed its files)") {
      private val out = StructType(Seq(
        StructField("restored_to", LongType, nullable = false),
        StructField("new_version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("to_version", LongType)
          .defaultValue("CAST(NULL AS BIGINT)").build(),
        // tags resolve everywhere a version does (VERSION AS OF, stream
        // origins) — restore included: `CALL restore(ns, t, to_tag => 'r1')`
        ProcedureParameter.in("to_tag", StringType)
          .defaultValue("CAST(NULL AS STRING)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val ns = input.getUTF8String(0).toString
        val tbl = input.getUTF8String(1).toString
        require(input.isNullAt(2) != input.isNullAt(3),
          "restore takes exactly one of to_version / to_tag")
        val to =
          if (!input.isNullAt(2)) input.getLong(2)
          else StagingMaintenance.resolveTag(spark, catalog, ns, tbl,
            input.getUTF8String(3).toString)
        val v = StagingMaintenance.restore(spark, catalog, ns, tbl, to)
        one(out, to, v)
      }
    }

  def tag(catalog: String): UnboundProcedure =
    new MaintenanceProc("tag",
      "pin a version by name: VERSION AS OF '<name>' resolves it and VACUUM " +
        "keeps its files until drop_tag; version defaults to the current head") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("CAST(NULL AS BIGINT)").build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        val v = StagingMaintenance.tag(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          name, if (input.isNullAt(3)) None else Some(input.getLong(3)))
        one(out, UTF8String.fromString(name), v)
      }
    }

  def dropTag(catalog: String): UnboundProcedure =
    new MaintenanceProc("drop_tag",
      "drop a version tag; the pinned version re-enters normal VACUUM retention") {
      private val out = StructType(Seq(
        StructField("dropped", StringType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        StagingMaintenance.dropTag(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, name)
        one(out, UTF8String.fromString(name))
      }
    }

  def tags(catalog: String): UnboundProcedure =
    new MaintenanceProc("tags",
      "one row per tag: (name, version)") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val rs = StagingMaintenance.tags(spark, catalog,
            input.getUTF8String(0).toString, input.getUTF8String(1).toString)
          .toSeq.sortBy(_._1).map { case (n, v) =>
            new GenericInternalRow(Array[Any](UTF8String.fromString(n), v)): InternalRow
          }.toArray
        Collections.singletonList[Scan](new RowsScan(out, rs)).iterator()
      }
    }

  def branch(catalog: String): UnboundProcedure =
    new MaintenanceProc("branch",
      "fork a writable branch at the current head (write-audit-publish): " +
        "appends target cat.ns.t.branch_<name>; main is untouched until publish") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("fork_version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        val fork = StagingMaintenance.branch(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, name)
        one(out, UTF8String.fromString(name), fork)
      }
    }

  def publish(catalog: String): UnboundProcedure =
    new MaintenanceProc("publish",
      "fast-forward main onto a branch's commits (conflict if main advanced " +
        "past the fork); the branch is consumed") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("new_head", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        val head = StagingMaintenance.publish(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, name)
        one(out, UTF8String.fromString(name), head)
      }
    }

  def rebase(catalog: String): UnboundProcedure =
    new MaintenanceProc("rebase",
      "replay a stranded branch's commit deltas onto the advanced main head " +
        "(file-granular serializability check); publish then fast-forwards") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("new_fork", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        val fork = StagingMaintenance.rebase(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, name)
        one(out, UTF8String.fromString(name), fork)
      }
    }

  def dropBranch(catalog: String): UnboundProcedure =
    new MaintenanceProc("drop_branch",
      "discard a branch (failed audit / abandoned experiment): its commits' " +
        "files become VACUUM-reclaimable orphans; main never saw them") {
      private val out = StructType(Seq(
        StructField("dropped", StringType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(2).toString
        StagingMaintenance.dropBranch(spark, catalog,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString, name)
        one(out, UTF8String.fromString(name))
      }
    }

  def groupCreate(catalog: String): UnboundProcedure =
    new MaintenanceProc("group_create",
      "bind tables into a cross-table commit group: readers resolve every " +
        "member at the group's latest published vector — never a torn mix") {
      private val out = StructType(Seq(
        StructField("group", StringType, nullable = false),
        StructField("members", StringType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("tbls", StringType).build()) // comma-separated
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(1).toString
        val tbls = input.getUTF8String(2).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        CommitGroups.create(spark, catalog,
          input.getUTF8String(0).toString, name, tbls)
        one(out, UTF8String.fromString(name),
          UTF8String.fromString(tbls.mkString(",")))
      }
    }

  def groupPublish(catalog: String): UnboundProcedure =
    new MaintenanceProc("group_publish",
      "atomically publish every member's current head as the group's next " +
        "vector (phase 2 — the only point the new versions become readable)") {
      private val out = StructType(Seq(
        StructField("group", StringType, nullable = false),
        StructField("sequence", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val name = input.getUTF8String(1).toString
        val seq = CommitGroups.publish(spark, catalog,
          input.getUTF8String(0).toString, name)
        one(out, UTF8String.fromString(name), seq)
      }
    }

  def branches(catalog: String): UnboundProcedure =
    new MaintenanceProc("branches",
      "one row per live branch: (name, fork_version, head_version)") {
      private val out = StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("fork_version", LongType, nullable = false),
        StructField("head_version", LongType, nullable = false)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val rs = StagingMaintenance.branches(spark, catalog,
            input.getUTF8String(0).toString, input.getUTF8String(1).toString)
          .toSeq.sortBy(_._1).map { case (n, (f, h)) =>
            new GenericInternalRow(Array[Any](UTF8String.fromString(n), f, h)): InternalRow
          }.toArray
        Collections.singletonList[Scan](new RowsScan(out, rs)).iterator()
      }
    }

  def history(catalog: String): UnboundProcedure =
    new MaintenanceProc("history",
      "one row per retained version manifest: (version, kind, n_files, batch_id)") {
      private val out = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("batch_id", LongType, nullable = true)))
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("ns", StringType).build(),
        ProcedureParameter.in("tbl", StringType).build())
      override def call(input: InternalRow): JIterator[Scan] = {
        val rows = StagingMaintenance.history(spark, catalog,
            input.getUTF8String(0).toString, input.getUTF8String(1).toString)
          .collect() // bounded by retained version count
          .map { r =>
            new GenericInternalRow(Array[Any](
              r.getLong(0), UTF8String.fromString(r.getString(1)), r.getLong(2),
              if (r.isNullAt(3)) null else r.getLong(3))): InternalRow
          }
        Collections.singletonList[Scan](new RowsScan(out, rows)).iterator()
      }
    }
}
