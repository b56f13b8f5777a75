package graft.sources.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING READS of a versioned staging table — `spark.readStream
  * .table("graft_stage.ns.t")` tails the table's commit log, the Delta/
  * Iceberg streaming-source shape: the OFFSET is the manifest VERSION (one
  * monotone long, JSON-checkpointed by Spark, so restart recovery needs no
  * source-side state), and each micro-batch reads exactly the files the
  * versions in `(start, end]` APPENDED. Version kinds gate semantics:
  *
  *   - `commit` (CTAS / INSERT INTO / streaming append): the batch reads
  *     the version's file DELTA (files(v) − files(v−1)) — rows exactly
  *     once, as of their commit.
  *   - `optimize` (compaction / clustering / partition layout): SKIPPED —
  *     the rows are identical by construction; re-emitting a compacted
  *     100 TB table into every downstream stream would be catastrophic
  *     (the dataChange=false rule every lakehouse streaming source has).
  *   - anything else (`delete`/`update`/`merge`/`overwrite`/`rename`/
  *     `restore`): rows CHANGED — the tail is no longer an append stream.
  *     The source THROWS with guidance, unless the read carries
  *     `.option("graft.ignore-changes", "true")`, in which case the
  *     version is skipped (downstream sees appends only — the documented
  *     Delta `ignoreChanges` trade).
  *
  * `graft.starting-version` (default 0) pins where the tail begins — 0
  * replays the whole retained history, the current head version makes the
  * stream "new data only". Deletion vectors never apply here: an append's
  * files carry no DV at their commit version, and every DV-minting version
  * is gated by the kind rule above.
  *
  * Scale shape: offsets are metadata-only (one manifest listing per
  * trigger); a batch plans ONLY its delta files through the same parquet
  * reader stack as batch scans (one data path, two execution modes — the
  * SeqSource rule). The reader factory comes from a per-batch ParquetTable
  * over exactly those files, column-pruned to the stream's read schema.
  */
private[catalog] class StagingMicroBatchStream(
    tableDirStr: String,
    readSchema: StructType,
    options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import GraftStagingCatalog.{manifestFiles, manifestKind, versionManifests}

  private val dir = new Path(tableDirStr)
  private def fs: FileSystem =
    dir.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private val ignoreChanges =
    options.get("graft.ignore-changes").exists(_.equalsIgnoreCase("true"))
  private val startingVersion =
    options.get("graft.starting-version").map(_.toLong).getOrElse(0L)

  private def headVersion: Long =
    versionManifests(fs, dir).lastOption.map(_._1).getOrElse(0L)

  // Trigger.AvailableNow: pin the head ONCE so the run drains a stable
  // target even while writers keep committing
  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(headVersion)

  override def initialOffset(): Offset = StagingVersionOffset(startingVersion)
  override def deserializeOffset(json: String): Offset =
    StagingVersionOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = StagingVersionOffset(headVersion)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    StagingVersionOffset(availableNowHead.getOrElse(headVersion))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control path")

  /** The most recent batch's delegate scan — the factory source. Each
    * micro-batch execution calls planInputPartitions THEN
    * createReaderFactory on its own exec node, and each streaming query
    * owns its stream instance, so the handoff is single-batch-scoped.
    */
  @volatile private var batchScan: Option[Scan] = None

  private def appendedFiles(fromV: Long, toV: Long): Seq[String] = {
    val manifests = versionManifests(fs, dir).toMap
    // every lookup is guarded: VACUUM may have reclaimed a version this
    // offset range needs — including the PREDECESSOR of a retained version
    // (tags can pin v with v−1 reclaimed), whose file set the append delta
    // is defined against. Fail with guidance, never NoSuchElement.
    def manifestOf(v: Long) = manifests.getOrElse(v,
      throw new IllegalStateException(
        s"streaming read of $tableDirStr: version $v was VACUUMed away before " +
          "the stream consumed it — raise the vacuum retention or restart " +
          "the stream from a newer graft.starting-version"))
    def filesOf(v: Long): Seq[String] =
      if (v <= 0L) Seq.empty else manifestFiles(fs, manifestOf(v))
    ((fromV + 1L) to toV).flatMap { v =>
      manifestKind(fs, manifestOf(v)) match {
        case "commit" =>
          val prev = filesOf(v - 1L).toSet
          filesOf(v).filterNot(prev)
        case "optimize" => Seq.empty // layout-only: identical rows
        case changed if ignoreChanges => Seq.empty
        case changed => throw new IllegalStateException(
          s"streaming read of $tableDirStr: version $v is a '$changed' commit — " +
            "the table is no longer append-only at this offset. Set " +
            ".option(\"graft.ignore-changes\", \"true\") to tail appends only, " +
            "or start past it with graft.starting-version")
      }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[StagingVersionOffset].version
    val e = end.asInstanceOf[StagingVersionOffset].version
    val paths = appendedFiles(s, e).map(f => new Path(dir, f).toString)
    val declared = GraftStagingCatalog.declaredSchema(fs, dir)
    val table = ParquetTable(s"$tableDirStr[stream ($s,$e]]", SparkSession.active,
      CaseInsensitiveStringMap.empty(), paths, declared, classOf[ParquetFileFormat])
    val sb = table.newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =>
        p.pruneColumns(readSchema)
      case _ => ()
    }
    val scan = sb.build()
    batchScan = Some(scan)
    if (paths.isEmpty) Array.empty
    else scan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    batchScan.getOrElse(throw new IllegalStateException(
      "createReaderFactory before planInputPartitions")).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[catalog] case class StagingVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}
