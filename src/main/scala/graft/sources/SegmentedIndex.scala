package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A replay-idempotent, self-compacting parquet index for streaming
  * pipelines whose state must live in STORAGE, not the state store (band
  * indexes, vector indexes — anything that outgrows executor memory on a
  * 100 TB/day ingest).
  *
  * Layout: `indexDir` holds SEGMENT directories — `batch_<id>` (one per
  * micro-batch, written with OVERWRITE to a path derived from the batch id,
  * so a crash-replayed batch rewrites its own segment instead of appending
  * a duplicate copy of its rows) plus at most one `compacted_<id>`. Once
  * the live batch-segment count reaches `compactEvery`, segments fold into
  * a fresh `compacted_<id>` (distinct() collapses any replay-duplicated
  * rows) and the inputs are deleted — a long-running stream holds
  * O(compactEvery) directories instead of one small parquet file set per
  * batch forever, the classic object-store small-file pile-up the
  * reference's deployment target suffers from
  * (`/root/reference/.../CephRgwFileSystem.java` exists precisely to put
  * Hadoop workloads on object storage). All filesystem access goes through
  * the Hadoop FS API resolved from the session conf, so the index can live
  * on any configured filesystem.
  */
object SegmentedIndex {

  /** Live segment paths under `indexDir` (batch_* and compacted_*). */
  private def segments(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("batch_") || p.getName.startsWith("compacted_"))

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  private def readSegs(spark: SparkSession, schemaDdl: String, segs: Seq[Path]): DataFrame =
    if (segs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), StructType.fromDDL(schemaDdl))
    else spark.read.schema(schemaDdl).parquet(segs.map(_.toString): _*)

  /** The whole index as one DataFrame. */
  def read(spark: SparkSession, indexDir: String, schemaDdl: String): DataFrame = {
    val (fs, root) = fsFor(spark, indexDir)
    readSegs(spark, schemaDdl, segments(fs, root))
  }

  /** The index EXCLUDING `batch_<batchId>` — what a probe for batch
    * `batchId` must see: on a replay, the batch's own previously-committed
    * segment would otherwise self-hit, and excluding the path keeps the
    * replay read set identical to the original run's.
    */
  def readExcluding(spark: SparkSession, indexDir: String, schemaDdl: String,
      batchId: Long): DataFrame = {
    val (fs, root) = fsFor(spark, indexDir)
    readSegs(spark, schemaDdl,
      segments(fs, root).filter(_.getName != s"batch_$batchId"))
  }

  /** Land one micro-batch's rows as the deterministic `batch_<batchId>`
    * segment (OVERWRITE — replay-idempotent), then compact if the live
    * batch-segment count reached `compactEvery`. `sortCol` clusters the
    * compacted files so the probe join's row-group skip has ordered keys
    * to work with at scale.
    */
  def writeBatch(rows: DataFrame, indexDir: String, batchId: Long,
      schemaDdl: String, compactEvery: Int = 4, compactPartitions: Int = 4,
      sortCol: String = ""): Unit = {
    val spark = rows.sparkSession
    val (fs, root) = fsFor(spark, indexDir)
    fs.mkdirs(root)
    // Replay of an ALREADY-COMPACTED batch: micro-batch ids are monotone, so
    // a batchId at or below the compaction high-water mark can only be a
    // crash redelivery of a batch whose (deterministic) rows were folded
    // into the compacted segment — re-creating its segment would duplicate
    // them. The idempotent action is no action.
    val folded = segments(fs, root).exists { p =>
      p.getName.startsWith("compacted_") &&
        p.getName.stripPrefix("compacted_").toLong >= batchId
    }
    if (folded) return
    rows.write.mode("overwrite").parquet(new Path(root, s"batch_$batchId").toString)
    if (segments(fs, root).count(_.getName.startsWith("batch_")) >= compactEvery)
      compact(spark, indexDir, batchId, schemaDdl, compactPartitions, sortCol)
  }

  /** Fold all live segments into one `compacted_<upTo>` segment and delete
    * the inputs. Crash-safe ordering: the new segment is fully written
    * before anything is deleted, and a half-written `compacted_<upTo>` from
    * a crashed prior attempt is excluded from the read set (its rows are
    * still covered by the not-yet-deleted inputs). distinct() collapses
    * rows duplicated by a replayed compaction.
    */
  private[graft] def compact(spark: SparkSession, indexDir: String, upTo: Long,
      schemaDdl: String, compactPartitions: Int, sortCol: String): Unit = {
    val (fs, root) = fsFor(spark, indexDir)
    val target = s"compacted_$upTo"
    val inputs = segments(fs, root).filter(_.getName != target)
    if (inputs.isEmpty) return
    val all = readSegs(spark, schemaDdl, inputs).distinct()
    val laid =
      if (sortCol.isEmpty) all.repartition(compactPartitions)
      else all.repartition(compactPartitions, col(sortCol)).sortWithinPartitions(sortCol)
    laid.write.mode("overwrite").parquet(new Path(root, target).toString)
    inputs.foreach(p => fs.delete(p, true))
  }
}
