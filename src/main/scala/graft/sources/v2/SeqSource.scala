package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns,
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation,
  Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning,
  SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch connector: a deterministic synthetic sequence table.
  *
  * The reference project is itself a storage connector (a Hadoop FileSystem
  * over RGW); this is the same role expressed through Spark's MODERN source
  * API instead of the FileSystem SPI: `TableProvider` → `Table` →
  * `ScanBuilder` → `Batch` with explicit split planning
  * (`planInputPartitions` — the analogue of the reference's virtual-block
  * `getSplits` sizing) and column pruning pushed into the reader
  * (`SupportsPushDownRequiredColumns` — only requested columns are ever
  * materialized, the DSv2 equivalent of ReadSchema pruning).
  *
  * Schema: id BIGINT, bucket INT (= id mod 32), v BIGINT (splitmix64(id),
  * the corpus-standard deterministic hash family — VectorExprs uses the
  * same finalizer). Options: rows (default 1000), parts (default 4).
  * Usage: `spark.read.format("graft.sources.v2.SeqSource").option("rows", n)`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SeqTable(opts.getLong("rows", 1000L), opts.getInt("parts", 4),
      opts.getOrDefault("layout", "range") == "bucket",
      opts.getLong("rowsPerBatch", 100L))
  }
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Test hooks: runtime-filter invocations and the last planned id range. */
  val runtimeFilterEvents = new java.util.concurrent.atomic.AtomicLong(0)
  val lastPlannedRange =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long)]((0L, 0L))
  /** Highest stream offset Spark has committed (streaming face test hook). */
  val lastCommittedStreamOffset = new java.util.concurrent.atomic.AtomicLong(0)

  /** splitmix64 finalizer — deterministic, engine-independent. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

class SeqTable(rows: Long, parts: Int, bucketLayout: Boolean = false,
    rowsPerBatch: Long = 100L)
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft_seq(rows=$rows, parts=$parts)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts, bucketLayout, rowsPerBatch)

  /** Split-provenance metadata columns (`_split_start`/`_split_end`): hidden
    * from `SELECT *` but selectable by name, the DSv2 twin of
    * `_metadata.file_path` on file sources — the lineage surface a 100 TB
    * debugging session uses to trace a bad row back to its input split.
    * They materialize in the reader from the split bounds, so they cost
    * nothing unless asked for (and column pruning drops them like any
    * other column).
    */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_split_start"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
    },
    new MetadataColumn {
      override def name(): String = "_split_end"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
    })
}

class SeqScanBuilder(rows: Long, parts: Int, bucketLayout: Boolean = false,
    rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {
  private var required: StructType = SeqSource.schema
  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]
  private var pushedAgg: Option[Aggregation] = None
  private var topNPartial = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Range predicates on id CLIP THE PLANNED SPLITS — partitions whose id
    * range falls outside [lo, hi) are never created, the DSv2 analogue of
    * the reference skipping whole virtual blocks. Handled filters are fully
    * satisfied by the clip, so they are consumed (not re-evaluated by a
    * Spark-side Filter node); anything else is returned as a residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    val residual = filters.filter {
      case GreaterThan("id", v)        if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get + 1); accepted :+= GreaterThan("id", v); false
      case GreaterThanOrEqual("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); accepted :+= GreaterThanOrEqual("id", v); false
      case LessThan("id", v)           if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); accepted :+= LessThan("id", v); false
      case LessThanOrEqual("id", v)    if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get + 1); accepted :+= LessThanOrEqual("id", v); false
      case EqualTo("id", v)            if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1)
        accepted :+= EqualTo("id", v); false
      case _ => true
    }
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** COMPLETE aggregate pushdown: the sequence content is a closed-form
    * function of the id range, so count/min/max/sum(id) — globally or grouped
    * by bucket — never need to materialize a single row. The scan answers
    * them arithmetically over the (filter-clipped) [lo, hi) span, the DSv2
    * analogue of a storage engine answering count(*) from its manifest
    * instead of scanning (and the strongest form of the reference's
    * metadata-from-stat shortcut, `getFileStatus` answering length queries
    * without reads). Anything else (min/max over the hashed v column, avg,
    * distinct) is refused and Spark plans its own aggregate.
    */
  private def col(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _                                               => None
    }

  private def supported(agg: Aggregation): Boolean = {
    // A bucket-layout table REFUSES aggregate pushdown: Spark's
    // V2ScanPartitioningAndOrdering resolves a scan's reported partitioning
    // against the relation's original attributes, and aggregate pushdown
    // mints fresh ones — so a pushed aggregate can never keep
    // KeyGroupedPartitioning. Keeping the row scan preserves the
    // storage-partitioned contract and the aggregate still runs
    // shuffle-free (partial+final in one stage over the keyed splits),
    // which at scale is the better trade than a pushed agg followed by a
    // full shuffle of every downstream consumer.
    if (bucketLayout) return false
    val groupOk = agg.groupByExpressions.isEmpty ||
      (agg.groupByExpressions.length == 1 &&
        agg.groupByExpressions.flatMap(col).sameElements(Array("bucket")))
    val funcsOk = agg.aggregateExpressions.forall {
      case _: CountStar                                        => true
      case c: Count if !c.isDistinct && col(c.column).isDefined => true
      case m: Min   if col(m.column).contains("id")             => true
      case m: Max   if col(m.column).contains("id")             => true
      case s: Sum   if !s.isDistinct && col(s.column).contains("id") => true
      case _                                                   => false
    }
    groupOk && funcsOk && agg.aggregateExpressions.nonEmpty
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supported(agg)) return false
    pushedAgg = Some(agg)
    true
  }

  /** LIMIT n pushdown: for an unordered LIMIT any n rows are a correct
    * answer, so the scan clips its span to the FIRST n ids of the
    * (filter-clipped) range and never plans the rest — the DSv2 analogue of
    * a storage engine stopping after n rows instead of scanning the file
    * and discarding. The clip emits exactly min(n, total) rows, so the
    * pushdown is complete (isPartiallyPushed=false) and Spark drops its own
    * Limit node.
    */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isDefined) return false
    hi = math.min(hi, math.max(lo, 0L) + limit)
    true
  }

  /** ORDER BY id LIMIT n pushdown: ids are generated ascending, so the
    * top-n by id is a RANGE — the first n ids (ASC) or last n (DESC) of the
    * clipped span. Splits outside that range are never planned. Partitions
    * are read in parallel with no global order, so this is a PARTIAL push:
    * Spark keeps its TakeOrderedAndProject, but over n rows instead of the
    * whole table.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (pushedAgg.isDefined || orders.length != 1) return false
    val onId = orders.head.expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _                  => false
    }
    if (!onId) return false
    val clo = math.max(lo, 0L)
    val chi = math.min(hi, rows)
    if (orders.head.direction() == SortDirection.ASCENDING) hi = math.min(chi, clo + limit)
    else lo = math.max(clo, chi - limit)
    topNPartial = true
    true
  }

  override def isPartiallyPushed(): Boolean = topNPartial

  override def build(): Scan = {
    val (clo, chi) = (math.max(lo, 0L), math.min(hi, rows))
    pushedAgg match {
      case Some(agg)              => new SeqAggScan(clo, chi, agg)
      case None if bucketLayout   => new SeqBucketScan(clo, chi, required)
      case None                   => new SeqScan(clo, chi, parts, required, rowsPerBatch)
    }
  }
}

/** Closed-form aggregate answers over the clipped id range — one tiny
  * partition, zero row materialization. Output columns are positional per the
  * DSv2 contract: group-by columns first, then one per aggregate function.
  */
class SeqAggScan(lo: Long, hi: Long, agg: Aggregation) extends Scan with Batch {
  private val grouped = agg.groupByExpressions.nonEmpty

  override def readSchema(): StructType = {
    val groupFields = if (grouped) Seq(StructField("bucket", IntegerType, nullable = false)) else Nil
    val aggFields = agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i)     => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
    }
    StructType(groupFields ++ aggFields)
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) PushedAggregates=[${agg.aggregateExpressions.mkString(", ")}]" +
      (if (grouped) " GroupBy=[bucket]" else "")

  /** Arithmetic-series stats for ids ≡ b (mod 32) in [lo, hi); BigInt guards
    * the n·(first+last)/2 sum against intermediate overflow.
    */
  private def series(first: Long, last: Long, step: Long): (Long, Long, Long, Long) = {
    val n = (last - first) / step + 1
    val sum = ((BigInt(first) + BigInt(last)) * n / 2).toLong
    (n, first, last, sum)
  }

  private def stats: Seq[(Option[Int], (Long, Long, Long, Long))] =
    if (!grouped) {
      val s = if (hi <= lo) (0L, 0L, 0L, 0L) else series(lo, hi - 1, 1)
      Seq((None, s))
    } else {
      (0 until 32).flatMap { b =>
        val first = lo + java.lang.Math.floorMod(b.toLong - lo, 32L)
        if (first >= hi) None
        else {
          val last = first + ((hi - 1 - first) / 32) * 32
          Some((Some(b), series(first, last, 32)))
        }
      }
    }

  private def toRow(bucket: Option[Int], s: (Long, Long, Long, Long)): Array[Any] = {
    val (n, mn, mx, sum) = s
    val aggVals: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => java.lang.Long.valueOf(n)
      case _: Count     => java.lang.Long.valueOf(n)
      case _: Min       => if (n == 0) null else java.lang.Long.valueOf(mn)
      case _: Max       => if (n == 0) null else java.lang.Long.valueOf(mx)
      case _: Sum       => if (n == 0) null else java.lang.Long.valueOf(sum)
      case f: AggregateFunc => throw new IllegalStateException(s"unsupported pushed agg $f")
    }
    bucket.map(b => java.lang.Integer.valueOf(b): Any).toArray ++ aggVals
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqAggPartition(stats.map { case (b, s) => toRow(b, s) }.toArray))

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val rs = partition.asInstanceOf[SeqAggPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rs.length }
        override def get(): InternalRow = new GenericInternalRow(rs(i))
        override def close(): Unit = ()
      }
    }
  }
}

case class SeqAggPartition(rows: Array[Array[Any]]) extends InputPartition

class SeqScan(lo: Long, hi: Long, parts: Int, required: StructType,
    rowsPerBatch: Long = 100L)
    extends Scan with Batch with SupportsRuntimeFiltering with SupportsReportStatistics {
  // Runtime (DPP-style) narrowing on top of the planning-time clip: when
  // this scan probes a join whose build side produced a small key set,
  // Spark hands the keys back through filter() and the splits are
  // re-planned over the narrowed range — whole virtual blocks skipped at
  // RUNTIME, the V2 twin of the parquet dynamicpruning PartitionFilter
  // (and the strongest version of the reference's getSplits clipping).
  @volatile private var rLo = lo
  @volatile private var rHi = hi

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) if vs.nonEmpty =>
      val longs = vs.collect { case l: Long => l; case i: Int => i.toLong }
      if (longs.length == vs.length) {
        rLo = math.max(rLo, longs.min)
        rHi = math.min(rHi, longs.max + 1)
        SeqSource.runtimeFilterEvents.incrementAndGet()
      }
    case EqualTo("id", v: Long) =>
      rLo = math.max(rLo, v); rHi = math.min(rHi, v + 1)
      SeqSource.runtimeFilterEvents.incrementAndGet()
    case _ => () // unsupported runtime filter: correctness-neutral to ignore
  }

  /** Planner-visible size estimates from the clipped span: a scan narrowed
    * to a few thousand ids reports a few KB, so Catalyst's JoinSelection
    * picks broadcast-hash on its own — no hint needed. Without this a V2
    * relation falls back to `spark.sql.defaultSizeInBytes` (effectively
    * infinite) and every join against the source degrades to sort-merge.
    * The FileSystem analogue is `getFileStatus().getLen` feeding the
    * engine's split/ join planning.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, rHi - rLo)
    private val width = math.max(1, required.fields.map(_.dataType.defaultSize).sum)
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(n * width)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_seq range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] = {
    // even ranges over the CLIPPED span, remainder spread over the first
    // partitions — the split planning the FileSystem reference does with
    // its virtual block size
    val total = math.max(0L, rHi - rLo)
    val base = total / parts
    val extra = total % parts
    var start = rLo
    val planned = (0 until parts).flatMap { i =>
      val len = base + (if (i < extra) 1 else 0)
      val p = if (len > 0) Some(SeqPartition(start, start + len)) else None
      start += len
      p
    }.toArray[InputPartition]
    SeqSource.lastPlannedRange.set((rLo, rHi))
    planned
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, parts, required, rowsPerBatch)
}

/** The STREAMING face of the connector (`TableCapability.MICRO_BATCH_READ`):
  * the same deterministic sequence served as a rate-limited micro-batch
  * stream. The offset is the high-water row index — one monotone long,
  * JSON-serialized into Spark's checkpoint. Admission control is the
  * STATELESS modern protocol (`SupportsAdmissionControl`, the shape Spark's
  * own rate source uses): `latestOffset(start, limit)` is a pure function
  * of the checkpointed start — `min(start + rowsPerBatch, rows)` — so
  * restart recovery needs no source-side state at all, and
  * `reportLatestOffset` tells the engine how much lag remains. Batches
  * ((start, end]) are planned as the SAME even range splits the batch scan
  * uses and read by the SAME reader factory — one data path, two execution
  * modes, exactly the relationship the reference's FileSystem has with
  * whatever engine drives it. `commit` just records a test-visible
  * high-water mark.
  */
class SeqMicroBatchStream(lo: Long, hi: Long, parts: Int, required: StructType,
    perBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = SeqOffset(lo)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perBatch)
  override def reportLatestOffset(): Offset = SeqOffset(hi)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
      ReadAllAvailable, ReadMaxRows}
    val s = start.asInstanceOf[SeqOffset].index
    // ReadAllAvailable (Trigger.Once / AvailableNow) must consume the WHOLE
    // remaining range, not one rowsPerBatch slice — treating it as a default
    // step would make an all-available trigger silently process a fraction
    // of the source. Composite limits take their tightest max-rows bound.
    limit match {
      case _: ReadAllAvailable => SeqOffset(hi)
      case m: ReadMaxRows => SeqOffset(math.min(s + math.max(1L, m.maxRows()), hi))
      case c: CompositeReadLimit =>
        val maxRows = c.getReadLimits.collect { case m: ReadMaxRows => m.maxRows() }
        if (maxRows.isEmpty) SeqOffset(hi)
        else SeqOffset(math.min(s + math.max(1L, maxRows.min), hi))
      case _ => SeqOffset(math.min(s + math.max(1L, perBatch), hi))
    }
  }
  // AvailableNow support: the range end is fixed at construction, so the
  // "prepare" step has nothing to snapshot — latestOffset already converges
  // on `hi` for all-available limits.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control path")
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].index
    val e = end.asInstanceOf[SeqOffset].index
    val total = math.max(0L, e - s)
    val base = total / parts
    val extra = total % parts
    var cur = s
    (0 until parts).flatMap { i =>
      val len = base + (if (i < extra) 1 else 0)
      val p = if (len > 0) Some(SeqPartition(cur, cur + len)) else None
      cur += len
      p
    }.toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
  override def commit(end: Offset): Unit =
    SeqSource.lastCommittedStreamOffset.set(end.asInstanceOf[SeqOffset].index)
  override def stop(): Unit = ()
}

case class SeqOffset(index: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = index.toString
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

/** Bucket-grouped physical layout (`option("layout", "bucket")`): one split
  * per `bucket` value (ids ≡ b mod 32), each split carrying its partition
  * key (`HasPartitionKey`), with the layout reported to Catalyst as
  * `KeyGroupedPartitioning(identity(bucket))` — the Iceberg-style
  * storage-partitioned-join surface. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, joins and aggregations
  * keyed on `bucket` are planned WITHOUT any Exchange: the engine trusts
  * the source's physical clustering instead of re-shuffling it, the Spark
  * analogue of co-located bucket joins over pre-partitioned storage (and
  * the strongest use of the reference's block-placement metadata — locality
  * the planner exploits, not just locality the scheduler prefers).
  */
class SeqBucketScan(lo: Long, hi: Long, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_seq range=[$lo,$hi) layout=bucket"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), 32)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val width = math.max(1, required.fields.map(_.dataType.defaultSize).sum)
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(n * width)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] =
    (0 until 32).map(b => SeqBucketPartition(b, lo, hi): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqBucketReaderFactory(required.fieldNames)
}

case class SeqBucketPartition(bucket: Int, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

class SeqBucketReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqBucketPartition]
    // first id ≥ lo with id ≡ bucket (mod 32), then stride 32
    val first = p.lo + java.lang.Math.floorMod(p.bucket.toLong - p.lo, 32L)
    new PartitionReader[InternalRow] {
      private var cur = first - 32
      override def next(): Boolean = { cur += 32; cur < p.hi }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id"           => java.lang.Long.valueOf(cur)
          case "bucket"       => java.lang.Integer.valueOf(p.bucket)
          case "v"            => java.lang.Long.valueOf(SeqSource.mix(cur))
          case "_split_start" => java.lang.Long.valueOf(first)
          case "_split_end"   => java.lang.Long.valueOf(p.hi)
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}

class SeqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id"           => java.lang.Long.valueOf(cur)
          case "bucket"       => java.lang.Integer.valueOf((cur % 32).toInt)
          case "v"            => java.lang.Long.valueOf(SeqSource.mix(cur))
          case "_split_start" => java.lang.Long.valueOf(p.start)
          case "_split_end"   => java.lang.Long.valueOf(p.end)
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
