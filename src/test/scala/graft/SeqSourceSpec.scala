package graft

import graft.sources.v2.SeqSource
import org.apache.spark.sql.functions._

/** The DataSource V2 connector: split planning, column pruning reaching the
  * scan, deterministic content, and remainder distribution.
  */
class SeqSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read.format(classOf[SeqSource].getName)
      .option("rows", rows.toString).option("parts", parts.toString).load()

  private def withSQLConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("micro-batch streaming face: rate-limited batches, exactly-once, checkpoint resume") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seqstream_ckpt").toString
    // foreachBatch sink: checkpoint-recoverable (the memory sink is not),
    // idempotent per (phase, batchId) — replays overwrite, never duplicate
    val sunk = new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[(Long, Long)]]()
    def start(rows: Long, phase: Int) = spark.readStream
      .format("graft.sources.v2.SeqSource")
      .option("rows", rows).option("parts", 3).option("rowsPerBatch", 100)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sunk.put((phase, id),
          batch.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    def rowsOf(phase: Int): Array[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      sunk.asScala.collect { case ((p, _), rs) if p == phase => rs }.flatten.toArray
    }
    def await(phase: Int, n: Long, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      q.processAllAvailable()
      while (rowsOf(phase).length < n && System.nanoTime() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
    }
    // phase 1: 250 rows arrive across ≥3 rate-limited batches
    val q1 = start(250, 1)
    try await(1, 250, q1) finally q1.stop()
    val got1 = rowsOf(1)
    assert(got1.length === 250, s"${got1.length}")
    assert(got1.map(_._1).toSet === (0L until 250L).toSet, "ids incomplete or duplicated")
    assert(got1.forall { case (id, v) => v == SeqSource.mix(id) }, "content drifted")
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 3, "rate limit not applied")
    // the offset log committed through the end (the final commit() callback
    // can lag one trigger — what matters is the sink has all rows and the
    // committed high-water mark reached at least the penultimate batch)
    assert(SeqSource.lastCommittedStreamOffset.get() >= 200L)
    // phase 2: RESTART from the same checkpoint with more rows available —
    // the source must resume at the committed offset (no re-emission of
    // anything already in the sink) and deliver exactly the new tail
    val q2 = start(400, 2)
    try await(2, 150, q2) finally q2.stop()
    val got2 = rowsOf(2).map(_._1)
    // resume point: the committed offset — or one batch earlier if the last
    // commit() callback lagged the shutdown (Spark re-runs the one
    // uncommitted batch; anything more means the offset log was ignored)
    assert(got2.nonEmpty && got2.min >= 200L && got2.min <= 250L,
      s"restart must resume at the checkpoint, not the beginning: min=${got2.min}")
    assert(got2.toSet === (got2.min until 400L).toSet,
      s"resume must deliver the contiguous new tail exactly once: " +
        s"${got2.length} rows from ${got2.min}")
  }

  test("Trigger.AvailableNow drains the whole remaining range, not one rowsPerBatch slice") {
    // Regression: latestOffset used to treat ReadAllAvailable (Trigger.Once
    // / AvailableNow's catch-up limit) as a single rowsPerBatch step, so an
    // all-available trigger silently processed one slice and stopped.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seqan_ckpt").toString
    val sunk = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
    val q = spark.readStream
      .format("graft.sources.v2.SeqSource")
      .option("rows", 350).option("parts", 3).option("rowsPerBatch", 100)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sunk.put(id, batch.select("id").collect().map(_.getLong(0)))
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    import scala.jdk.CollectionConverters._
    val ids = sunk.asScala.values.flatten.toSeq
    assert(ids.length === 350 && ids.toSet === (0L until 350L).toSet,
      s"AvailableNow must drain all 350 rows exactly once, got ${ids.length}")
  }

  test("planInputPartitions controls scan parallelism; ranges cover exactly [0, rows)") {
    val df = read(10000, 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 10000)
    val mm = df.agg(min("id"), max("id"), countDistinct("id")).collect()(0)
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 9999L && mm.getLong(2) === 10000L)
  }

  test("uneven rows spread the remainder: no empty and no oversized partition") {
    val sizes = read(10, 4).rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.sorted.toSeq === Seq(2, 2, 3, 3))
  }

  test("column pruning reaches the DSv2 scan (ReadSchema shows only id)") {
    val df = read(1000, 2).select("id")
    val p = df.queryExecution.executedPlan.toString
    // DSv2 renders pruning as the BatchScan's output column list
    assert("BatchScan [^\\[]*\\[id#\\d+L\\]".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("bucket"), p)
  }

  test("content is deterministic: splitmix64 values and bucket law hold") {
    val df = read(64, 3)
    val rows = df.orderBy("id").collect()
    assert(rows.forall(r => r.getInt(1) === (r.getLong(0) % 32).toInt))
    assert(rows(0).getLong(2) === SeqSource.mix(0L))
    assert(rows(63).getLong(2) === SeqSource.mix(63L))
    // a second read produces identical bytes
    assert(read(64, 5).orderBy("id").collect().toSeq === rows.toSeq)
  }

  test("id range filters clip the planned splits and leave NO Spark-side Filter node") {
    val df = read(10000, 8).where(col("id") >= 5000 && col("id") < 6000)
    assert(df.count() === 1000)
    val mm = df.agg(min("id"), max("id")).collect()(0)
    assert(mm.getLong(0) === 5000L && mm.getLong(1) === 5999L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[5000,6000)"), p) // the clip reached the scan
    assert(!p.contains("+- Filter"), p) // fully consumed: no Filter NODE
    // splits shrink with the range: empty clipped partitions are not planned
    val one = read(10000, 8).where(col("id") === 1234L)
    assert(one.rdd.getNumPartitions <= 8)
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(1234L))
  }

  test("a residual filter (non-id) still evaluates Spark-side and results stay correct") {
    val df = read(1000, 4).where(col("bucket") === 3)
    assert(df.count() === 1000 / 32 + (if (3 < 1000 % 32) 1 else 0))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("+- Filter") || p.contains("*(1) Filter"), p) // bucket must stay Spark-side
  }

  test("complete aggregate pushdown: global count/min/max/sum answered by the scan") {
    val df = read(100000, 8).agg(count(lit(1)).as("n"), min("id"), max("id"), sum("id"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("PushedAggregates"), p)
    val r = df.collect()(0)
    assert(r.getLong(0) === 100000L)
    assert(r.getLong(1) === 0L && r.getLong(2) === 99999L)
    assert(r.getLong(3) === 100000L * 99999L / 2)
  }

  test("grouped aggregate pushdown composes with split-clipping id filters") {
    val df = read(100000, 8).where(col("id") >= 123 && col("id") < 77777)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"), sum("id").as("s"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"), p)
    val exp = (123L until 77777L).groupBy(i => (i % 32).toInt)
      .map { case (b, g) => b -> ((g.size.toLong, g.min, g.max, g.sum)) }
    val got = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === exp)
  }

  test("aggregate pushdown on an empty clipped range yields the SQL-correct empty-input row") {
    val df = read(1000, 4).where(col("id") < 0).agg(count(lit(1)).as("n"), min("id").as("mn"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("unsupported aggregates (min over hashed v, avg) fall back to Spark-side aggregation") {
    val df = read(10000, 4).agg(min("v").as("mv"), avg("id").as("a"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    val r = df.collect()(0)
    assert(r.getLong(0) === (0L until 10000L).map(SeqSource.mix).min)
    assert(r.getDouble(1) === 9999.0 / 2)
  }

  test("the source joins and aggregates like any table (engine integration)") {
    val df = read(100000, 16)
    val agg = df.groupBy("bucket").agg(count(lit(1)).as("n"))
    assert(agg.count() === 32)
    assert(agg.agg(sum("n")).collect()(0).getLong(0) === 100000L)
  }

  test("runtime (DPP-style) filtering narrows the planned splits from join keys") {
    // A selective broadcast dim joined on id should hand its key set back
    // through SupportsRuntimeFiltering.filter(), and the re-planned splits
    // must cover only the narrowed id range — runtime skipping of whole
    // virtual blocks, not just planning-time clipping.
    // fact is 10M rows so its REPORTED stats (200 MB) keep it on the probe
    // side; the 50-row dim broadcasts and its key set flows back to the scan
    val events0 = SeqSource.runtimeFilterEvents.get()
    val dim = spark.range(0, 100000).toDF("k")
      .where(col("k") % 1000 === 0 && col("k") >= 50000)
    val fact = read(10000000, 16)
    val joined = fact.join(dim, fact("id") === dim("k"))
      .agg(count(lit(1)).as("n"), sum(fact("id")).as("s"))
    val r = joined.collect()(0)
    assert(r.getLong(0) === 50L) // 50000, 51000, …, 99000
    assert(r.getLong(1) === (50000L to 99000L by 1000).sum)
    assert(SeqSource.runtimeFilterEvents.get() > events0,
      "runtime filter was never delivered to the scan")
    val (plo, phi) = SeqSource.lastPlannedRange.get()
    assert(plo >= 50000L && phi <= 99001L, s"splits not narrowed: [$plo,$phi)")
  }

  test("LIMIT pushdown clips the planned span to the first n ids (no full scan)") {
    val got = read(1000000, 16).limit(5).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(0L, 1L, 2L, 3L, 4L))
    val (plo, phi) = SeqSource.lastPlannedRange.get()
    assert(phi - plo <= 5L, s"limit did not clip the span: [$plo,$phi)")
  }

  test("ORDER BY id LIMIT n (top-N) pushdown plans only the tail/head range") {
    val desc3 = read(1000000, 16).orderBy(col("id").desc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(desc3 === Seq(999999L, 999998L, 999997L))
    val (plo, phi) = SeqSource.lastPlannedRange.get()
    assert(plo >= 999997L, s"top-N did not clip to the tail: [$plo,$phi)")
    val asc2 = read(1000000, 16).orderBy(col("id")).limit(2)
      .collect().map(_.getLong(0)).toSeq
    assert(asc2 === Seq(0L, 1L))
    val (alo, ahi) = SeqSource.lastPlannedRange.get()
    assert(ahi <= 2L, s"top-N did not clip to the head: [$alo,$ahi)")
  }

  test("reported statistics let Catalyst choose broadcast-hash with no hint") {
    // The clipped scan reports ~1000 rows × 20 B — far under the broadcast
    // threshold — so JoinSelection must pick BroadcastHashJoin on its own.
    // Without SupportsReportStatistics a V2 relation defaults to
    // defaultSizeInBytes=MaxValue and this degrades to sort-merge.
    val small = read(10000000, 16).where(col("id") < 1000)
    val big = spark.range(0, 10000000).toDF("k") // 80 MB: NOT broadcastable itself
    val j = big.join(small, col("k") === col("id"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    val r = j.collect()(0)
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 999L * 1000L / 2)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("metadata columns: _split_start/_split_end selectable by name, hidden from *") {
    val df = read(10000, 4)
    // hidden from SELECT *
    assert(df.columns.toSeq === Seq("id", "bucket", "v"))
    // selectable by name: every row's id falls inside its split bounds,
    // and the distinct split ranges tile [0, rows) across 4 partitions
    val md = df.select(col("id"), col("_split_start"), col("_split_end"))
    val bad = md.where(col("id") < col("_split_start") || col("id") >= col("_split_end"))
    assert(bad.count() === 0)
    val splits = md.select(col("_split_start"), col("_split_end")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(splits.length === 4)
    assert(splits.head._1 === 0L && splits.last._2 === 10000L)
    assert(splits.sliding(2).forall { case Array(a, b) => a._2 === b._1; case _ => true })
  }

  test("bucket layout: storage-partitioned join and aggregation run with ZERO Exchange") {
    // Both sides report KeyGroupedPartitioning(identity(bucket), 32) and
    // every split carries its partition key, so with v2 bucketing enabled
    // the per-bucket aggregates AND the bucket⋈bucket join are planned
    // entirely shuffle-free — the Iceberg-style SPJ surface on our source.
    def bucketed(rows: Long) =
      spark.read.format(classOf[SeqSource].getName)
        .option("rows", rows.toString).option("layout", "bucket").load()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val a = bucketed(3200).groupBy("bucket")
        .agg(sum(pmod(col("v"), lit(1000000L))).as("sa")) // bounded: ANSI-safe
      val b = bucketed(6400).groupBy("bucket").agg(count(lit(1)).as("nb"))
      val j = a.join(b, "bucket")
      val rows = j.collect()
      assert(rows.length === 32)
      assert(rows.forall(_.getLong(2) === 200L)) // 6400/32 per bucket
      val expSa = (0L until 3200L).groupBy(_ % 32)
        .map { case (k, g) =>
          k.toInt -> g.map(i => java.lang.Math.floorMod(SeqSource.mix(i), 1000000L)).sum }
      assert(rows.map(r => r.getInt(0) -> r.getLong(1)).toMap === expSa)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"expected shuffle-free SPJ plan:\n$p")
    }
  }
}
