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
    val events0 = SeqSource.runtimeFilterEvents.get()
    val dim = spark.range(0, 100000).toDF("k")
      .where(col("k") % 1000 === 0 && col("k") >= 50000)
    val fact = read(100000, 16)
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
}
