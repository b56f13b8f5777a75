package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-4 data-ops specs: table diff classes, FK audit sensitivity,
  * incremental-aggregate exactness, gaps-and-islands ≡ session_window, and
  * plan shapes for the profiler and TPC-H Q6.
  */
class DataOpsSpec extends SparkSpec {

  test("table diff classes partition the key universe correctly") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val byClass = DataOps.q119TableDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val added = orders.where(col("o_orderkey") % 10 === 3).count()
    val removed = orders.where(col("o_orderkey") % 10 === 7).count()
    val changed = orders.where(col("o_orderkey") % 10 =!= 3 &&
      col("o_orderkey") % 10 =!= 7 && col("o_orderkey") % 5 === 0).count()
    assert(byClass("added") === added)
    assert(byClass("removed") === removed)
    assert(byClass("changed") === changed)
    assert(byClass.values.sum === orders.count())
  }

  test("FK audit: clean keys report zero, the seeded stale snapshot reports orphans") {
    val audit = DataOps.q120FkAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit("lineitem.l_orderkey->orders") === 0L)
    assert(audit("orders.o_custkey->customer") === 0L)
    assert(audit("customer.c_nationkey->nation") === 0L)
    assert(audit("lineitem.l_partkey->part_stale_snapshot") > 0L)
  }

  test("incremental aggregate maintenance is exact for every key") {
    val mismatches = DataOps.q122IncrementalAgg(spark, sfDir)
      .where(!col("matches")).count()
    assert(mismatches === 0L)
  }

  test("column profile: orderkey is unique and never null") {
    val rows = DataOps.q121ColumnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ok = rows("o_orderkey")
    assert(ok.getLong(2) === 0L)              // n_null
    assert(ok.getLong(3) === ok.getLong(1))   // n_distinct == n_rows
    assert(rows("o_orderstatus").getString(6) != null) // strings profile as strings
  }

  test("gaps-and-islands sessions coincide with session_window sessions") {
    val gi = Timeline.q125GapsIslands(spark, sfDir)
      .select(col("user_id"), col("s_start"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    val sw = EventOps.q29SessionWindow(spark, sfDir)
      .select(col("user_id"), col("s_start"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    assert(gi === sw)
  }

  test("incremental merge is associative: 3-way split merged in any order == direct") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, sfDir)
    def roll(m: Int) = orders.where(col("o_orderkey") % 3 === m)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,4)")).as("s"))
    def merge(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.select(col("o_custkey"), col("n").as("na"), col("s").as("sa"))
        .join(b.select(col("o_custkey"), col("n").as("nb"), col("s").as("sb")),
          Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n"),
          (coalesce(col("sa"), lit(0).cast("decimal(18,4)")) +
            coalesce(col("sb"), lit(0).cast("decimal(18,4)"))).as("s"))
    val leftAssoc = merge(merge(roll(0), roll(1)), roll(2))
    val rightAssoc = merge(roll(0), merge(roll(1), roll(2)))
    val direct = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,4)")).as("s"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("o_custkey"), col("n"), col("s").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(canon(leftAssoc) === canon(direct))
    assert(canon(rightAssoc) === canon(direct))
  }

  test("equi-depth buckets tile the value range in order") {
    val rows = DataOps.q127EquidepthHistogram(spark, sfDir)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    rows.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    rows.foreach { case (_, lo, hi) => assert(lo <= hi) }
  }

  test("dim standardization: variance non-negative, outliers bounded by n") {
    val bad = VecMore.q128DimStandardize(spark, sfDir)
      .where(col("var_milli") < 0 || col("n_outliers") > col("n")).count()
    assert(bad === 0)
  }

  test("nested history conserves order counts and non-negative gaps") {
    val h = DataOps.q130NestedHistory(spark, sfDir)
    val totalOrders = graft.sources.Tables.orders(spark, sfDir).count()
    assert(h.agg(sum("n_orders")).collect()(0).getLong(0) === totalOrders)
    assert(h.where(col("gap_days") < 0).count() === 0)
  }

  test("star-contraction CC labels the corpus identically to pointer jumping") {
    val star = Dedup.q136StarComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val jump = Dedup.q77DedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(star === jump)
    assert(star.nonEmpty)
  }

  test("TopKAgg is insertion-order and merge-split invariant") {
    val agg = new graft.functions.TopKAgg(3)
    val xs = Seq((5.0, 1L), (9.0, 2L), (9.0, 1L), (1.0, 3L), (7.0, 4L), (9.0, 9L), (3.0, 5L))
    def run(seq: Seq[(Double, Long)]): Seq[(Double, Long)] =
      agg.finish(seq.foldLeft(agg.zero)(agg.reduce)).toSeq
    val expected = Seq((9.0, 1L), (9.0, 2L), (9.0, 9L)) // score desc, id asc ties
    assert(run(xs) === expected)
    assert(run(xs.reverse) === expected)
    assert(run(xs.sortBy(_._2)) === expected)
    // arbitrary split + merge == single fold
    (1 until xs.length).foreach { cut =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).toSeq === expected, s"cut=$cut")
    }
  }

  test("tpch q6 pushes all three predicates into the parquet scan") {
    val p = TpchMore.q123TpchQ6(spark, sfDir).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_discount") && p.contains("l_quantity") && p.contains("l_shipdate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p) // one-row agg: no data shuffle
  }

  test("column profiler reads the table exactly once") {
    val p = DataOps.q121ColumnProfile(spark, sfDir).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
  }
}
