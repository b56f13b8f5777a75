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
