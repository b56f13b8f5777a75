package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Relational core operators (SURVEY.md §2b, Phase 0/1).
  *
  * Every query is a declarative DataFrame plan — Catalyst handles predicate
  * pushdown, column pruning, partial aggregation, and join-strategy selection;
  * nothing here hand-schedules. At 100 TB the scans shard on
  * `maxPartitionBytes` splits (the role of the reference's 32 MiB virtual
  * block size, `CephRgwFileSystem.java:112`), aggregations combine map-side,
  * and dim-table joins broadcast.
  */
object RelationalCore {

  /** Flagship: TPC-H-Q1-style pricing summary — scan → pushed filter →
    * partial+final hash agg → sort. The full read lifecycle of SURVEY.md §3.2.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.dsumSql("l_quantity")} AS sum_qty,
       |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Det.davgSql("l_quantity")} AS avg_qty,
       |  ${Det.davgSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q01_pricing_summary", q01PricingSummary, q01Oracle)
  )
}
