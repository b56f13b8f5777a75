package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Typed `Dataset[T]` surface: case-class encoders, typed filter/map, then a
  * hand-off to the relational aggregation path (the idiomatic hybrid — typed
  * logic where type safety helps, Catalyst aggregation where codegen wins;
  * typed lambdas are opaque to the optimizer, so the scan-side filter is also
  * expressed as a Column to keep parquet pushdown).
  */
object TypedOps {

  final case class OrderRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double)

  def q50TypedPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .where(col("o_totalprice") > 100000) // Column form → pushed to the scan
      .as[OrderRow]
    ds.filter(o => o.o_totalprice > 100000) // typed guard (same predicate)
      .map(o => (o.o_orderstatus, o.o_totalprice))
      .toDF("status", "price")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("price")).as("sum_price"))
      .orderBy(col("status"))
  }

  val q50Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS cnt,
       |  ${Det.dsumSql("o_totalprice")} AS sum_price
       |FROM orders WHERE o_totalprice > 100000
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q50_typed_pipeline", q50TypedPipeline, q50Oracle)
  )
}
