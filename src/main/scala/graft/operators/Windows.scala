package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Window-function operators: ranking, frames, analytic lag/lead.
  *
  * Every window carries a unique tie-break key in its ORDER BY so rank /
  * frame contents are total-order deterministic (SURVEY.md §5). Running sums
  * accumulate in DECIMAL (order-independent) and surface as DOUBLE.
  * At scale each window is one hash-partition shuffle on its partition keys;
  * no window here is partitioned on a skewed or low-cardinality-only key.
  */
object Windows {

  /** Ranking sweep: row_number / rank / dense_rank / ntile per nation. */
  def q15WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, dir)
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  val q15Oracle: String =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  row_number() OVER w AS rn, rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, rn""".stripMargin

  /** Frames: running total (ROWS) and a 30-day trailing sum (RANGE over a
    * day-index column). Decimal accumulation keeps both order-independent.
    */
  def q16WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val rows = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val range = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, dir)
      .withColumn("d", datediff(col("o_orderdate"), lit("1992-01-01").cast("timestamp")))
      .select(
        col("o_orderkey"), col("o_custkey"), col("d"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(rows).cast("double").as("run_total"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(range).cast("double").as("run_30d"))
      .orderBy(col("o_orderkey"))
  }

  val q16Oracle: String =
    """SELECT o_orderkey, o_custkey, d,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY d
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_30d
      |FROM (SELECT *, datediff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate) AS d
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Analytic functions over the event stream: lag / lead / first_value per
    * user in event-time order (µs-truncated on both engines).
    */
  def q17WindowLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_type")).over(w).as("first_type"))
      .orderBy(col("event_id"))
  }

  val q17Oracle: String =
    s"""SELECT event_id, user_id, value,
       |  lag(value, 1) OVER w AS prev_value,
       |  lead(value, 1) OVER w AS next_value,
       |  first_value(event_type) OVER w AS first_type
       |FROM (${Det.EventsSql})
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY event_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q15_window_rank", q15WindowRank, q15Oracle),
    GraftQuery.sql("q16_window_frames", q16WindowFrames, q16Oracle),
    GraftQuery.sql("q17_window_lag_lead", q17WindowLagLead, q17Oracle)
  )
}
