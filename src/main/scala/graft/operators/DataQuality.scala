package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Declarative data-quality expectations (the Deequ-style contract check a
  * corpus pipeline gates every ingest on), evaluated in ONE pass: every rule
  * compiles to an aggregate expression over the same scan, so a 100 TB table
  * pays one read for the whole suite — never a scan per rule. The referential
  * (cross-table) face lives in q120's FK audit; this is the single-table
  * suite.
  */
object DataQuality {

  // ---------------------------------------------------------------- q265

  /** Expectation suite over `orders`: key completeness + uniqueness, value
    * range, and categorical domain — each reported as (rule, checked,
    * violations, pass), all computed from one scan (the multi-aggregate
    * projection; count(DISTINCT) rides the same read via Spark's expand).
    * Rules are data-independent constants so the suite is a stable contract,
    * not a data-derived heuristic.
    */
  def q265Expectations(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_null_key"),
      (count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("v_dup_key"),
      sum(when(col("o_totalprice") < 0 || col("o_totalprice") > 1000000, 1L)
        .otherwise(0L)).as("v_price_range"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("v_status_domain"))
    agg.selectExpr(
      "n_rows",
      "stack(4, " +
        "'complete(o_orderkey)', v_null_key, " +
        "'unique(o_orderkey)', v_dup_key, " +
        "'range(o_totalprice, 0, 1000000)', v_price_range, " +
        "'domain(o_orderstatus, {O,F,P})', v_status_domain" +
        ") AS (rule, violations)")
      .select(col("rule"), col("n_rows").as("checked"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  val q265Oracle: String =
    """WITH agg AS (
      |  SELECT count(*) AS n_rows,
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null_key,
      |    count(o_orderkey) - count(DISTINCT o_orderkey) AS v_dup_key,
      |    CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain
      |  FROM orders)
      |SELECT rule, n_rows AS checked, violations, violations = 0 AS pass FROM (
      |  SELECT n_rows, 'complete(o_orderkey)' AS rule, v_null_key AS violations FROM agg
      |  UNION ALL SELECT n_rows, 'unique(o_orderkey)', v_dup_key FROM agg
      |  UNION ALL SELECT n_rows, 'range(o_totalprice, 0, 1000000)', v_price_range FROM agg
      |  UNION ALL SELECT n_rows, 'domain(o_orderstatus, {O,F,P})', v_status_domain FROM agg)
      |ORDER BY rule""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q265_expectations", q265Expectations, q265Oracle))
}
