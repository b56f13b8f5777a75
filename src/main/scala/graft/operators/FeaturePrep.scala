package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Feature-preparation operators for ML training pipelines: quantile banding
  * (ntile), per-group top-n via SQL LATERAL join, leave-one-out target
  * encoding, and deterministic weighted sampling.
  *
  * Scale shapes: every operator here is one shuffle on a grouping key plus
  * window evaluation (ntile/row_number stream through `WindowExec` without
  * materializing a group), or a broadcast of a tiny dim (q197's nation side).
  * No collect, no cartesian products, no RNG state — sampling keys are pure
  * per-row integer arithmetic, so executors decide membership independently,
  * which is exactly what a 1000-executor cluster needs.
  */
object FeaturePrep {

  // ---------------------------------------------------------------- q196

  /** Quantile banding (the classic feature-binning step): ntile(4) over each
    * market segment ordered by (acctbal, custkey) — the unique tie-break makes
    * band assignment deterministic — then per-band row count and exact decimal
    * balance mass. One shuffle on the segment key; ntile streams per
    * partition.
    */
  def q196NtileBands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("band", ntile(4).over(w))
      .groupBy(col("c_mktsegment").as("seg"), col("band"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("c_acctbal")).as("bal_sum"))
      .orderBy(col("seg"), col("band"))
  }

  val q196Oracle: String =
    s"""WITH b AS (
       |  SELECT c_mktsegment AS seg, c_acctbal,
       |         ntile(4) OVER (PARTITION BY c_mktsegment
       |                        ORDER BY c_acctbal, c_custkey) AS band
       |  FROM customer)
       |SELECT seg, band, count(*) AS n, ${Det.dsumSql("c_acctbal")} AS bal_sum
       |FROM b GROUP BY seg, band ORDER BY seg, band""".stripMargin

  // ---------------------------------------------------------------- q197

  /** Per-group top-n through the SQL LATERAL correlated-subquery surface:
    * for every nation, its two highest-balance customers. Catalyst
    * decorrelates the LIMIT-ed lateral subquery into a ranked window join —
    * the same physical plan a hand-written row_number() query gets — so the
    * declarative form costs nothing at scale (one shuffle on the correlation
    * key; nation is broadcast).
    */
  def q197LateralTopn(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_lat")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lat")
    spark.sql(
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation_lat JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer_lat
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
  }

  val q197Oracle: String =
    """SELECT n_name, t.c_custkey, t.c_acctbal
      |FROM nation JOIN LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t ON true
      |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q198

  /** Leave-one-out target encoding (the standard leakage-free categorical
    * encoder): each customer's segment is encoded as the mean balance of all
    * OTHER customers in that segment. Exact decimal window sum minus the row's
    * own decimal value, then one IEEE division by (n-1) — bit-identical in
    * both engines. One shuffle on the category key; the window aggregate is a
    * single-pass partial sum, nothing is materialized per group.
    */
  def q198LooEncode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
    Tables.customer(spark, dir)
      .withColumn("bal_dec", col("c_acctbal").cast("decimal(18,4)"))
      .withColumn("loo_mean",
        (sum(col("bal_dec")).over(w) - col("bal_dec")).cast("double") /
          nullif(count(lit(1)).over(w) - lit(1), lit(0)))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"), col("loo_mean"))
      .orderBy(col("c_custkey"))
  }

  val q198Oracle: String =
    """SELECT c_custkey, c_mktsegment AS seg,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) OVER (PARTITION BY c_mktsegment)
      |       - CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE)
      |    / nullif(count(*) OVER (PARTITION BY c_mktsegment) - 1, 0) AS loo_mean
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q199

  /** Deterministic weighted sampling: five documents per source, selection
    * pressure proportional to document length. Each row's sort key is
    * multiplicative-hash(doc_id) / n_chars — pure integer arithmetic widened
    * to an exact IEEE division (hash < 2^32 and n_chars < 2^53 are both
    * double-exact) — so longer documents draw systematically smaller keys and
    * the per-source row_number top-5 is a weighted sample both engines agree
    * on bit-for-bit. The scale substitute for RNG reservoir sampling: no
    * state, no coordination, rerun-stable.
    */
  def q199WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("skey",
        expr("CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / CAST(n_chars AS DOUBLE)"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("source"), col("doc_id"), col("n_chars"), col("skey"))
      .orderBy(col("source"), col("skey"), col("doc_id"))
  }

  val q199Oracle: String =
    """WITH k AS (
      |  SELECT source, doc_id, n_chars,
      |         CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
      |           / CAST(n_chars AS DOUBLE) AS skey
      |  FROM documents)
      |SELECT source, doc_id, n_chars, skey FROM (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
      |  FROM k) WHERE rn <= 5
      |ORDER BY source, skey, doc_id""".stripMargin

  // ----------------------------------------------------------------

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q196_ntile_bands", q196NtileBands, q196Oracle),
    GraftQuery.sql("q197_lateral_topn", q197LateralTopn, q197Oracle),
    GraftQuery.sql("q198_loo_encode", q198LooEncode, q198Oracle),
    GraftQuery.sql("q199_weighted_sample", q199WeightedSample, q199Oracle))
}
