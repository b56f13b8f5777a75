package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator module into the `queries` /
  * `oracleSql` maps the driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** All implemented operators, one [[GraftQuery]] each. */
  def allQueries: Seq[GraftQuery] =
    RelationalCore.all ++ Windows.all ++ SetsAndScalars.all ++ EventOps.all ++
      Dedup.all ++ TextAnalysis.all ++ Similarity.all ++ Multimodal.all ++
      FsParity.all ++ TypedOps.all ++ AdvancedSql.all ++ Composite.all ++
      TpchMore.all ++ Curation.all ++ SpanOps.all ++ Timeline.all ++ VecMore.all ++
      DataOps.all ++ GraphRank.all ++ FeaturePrep.all ++ Connectors.all ++
      Retrieval.all ++ TextHygiene.all ++ DataQuality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalCore.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
