package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * `build` produces the Spark result for a scale-factor directory;
  * `oracle`, when present, is the ANSI-SQL twin DuckDB runs on the same
  * parquet tables (table names resolve via views the driver creates).
  * Queries must be deterministic: explicit ORDER BY with unique
  * tie-breakers, order-independent aggregation (decimal sums), and no
  * float-boundary-sensitive output columns (see SURVEY.md §5).
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, build: (SparkSession, String) => DataFrame, oracle: String): GraftQuery =
    GraftQuery(name, build, Some(oracle))

  /** Operator with no SQL-expressible oracle (driver records rows-only check). */
  def rowsOnly(name: String, build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, None)
}
