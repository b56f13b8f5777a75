package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for DuckDB-oracle hash-matching (SURVEY.md §5).
  *
  * Double summation is order-dependent, and Spark's shuffle order differs from
  * DuckDB's scan order — so any `sum(double)` output would be a hash lottery.
  * Instead: cast each value to DECIMAL (both engines round the identical
  * binary double to the identical decimal — midpoint ties are not binary-
  * representable, so the tie-break rule never fires), sum exactly in decimal
  * (associative, order-independent), and cast the exact result back to DOUBLE
  * (nearest-double, identical in both engines). Division by a count stays
  * bit-exact because IEEE-754 division is fully specified.
  */
object Det {
  /** Order-independent sum of a money/measure double, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** DuckDB twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"

  /** Order-independent average as exact-sum / count (IEEE-exact division). */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))).cast("double")

  def davgSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE) / count(*)"

  // ---- Float-vector arithmetic (ArrayType(FloatType) embeddings) ----
  //
  // Per-row reductions over an array column are SEQUENTIAL LEFT FOLDS in both
  // engines (Spark's `aggregate` HOF, DuckDB's `list_reduce`), so plain
  // double arithmetic is bit-reproducible: widen float→double (exact),
  // multiply in double (a product of two 24-bit floats fits a 53-bit double
  // exactly), then fold with IEEE-deterministic additions in identical order.
  // Do NOT use decimal here — Spark's double→decimal cast goes through the
  // shortest-string representation while DuckDB rounds the exact binary
  // expansion, and they disagree past ~15 significant digits.

  /** Spark SQL expr: left-fold dot product of two float arrays, as DOUBLE. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB twin of [[dotExpr]] — identical fold order, bit-identical result. */
  def dotSql(a: String, b: String): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"

  /** Spark SQL expr: left-fold sum of a float array's elements, as DOUBLE. */
  def arrSumExpr(a: String): String =
    s"aggregate($a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE))"

  /** DuckDB twin of [[arrSumExpr]]. */
  def arrSumSql(a: String): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || list_transform($a, x -> CAST(x AS DOUBLE)), " +
      s"(acc, v) -> acc + v)"

  /** DuckDB: events with ts truncated to Spark's µs TimestampType (see Tables.events). */
  val EventsSql: String =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"
}
