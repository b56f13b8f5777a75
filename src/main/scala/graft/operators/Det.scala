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
}
