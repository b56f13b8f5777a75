package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks for 100 TB inputs.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  * every session here) handles join-side skew at runtime; these helpers cover
  * the aggregation-side case AQE doesn't: a groupBy where one hot key floods
  * a single reducer.
  */
object Scale {

  /** Two-phase salted aggregation: spread each key over `salt` sub-keys,
    * partially aggregate, then combine partials. Correct for any algebraic
    * aggregate expressed as (partial, combine) column pairs — here sums and
    * counts, which also yield averages downstream.
    *
    * `spark.sql.shuffle.partitions`-sized reducers each see ≤ 1/salt of a hot
    * key's rows in phase 1; phase 2 shuffles only `|keys| × salt` rows.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      salt: Int = 16): DataFrame = {
    // Salt from the row-content hash: deterministic under ANY partition
    // layout (monotonically_increasing_id would place phase-1 partials
    // differently per input split arrangement). Identical rows share a salt
    // bucket, which is harmless for algebraic aggregates and keeps the
    // phase-1 placement reproducible run-to-run.
    df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(hash(col("k"), col("v")), lit(salt)))
      .groupBy(col("k"), col("salt"))
      .agg(Det.dsum(col("v")).as("part_sum"), count(lit(1)).as("part_cnt"))
      .groupBy(col("k"))
      .agg(
        Det.dsum(col("part_sum")).as("sum_v"),
        sum(col("part_cnt")).as("cnt"))
  }
}
