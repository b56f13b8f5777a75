package graft

import org.apache.spark.sql.functions._

/** Driver-contract smoke: entry() returns rows; every declared query builds
  * and returns rows at sf0.001; oracle keys ⊆ query keys.
  */
class EntrySpec extends SparkSpec {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query builds and returns >0 rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("flagship q01 aggregates correctly vs direct computation") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val expectTotal = li
      .where(col("l_shipdate") <= lit("1999-12-01").cast("timestamp")).count()
    val gotTotal = df.agg(sum("count_order")).head.getLong(0)
    assert(gotTotal === expectTotal)
  }
}
