package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator extension (TopKPerKeyPlan → TopKPerKeyExec):
  * semantic equivalence with the window-rank formulation, the sort-free
  * plan shape, and boundary behavior (k ≥ group size, k = 1).
  */
class TopKPerKeySpec extends SparkSpec {

  private def li = Tables.lineitem
    .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))

  private object Tables {
    def lineitem = graft.sources.Tables.lineitem(spark, sfDir)
  }

  private def windowTwin(k: Int) = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("topK matches the window-rank twin row-for-row (k=3)") {
    val got = TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
      desc = true, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 3)
    assert(canon(got) === canon(windowTwin(3)))
  }

  test("k larger than every group returns the whole input; k=1 returns the per-key max") {
    val small = li.where(col("l_orderkey") < 200) // per-flag groups well under 1024
    val all = TopKPerKey.topK(small, Seq("l_returnflag"), "l_extendedprice",
      desc = true, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 1024)
    assert(all.count() === small.count())
    val one = TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
      desc = true, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 1)
    assert(canon(one) === canon(windowTwin(1)))
  }

  test("ascending order keeps the per-key minima") {
    val got = TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
      desc = false, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 2)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val twin = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 2).drop("rn")
    assert(canon(got) === canon(twin))
  }

  test("plan: TopKPerKeyExec with a key exchange, NO Window and NO Sort") {
    val df = TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
      desc = true, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey "), p) // exec node renders without the Exec suffix
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
  }

  test("k outside [1, 1024] is rejected") {
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
        desc = true, tiebreaks = Nil, k = 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
        desc = true, tiebreaks = Nil, k = 2000)
    }
  }
}
