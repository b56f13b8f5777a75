package graft
import org.apache.spark.sql.SparkSession

/** Builder-side plan inspector: prints the join/exchange/broadcast skeleton
  * of each named query's physical plan. Usage:
  * `runMain graft.PlanProbe q143_fixed_point_pagerank,q161_bfs_hops`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(0).split(",")) {
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString
      println(s"===== $n =====")
      println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Broadcast"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
