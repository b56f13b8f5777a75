package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print pushdown lines (default) or the full physical plan
  * (`-full`) for named queries. Usage: runMain graft.Explain [-full] q33_… */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val full = args.contains("-full")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.filterNot(_ == "-full").foreach { name =>
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"===== $name =====")
      if (full) p.linesIterator.foreach(l => println(l.take(160)))
      else p.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .foreach(l => println(l.trim.take(200)))
    }
    spark.stop()
  }
}
