package graft
import org.apache.spark.sql.SparkSession

/** Builder-side timing probe: min-of-4 wall-clock per named query at the
  * bench SF (default sf0.1, local[32]) with the bench's cache hygiene.
  * Usage: `runMain graft.TimeProbe q143_fixed_point_pagerank,q161_bfs_hops`
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warm-up
    for (n <- args(0).split(",")) {
      var best = Double.MaxValue
      for (_ <- 1 to 4) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"TIME $n%-30s $best%.2f s")
    }
    spark.stop()
  }
}
