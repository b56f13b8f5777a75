package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    args.foreach { name =>
      (1 to 2).foreach { it =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[qbench] $name iter$it ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      }
    }
    spark.stop()
  }
}
