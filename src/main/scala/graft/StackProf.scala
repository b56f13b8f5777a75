package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: full-stack sampling profiler for one query's DRIVER thread —
  * JobProf's histogram keeps only the deepest interesting frame; this keeps
  * the whole stack (collapsed) so driver-side costs attribute to their
  * CALLER (which optimizer rule, which command, which commit phase).
  * Usage: `runMain graft.StackProf <queryName>`
  */
object StackProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count() // warm-up

    for (name <- args(0).split(",")) {
      for (it <- 1 to 2) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val target = Thread.currentThread()
        val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val st = target.getStackTrace
            // collapse: keep up to 8 "interesting" frames bottom-up so the
            // histogram groups by call path, not just leaf
            val interesting = st.filter { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.contains("catalyst") ||
              c.contains("sql.execution") || c.contains("datasources") ||
              c.contains("connector")
            }.take(10).map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
            val tag =
              if (interesting.isEmpty)
                st.headOption.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}").getOrElse("?")
              else interesting.reverse.mkString(" > ")
            hist.merge(tag, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
            Thread.sleep(20)
          }
        })
        sampler.setDaemon(true)
        if (it == 2) sampler.start()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        sampling = false
        if (it == 2) {
          println(f"\n===== $name iter$it total $sec%.2fs =====")
          import scala.jdk.CollectionConverters._
          hist.asScala.toSeq.sortBy(-_._2.intValue).take(30).foreach { case (k, v) =>
            println(f"  ${v.intValue * 20 / 1000.0}%7.2fs  $k")
          }
        } else println(f"[stackprof] $name iter1 $sec%.2fs (warm-up)")
      }
    }
    spark.stop()
  }
}
