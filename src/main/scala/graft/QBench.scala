package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Builder-side experiment hook: extra session confs as "k=v;k=v" (never
    // set by the driver; Bench does not read it — A/B runs only).
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    // Same recording methodology as Bench (r14 — QBench is the arbitration
    // tool for disp-flagged queries, so an isolated re-measure must be
    // methodologically identical): two iterations reporting the min; if they
    // disagree by >3x, a third arbitrates and the median is recorded.
    val DispRatio = 3.0
    args.foreach { name =>
      def once(it: Int): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qbench] $name iter$it $sec%8.2fs")
        sec
      }
      val a = once(1); val b = once(2)
      val rec =
        if (math.max(a, b) > DispRatio * math.min(a, b)) {
          val c = once(3)
          val med = Seq(a, b, c).sorted.apply(1)
          println(f"[qbench] $name DISPERSION -> median $med%8.2fs")
          med
        } else math.min(a, b)
      println(f"[qbench] $name recorded $rec%8.2fs")
    }
    spark.stop()
  }
}
