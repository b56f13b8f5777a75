package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-Spark-job wall-clock breakdown of one query — shows where a
  * multi-statement lifecycle query (CTAS + DML + maintenance) spends its
  * time, which `explain` alone cannot. Guide §1.5 (label your jobs) applied
  * to the builder loop: `runMain graft.JobProf <queryName>[,<name2>...]`.
  */
object JobProf {
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

    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("") + " stages=" + js.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(40)}:${si.numTasks}").mkString("|")
        jobs(js.jobId) = Job(js.jobId, desc, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
    })

    for (name <- args(0).split(",")) {
      // second run = steady state (first pays codegen/page-cache first-touch)
      for (it <- 1 to 2) {
        jobs.synchronized(jobs.clear())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        // Driver-side sampling profiler: the per-job breakdown showed the
        // lifecycle queries spend over half their wall-clock BETWEEN jobs
        // (planning, commit protocol, FS metadata). Sample the query thread
        // every 25 ms and histogram the deepest "interesting" frame.
        // (Cross-thread getStackTrace forces a JVM safepoint per sample —
        // at 5 ms that globally stalled executors ~2.5x; 25 ms is mild.)
        val target = Thread.currentThread()
        val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val st = target.getStackTrace
            val tag = st.collectFirst {
              case f if f.getClassName.startsWith("graft.") ||
                f.getClassName.contains("datasources.parquet") ||
                f.getClassName.contains("execution.command") ||
                f.getClassName.contains("catalyst") ||
                f.getClassName.contains("sql.execution") =>
                s"${f.getClassName.split('.').last}.${f.getMethodName}"
            }.getOrElse(st.headOption
              .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
              .getOrElse("?"))
            hist.merge(tag, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
            Thread.sleep(25)
          }
        })
        sampler.setDaemon(true)
        if (it == 2) sampler.start()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        sampling = false
        // let listener events drain
        Thread.sleep(300)
        if (it == 2) {
          println(f"\n===== $name iter$it total $sec%.2fs, ${jobs.size} jobs =====")
          val snap = jobs.synchronized(jobs.values.toSeq)
          val sum = snap.map(j => (j.end - j.start) / 1e3).sum
          println(f"  job-time sum ${sum}%.2fs (gap = driver-side work: planning, commits, FS metadata)")
          snap.sortBy(j => -(j.end - j.start)).take(15).foreach { j =>
            val d = (j.end - j.start) / 1e3
            println(f"  job ${j.id}%4d ${d}%7.3fs  ${j.desc.take(140)}")
          }
          println("  --- driver thread samples (5ms each; query thread incl. job waits) ---")
          import scala.jdk.CollectionConverters._
          hist.asScala.toSeq.sortBy(-_._2.intValue).take(25).foreach { case (k, v) =>
            println(f"  ${v.intValue * 25 / 1000.0}%7.2fs  $k")
          }
        } else println(f"[jobprof] $name iter1 $sec%.2fs (warm-up)")
      }
    }
    spark.stop()
  }
}
