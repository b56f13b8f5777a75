package graft.sources.catalog

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plans of the CDF machinery (the
  * row-level diff and the materialized shaped feed) for the r14 plan
  * evidence — `runMain graft.sources.catalog.CdfPlanDump <outFile>`.
  */
object CdfPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdfplan").toString
    spark.conf.set("spark.sql.catalog.stage_p",
      classOf[GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.stage_p.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stage_p.ws")
    spark.sql("CREATE TABLE stage_p.ws.t (k BIGINT, v BIGINT, s STRING)")
    (1L to 1000L).map(i => (i, i * 10, s"s$i")).toDF("k", "v", "s")
      .createOrReplaceTempView("src_t")
    spark.sql("INSERT INTO stage_p.ws.t SELECT * FROM src_t")            // v1
    spark.sql("UPDATE stage_p.ws.t SET v = v + 5 WHERE k % 7 = 0")       // v2
    val diff = StagingMaintenance.rowLevelChanges(spark, "stage_p", "ws", "t", 1L, 2L)
    val sb = new StringBuilder
    sb.append("== row-level diff (rowLevelChangesAt) v1 -> v2 of a keyless UPDATE ==\n")
    sb.append(diff.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // the materialized shaped feed (ensureCdf) — read the .changes face
    val feed = spark.sql(
      "SELECT * FROM stage_p.ws.t.changes WHERE _commit_version = 2")
    feed.count() // triggers ensureCdf materialization
    sb.append("\n== .changes face read of the materialized v2 feed ==\n")
    sb.append(feed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    // lineage-table identity diff (lineageCdfDiff drives the .changes face
    // of every lineage table): UPDATE then explain the feed's diff
    spark.sql(
      """CREATE TABLE stage_p.ws.lt (k BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.row-lineage'='true')""".stripMargin)
    spark.sql("INSERT INTO stage_p.ws.lt SELECT k, v FROM src_t")        // v1
    spark.sql("UPDATE stage_p.ws.lt SET v = v + 5 WHERE k % 7 = 0")      // v2
    val lfeed = spark.sql(
      "SELECT * FROM stage_p.ws.lt.changes WHERE _commit_version = 2")
    // capture the DIFF plan before materialization caches it: build it via
    // the same entry the planner uses
    val ldir = new org.apache.hadoop.fs.Path(s"$root/ws/lt")
    val lfs = ldir.getFileSystem(spark.sessionState.newHadoopConf())
    val ldiff = StagingMaintenance.lineageDiffForPlanDump(spark, lfs, ldir, 2L)
    sb.append("\n== lineage identity diff (lineageCdfDiff) v1 -> v2 ==\n")
    sb.append(ldiff.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    lfeed.count()
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $out")
    spark.stop()
  }
}
