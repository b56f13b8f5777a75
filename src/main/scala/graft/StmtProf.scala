package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: per-statement wall-clock of the q349 change-feed lifecycle —
  * separates DML statement cost (write + commit) from CDF read cost.
  */
object StmtProf {
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
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    val stageRoot = java.nio.file.Files.createTempDirectory("graft_stmtprof").toString
    spark.conf.set("spark.sql.catalog.graft_stage",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_stage.root", stageRoot)
    graft.sources.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_sp_src")

    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[stmt] ${(System.nanoTime() - t0) / 1e9}%7.3fs  $label")
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      t("create ns")(spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_stage.work"))
      t("drop")(spark.sql("DROP TABLE IF EXISTS graft_stage.work.o_sp"))
      t("create")(spark.sql("CREATE TABLE graft_stage.work.o_sp (k BIGINT, v BIGINT)"))
      t("insert")(spark.sql(
        """INSERT INTO graft_stage.work.o_sp
          |SELECT o_orderkey, o_custkey FROM orders_sp_src
          |WHERE o_orderkey % 6 = 1""".stripMargin))
      t("update1")(spark.sql("UPDATE graft_stage.work.o_sp SET v = v + 100 WHERE k % 7 = 0"))
      t("delete")(spark.sql("DELETE FROM graft_stage.work.o_sp WHERE k % 5 = 2"))
      t("update2")(spark.sql("UPDATE graft_stage.work.o_sp SET v = v + 1 WHERE k % 11 = 0"))
      t("cdf read v<=3")(spark.sql(
        """SELECT _change_type, _commit_version, count(*) AS n,
          |  min(k) AS min_k, max(k) AS max_k, CAST(sum(v) AS BIGINT) AS sum_v
          |FROM graft_stage.work.o_sp.changes
          |WHERE _commit_version <= 3
          |GROUP BY _change_type, _commit_version
          |ORDER BY _commit_version, _change_type""".stripMargin).count())
      t("plain agg")(spark.sql(
        "SELECT count(*), sum(v) FROM graft_stage.work.o_sp").count())
      t("noop sql parse+plan only")(spark.sql(
        "SELECT 1 WHERE 1 = 0").count())
    }
    spark.stop()
  }
}
