package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("rl_dbg").toString
    spark.conf.set("spark.sql.catalog.dbg_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.dbg_cat.root", root)
    spark.sql("CREATE NAMESPACE dbg_cat.ws")
    spark.sql("CREATE TABLE dbg_cat.ws.rl AS SELECT id AS k, id * 10 AS v FROM range(0, 20)")
    spark.sql("EXPLAIN EXTENDED UPDATE dbg_cat.ws.rl SET v = v + 1 WHERE k % 2 = 0")
      .collect().foreach(r => println("[plan] " + r.getString(0)))
    spark.stop()
  }
}
