package graft

import graft.sources.catalog.GraftCatalog
import org.apache.spark.sql.functions._

/** The V2 TableCatalog: namespace/table discovery over the corpus directory,
  * native scan machinery through the catalog route, and read-only DDL.
  */
class CatalogSpec extends SparkSpec {

  private def mount(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root", "/root/testdata")
  }

  test("namespaces are the scale-factor directories; tables are the parquet files") {
    mount()
    // SHOW NAMESPACES backtick-quotes names containing dots
    val ns = spark.sql("SHOW NAMESPACES IN graft_cat").collect()
      .map(_.getString(0).stripPrefix("`").stripSuffix("`")).toSet
    assert(ns.contains("sf0.001") && ns.contains("sf0.01"), ns)
    val tables = spark.sql("SHOW TABLES IN graft_cat.`sf0.001`")
      .collect().map(_.getString(1)).toSet
    assert(Set("lineitem", "orders", "customer", "documents", "embeddings").subsetOf(tables), tables)
  }

  test("catalog scans keep the native parquet read stack: pushdown + pruning") {
    mount()
    val df = spark.sql(
      "SELECT o_orderkey FROM graft_cat.`sf0.001`.orders WHERE o_orderkey = 42")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("o_orderkey"), p)
    assert(df.count() <= 1)
    // pruning: only the requested column reaches ReadSchema
    assert(!p.contains("o_totalprice"), p)
  }

  test("three-part-name joins resolve and match path-based reads") {
    mount()
    val viaCatalog = spark.sql(
      """SELECT count(*) AS n FROM graft_cat.`sf0.001`.orders o
        |JOIN graft_cat.`sf0.001`.customer c ON o.o_custkey = c.c_custkey""".stripMargin)
      .collect()(0).getLong(0)
    val viaPath = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .count()
    assert(viaCatalog === viaPath && viaCatalog > 0)
  }

  test("DDL against the corpus catalog is refused (read-only contract)") {
    mount()
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graft_cat.`sf0.001`.orders")
    }
    assert(e.getMessage.toLowerCase.contains("read-only"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cat.`sf0.001`.scratch (x INT)")
    }
    assert(e2.getMessage.toLowerCase.contains("read-only"), e2.getMessage)
  }

  test("unknown namespace and table fail with the standard analysis errors") {
    mount()
    val e = intercept[Exception] { spark.sql("SHOW TABLES IN graft_cat.`nope`").collect() }
    assert(e.getMessage.contains("nope"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.`sf0.001`.missing").collect()
    }
    assert(e2.getMessage.contains("missing"), e2.getMessage)
  }
}
