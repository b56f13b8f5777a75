package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus table loaders (schema-on-read from parquet footers).
  *
  * Mirrors the reference's read surface — `CephRgwFileSystem.open` /
  * `listStatus` / `getFileStatus` (`/root/reference/src/main/java/org/apache/
  * hadoop/fs/cephrgw/CephRgwFileSystem.java:191-200,374-386,432-439`) — through
  * Spark's `FileSourceScanExec`, which issues the same FileSystem calls per
  * split. Filters and projections applied downstream push into these scans
  * (PushedFilters / ReadSchema), so loaders stay bare `spark.read.parquet`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright; read it as a nanosecond long and truncate to Spark's
    * native microsecond TimestampType. DuckDB's `CAST(ts AS TIMESTAMP)`
    * truncates ns→µs identically, so oracle SQL uses that cast.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = eventsRaw(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
