package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Storage-parity operator: exercises the reference's entire FileSystem
  * surface through Spark — partitioned create/mkdirs/write
  * (`CephRgwFileSystem.create/mkdirs`, reference `:216-233,398-430`),
  * list/stat/open/pread on read-back (`:374-386,432-439,191-200`), and
  * overwrite (recursive delete, `:315-330`) — then proves the round trip
  * lossless by aggregating the re-read copy. The oracle computes the same
  * aggregate over the original table, so any corruption breaks the hash.
  */
object FsParity {

  /** Per-JVM unique scratch root: concurrent Verify/Bench runs (or two
    * drivers on one host) each get their own directory, so mode("overwrite")
    * never races across processes. Within one JVM the path is stable, so a
    * query re-run overwrites its own output — the intended semantics.
    */
  private lazy val scratchRoot: String =
    java.nio.file.Files.createTempDirectory("graft_fsparity_").toString

  def q45FsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"$scratchRoot/fs_roundtrip"
    Tables.documents(spark, dir)
      .repartition(col("lang")) // one file per partition dir, not one per task
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    spark.read.parquet(out)
      .agg(
        count(lit(1)).as("rows_cnt"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("langs"),
        countDistinct(col("doc_id")).as("doc_ids"))
  }

  val q45Oracle: String =
    """SELECT count(*) AS rows_cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT lang) AS langs, count(DISTINCT doc_id) AS doc_ids
      |FROM documents""".stripMargin

  /** Source/sink format sweep: write documents as CSV, JSON, and ORC, read
    * each back (CSV with an explicit schema — schema-on-read), and prove all
    * three round trips lossless with per-format aggregates. Parquet is
    * covered by q45.
    */
  def q48FormatsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = s"$scratchRoot/formats"
    val docs = Tables.documents(spark, dir)
    // RFC-4180-style CSV (escape = quote char) + multiLine read so documents
    // whose text contains newlines/quotes survive the round trip — the
    // lossless claim must not depend on the corpus happening to be newline-free.
    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    docs.write.mode("overwrite").orc(s"$base/orc")
    val reread = Seq(
      "csv" -> spark.read.schema(docs.schema).option("header", "true")
        .option("multiLine", "true").option("escape", "\"").csv(s"$base/csv"),
      "json" -> spark.read.schema(docs.schema).json(s"$base/json"),
      "orc" -> spark.read.orc(s"$base/orc"))
    reread.map { case (fmt, df) =>
      df.agg(
        count(lit(1)).as("rows_cnt"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("langs"))
        .withColumn("format", lit(fmt))
        .select("format", "rows_cnt", "sum_chars", "langs")
    }.reduce(_ unionByName _).orderBy(col("format"))
  }

  val q48Oracle: String =
    """SELECT f AS format, count(*) AS rows_cnt,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, count(DISTINCT lang) AS langs
      |FROM documents, (SELECT unnest(['csv', 'json', 'orc']) AS f)
      |GROUP BY f ORDER BY format""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q45_fs_roundtrip", q45FsRoundtrip, q45Oracle),
    GraftQuery.sql("q48_formats_roundtrip", q48FormatsRoundtrip, q48Oracle)
  )
}
