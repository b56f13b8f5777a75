package graft

import graft.sources.v2.MemSink
import org.apache.spark.sql.functions._

/** The DSv2 write path: two-phase commit protocol (task messages → atomic
  * job commit), truncate-for-overwrite, read-back with pruning, and the
  * property the reference's rename-based commit can't give — a failed job
  * leaves NO partial table.
  */
class MemSinkSpec extends SparkSpec {

  private val fmt = classOf[MemSink].getName

  private def write(table: String, mode: String, n: Int): Unit =
    spark.range(n).select(col("id"), (col("id") * 2).as("dbl"))
      .repartition(4)
      .write.format(fmt).option("name", table).mode(mode).save()

  test("commit makes all task outputs visible atomically; overwrite truncates") {
    write("t_basic", "overwrite", 100)
    val back = spark.read.format(fmt).option("name", "t_basic").load()
    assert(back.count() === 100)
    assert(back.agg(sum("dbl")).collect()(0).getLong(0) === (0L until 100).map(_ * 2).sum)
    write("t_basic", "overwrite", 10) // truncate path: old rows gone
    assert(spark.read.format(fmt).option("name", "t_basic").load().count() === 10)
  }

  test("append accumulates across jobs") {
    write("t_app", "overwrite", 5)
    write("t_app", "append", 7)
    assert(spark.read.format(fmt).option("name", "t_app").load().count() === 12)
  }

  test("column pruning reaches the mem scan") {
    write("t_prune", "overwrite", 50)
    val df = spark.read.format(fmt).option("name", "t_prune").load().select("dbl")
    assert(df.schema.fieldNames.toSeq === Seq("dbl"))
    assert(df.agg(max("dbl")).collect()(0).getLong(0) === 98L)
  }

  test("failed job leaves NO partial table (job-level abort cleans up)") {
    write("t_abort", "overwrite", 20)
    val abortsBefore = MemSink.aborts.get()
    System.setProperty("graft.memsink.failPartition", "2")
    try {
      intercept[Exception] { write("t_abort", "overwrite", 1000) }
    } finally System.clearProperty("graft.memsink.failPartition")
    // the committed state is exactly the pre-failure table: no torn write
    val back = spark.read.format(fmt).option("name", "t_abort").load()
    assert(back.count() === 20)
    assert(MemSink.aborts.get() > abortsBefore) // cleanup hook actually ran
  }
}
