package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** FS-surface parity: every FileSystem operation the reference implements
  * (SURVEY.md §2a ops 2–13), exercised through Spark + the Hadoop FS API the
  * reference plugs into: mkdirs/create via partitioned write, list/stat/open/
  * pread via read-back, recursive delete via overwrite, and explicit
  * FileSystem calls for the rest.
  */
class FsParitySpec extends SparkSpec {

  test("partitioned write → list → stat → read → overwrite → delete round-trip") {
    val dir = Files.createTempDirectory("graft_fs").toString
    val out = s"$dir/docs"
    val docs = graft.sources.Tables.documents(spark, sfDir)

    // create + mkdirs (partition dirs) + write
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    // listStatus: partition discovery sees every lang dir
    val fs = FileSystem.get(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val langDirs = fs.listStatus(new Path(out)).filter(_.isDirectory).map(_.getPath.getName)
    val expectedLangs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langDirs.count(_.startsWith("lang=")) === expectedLangs.size)

    // getFileStatus: stat a written file
    val aFile = fs.listStatus(new Path(out + "/" + langDirs.find(_.startsWith("lang=")).get))
      .filter(_.isFile).head
    assert(aFile.getLen > 0)
    assert(fs.getFileStatus(aFile.getPath).isFile)

    // open + read-back: full equality incl. partition-column recovery
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val origSum = docs.agg(sum("n_chars")).head.getLong(0)
    assert(back.agg(sum("n_chars")).head.getLong(0) === origSum)

    // partition pruning on read: only one lang dir scanned
    val pruned = back.where(col("lang") === expectedLangs.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() === docs.where(col("lang") === expectedLangs.head).count())
    assert(scan.contains("PartitionFilters"), scan)

    // overwrite = recursive delete + rewrite
    docs.limit(10).write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() === 10)

    // recursive delete (reference op #10)
    assert(fs.delete(new Path(dir), true))
    assert(!fs.exists(new Path(dir)))
  }

  test("seek-past-EOF errors (the contract the reference violates by clamping)") {
    val dir = Files.createTempDirectory("graft_seek").toString
    val f = new Path(s"$dir/x.bin")
    val fs = FileSystem.get(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val os = fs.create(f)
    os.write(Array.fill[Byte](16)(1)); os.close()
    val is = fs.open(f)
    try {
      intercept[java.io.EOFException] { is.seek(1000); is.read() }
    } finally { is.close(); fs.delete(new Path(dir), true) }
  }
}
