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

  private def localFs =
    FileSystem.get(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)

  test("ENOENT maps to FileNotFoundException on open and getFileStatus") {
    // Error-channel parity with the reference's errno mapping
    // (CephRgwFileSystem.java:492-494: ENOENT → FileNotFoundException).
    val fs = localFs
    val dir = Files.createTempDirectory("graft_enoent").toString
    val missing = new Path(s"$dir/does_not_exist")
    try {
      intercept[java.io.FileNotFoundException] { fs.open(missing).close() }
      intercept[java.io.FileNotFoundException] { fs.getFileStatus(missing) }
      // and the Spark-level surface: a read of a missing path fails analytically
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.read.parquet(s"$dir/does_not_exist").count()
      }
    } finally fs.delete(new Path(dir), true)
  }

  test("non-recursive delete of a non-empty directory throws") {
    // Parity with the reference's ENOTEMPTY mapping
    // (CephRgwFileSystem.java:531-533 → PathIsNotEmptyDirectoryException).
    val fs = localFs
    val dir = new Path(Files.createTempDirectory("graft_notempty").toString)
    val os = fs.create(new Path(dir, "child.bin"))
    os.write(Array.fill[Byte](4)(7)); os.close()
    try {
      intercept[java.io.IOException] { fs.delete(dir, false) }
      assert(fs.exists(dir)) // the failed delete must not partially remove
    } finally fs.delete(dir, true)
  }

  test("append mode adds new files; existing bytes are never appended to") {
    // The reference throws on append (CephRgwFileSystem.java:304-308 —
    // RGW objects are immutable). The Spark-idiomatic analogue: mode("append")
    // commits NEW immutable files into the directory; no existing file is
    // reopened or grown.
    val fs = localFs
    val dir = Files.createTempDirectory("graft_append").toString
    val out = s"$dir/docs"
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(5)
    docs.write.mode("overwrite").parquet(out)
    val before = fs.listStatus(new Path(out)).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime)).toMap
    docs.write.mode("append").parquet(out)
    val after = fs.listStatus(new Path(out)).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime)).toMap
    try {
      assert(after.size > before.size, "append must add files")
      before.foreach { case (name, meta) =>
        assert(after(name) === meta, s"append must not touch existing file $name")
      }
      assert(spark.read.parquet(out).count() === 10)
    } finally fs.delete(new Path(dir), true)
  }

  test("writes commit with FileOutputCommitter v2 and leave no _temporary") {
    // Rename-as-commit is the reference's most expensive op (S3A-style
    // copy-then-delete, CephRgwFileSystem.java:310-313); SURVEY §7 flags it.
    // Algorithm v2 commits task output directly to the destination — assert
    // the write succeeds under it and no _temporary scaffolding survives.
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.algorithm.version"
    val prev = hc.get(key)
    hc.set(key, "2")
    val fs = localFs
    val dir = Files.createTempDirectory("graft_commit").toString
    val out = s"$dir/docs"
    try {
      graft.sources.Tables.documents(spark, sfDir).limit(20)
        .write.mode("overwrite").parquet(out)
      val entries = fs.listStatus(new Path(out)).map(_.getPath.getName)
      assert(!entries.contains("_temporary"), entries.mkString(","))
      assert(spark.read.parquet(out).count() === 20)
    } finally {
      if (prev == null) hc.unset(key) else hc.set(key, prev)
      fs.delete(new Path(dir), true)
    }
  }

  test("FileStatus carries full metadata: owner, group, block size, mtime") {
    // Metadata parity with the reference's stat marshalling
    // (AbstractFileHandlerReceiver.java:27-31 packs length/mtime/owner/group/
    // blocksize); previously only length/isFile were asserted.
    val fs = localFs
    val dir = Files.createTempDirectory("graft_stat").toString
    val f = new Path(s"$dir/x.bin")
    val os = fs.create(f); os.write(Array.fill[Byte](64)(3)); os.close()
    try {
      val st = fs.getFileStatus(f)
      assert(st.getLen === 64)
      assert(st.getBlockSize > 0)
      assert(st.getModificationTime > 0)
      assert(st.getOwner != null && st.getOwner.nonEmpty)
      assert(st.getGroup != null && st.getGroup.nonEmpty)
      // listStatus must marshal the same stat for the same file
      val ls = fs.listStatus(new Path(dir)).filter(_.isFile).head
      assert(ls.getLen === st.getLen)
      assert(ls.getModificationTime === st.getModificationTime)
    } finally fs.delete(new Path(dir), true)
  }

  test("maxPartitionBytes drives scan parallelism (virtual-block-size analogue)") {
    // The reference's one real tuning knob: a 32 MiB virtual block size that
    // fixes splits-per-file (CephRgwFileSystem.java:112, injected at
    // AbstractFileHandlerReceiver.java:29). Spark's direct analogue is
    // spark.sql.files.maxPartitionBytes; assert it changes the scan task
    // count on a single parquet file exactly as a block size would.
    val fs = localFs
    val file = new Path(s"$sfDir/lineitem.parquet")
    val len = fs.getFileStatus(file).getLen
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "134217728") // default 128 MiB: one split
      val wide = spark.read.parquet(file.toString).rdd.getNumPartitions
      assert(wide === 1, s"single small file at 128MiB blocks must be 1 split, got $wide")
      spark.conf.set(key, "16384") // 16 KiB blocks: ceil(len / 16k) splits
      val narrow = spark.read.parquet(file.toString).rdd.getNumPartitions
      val expected = ((len + 16383) / 16384).toInt
      assert(narrow === expected, s"expected $expected splits of $len bytes, got $narrow")
    } finally spark.conf.set(key, prev)
  }

  test("selective predicate skips parquet row groups: scan metrics collapse vs full scan") {
    // Metric-level proof of the reference's whole purpose — reading only the
    // needed byte ranges (positional reads, CephRgwInputStream.java:103-120).
    // PlanSpec already asserts PushedFilters REACH the scan; this asserts
    // the filter actually SKIPS row groups: the scan node's numOutputRows
    // under a tight range predicate on a sorted column must be a small
    // fraction of the table, because disjoint row-group min/max stats
    // eliminate the rest before any bytes decode. AQE is disabled so the
    // plain physical plan exposes the scan node's metrics directly.
    val dir = Files.createTempDirectory("graft_rowgroup").toString
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    try {
      // one sorted file, tiny row groups (64 KiB) → many groups with
      // disjoint id ranges; 200k rows ≫ rows-per-group
      spark.range(0, 200000).toDF("id")
        .withColumn("payload", org.apache.spark.sql.functions.md5(col("id").cast("string")))
        .coalesce(1).sortWithinPartitions("id")
        .write.mode("overwrite").option("parquet.block.size", "65536").parquet(dir)
      spark.conf.set(aqeKey, "false")
      def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        val scans = df.queryExecution.executedPlan.collectLeaves()
        val m = scans.head.metrics("numOutputRows")
        m.value
      }
      val full = scanRows(spark.read.parquet(dir).select("id", "payload"))
      assert(full === 200000L, s"full scan must read everything, got $full")
      val selective = scanRows(
        spark.read.parquet(dir).where(col("id") >= 100000L && col("id") < 100100L))
      // a no-skip scan would also output 200k rows from the scan node and
      // filter afterwards; row-group elimination keeps it to the handful of
      // groups whose [min,max] intersect the range
      assert(selective < 20000L,
        s"row groups not skipped: scan emitted $selective of 200000 rows")
      assert(selective >= 100L, s"scan lost matching rows: $selective")
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      localFs.delete(new Path(dir), true)
    }
  }

  test("z-order layout prunes row groups on the NON-leading dimension where linear sort cannot") {
    // The layout decision behind q243: a linear sort gives min-max pruning
    // on its leading column only — a predicate on the second dimension
    // reads everything. Z-ordering bounds BOTH dimensions per curve range,
    // so the same tiny row groups skip for either dimension. This is the
    // difference between scanning 3% and 100% of a 100 TB table for a
    // 2-D slice query.
    val dir = Files.createTempDirectory("graft_zorder").toString
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    try {
      // 300k points on a 1024x1024 plane, both coords hash-scattered so
      // neither is correlated with the other or with insertion order
      val pts = spark.range(0, 300000)
        .selectExpr("pmod(hash(id), 1024) AS p", "pmod(hash(id * 7 + 3), 1024) AS s")
        .selectExpr("p", "s",
          graft.operators.DataOps.zInterleaveSpark("p", "s", 10) + " AS z")
      pts.coalesce(1).sortWithinPartitions("p") // linear layout: leading col p
        .write.mode("overwrite").option("parquet.block.size", "65536")
        .parquet(s"$dir/linear")
      pts.coalesce(1).sortWithinPartitions("z") // z-order layout
        .write.mode("overwrite").option("parquet.block.size", "65536")
        .parquet(s"$dir/zorder")
      spark.conf.set(aqeKey, "false")
      def scanRows(layout: String): Long = {
        val df = spark.read.parquet(s"$dir/$layout")
          .where(col("s") >= 100 && col("s") < 132) // non-leading dim, ~3%
        df.collect()
        df.queryExecution.executedPlan.collectLeaves().head.metrics("numOutputRows").value
      }
      val linear = scanRows("linear")
      val zorder = scanRows("zorder")
      assert(linear === 300000L,
        s"linear layout cannot skip on the non-leading dim, got $linear")
      assert(zorder < 150000L,
        s"z-order failed to skip row groups: scanned $zorder of 300000")
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      localFs.delete(new Path(dir), true)
    }
  }

  test("small-file compaction: many-file table rewrites to a target file count losslessly") {
    // The lake-maintenance op the reference's FS surface exists to serve:
    // a fragmented table (one file per task) compacts to ceil(bytes/target)
    // files via a shuffle-free coalesce write, with nothing lost. At 100 TB
    // this is the same two-step (list+stat to size, coalesce to rewrite) per
    // partition directory.
    val dir = Files.createTempDirectory("graft_compact").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.repartition(64).write.mode("overwrite").parquet(s"$dir/frag")
    val fs = FileSystem.get(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String) =
      fs.listStatus(new Path(p)).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val frag = dataFiles(s"$dir/frag")
    assert(frag.length > 16, s"expected a fragmented table, got ${frag.length} files")
    val totalBytes = frag.map(_.getLen).sum
    val target = 256L * 1024 // 256 KiB target files
    val nOut = math.max(1, ((totalBytes + target - 1) / target).toInt)
    spark.read.parquet(s"$dir/frag").coalesce(nOut)
      .write.mode("overwrite").parquet(s"$dir/compact")
    assert(dataFiles(s"$dir/compact").length === nOut)
    val before = docs.agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    val after = spark.read.parquet(s"$dir/compact")
      .agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    assert(before === after)
  }

  test("compression codec round-trip: snappy, zstd, gzip, none all read back losslessly") {
    val dir = Files.createTempDirectory("graft_codec").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val expected = docs.agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    Seq("snappy", "zstd", "gzip", "none").foreach { codec =>
      val out = s"$dir/$codec"
      docs.write.mode("overwrite").option("compression", codec).parquet(out)
      val got = spark.read.parquet(out)
        .agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
      assert(got === expected, s"codec $codec corrupted the round trip")
    }
  }

  test("range-partitioned write layout: per-file key ranges are disjoint and lossless") {
    // Sort-clustered layout — the data-skipping prerequisite: writing with
    // repartitionByRange + sortWithinPartitions must yield files whose
    // [min, max] key ranges do not overlap, so a reader (or parquet
    // row-group stats pruning) can skip whole files for a key predicate.
    // The invariant holds for ANY sampled range boundaries, so the test is
    // deterministic even though RangePartitioner samples its splits.
    val dir = Files.createTempDirectory("graft_range").toString
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    li.repartitionByRange(4, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/ranged")
    // ISO timestamp strings sort chronologically, and Row accessors stay
    // engine-version-proof (Spark 4 returns java.time values for timestamps)
    val perFile = spark.read.parquet(s"$dir/ranged")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate")).cast("string").as("lo"),
        max(col("l_shipdate")).cast("string").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length >= 2, "need multiple files to prove disjointness")
    val ranges = perFile.map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2")
      case _ =>
    }
    assert(perFile.map(_.getLong(3)).sum === li.count())
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    // The reference's recursive-delete-then-write surface, refined: static
    // overwrite mode deletes the WHOLE table root; dynamic mode deletes only
    // partitions present in the incoming batch — the difference between
    // reloading one day and truncating a year at 100 TB.
    val dir = Files.createTempDirectory("graft_dynpart").toString
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "dynamic")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
      val before = spark.read.parquet(dir).groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // overwrite ONE partition with a single marker row
      val one = docs.where(col("lang") === "en").limit(1)
      one.write.partitionBy("lang").mode("overwrite").parquet(dir)
      val after = spark.read.parquet(dir).groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after("en") === 1L, s"en partition should hold only the marker, got $after")
      (before.keySet - "en").foreach { l =>
        assert(after(l) === before(l), s"untouched partition $l was clobbered")
      }
    } finally spark.conf.set(key, prev)
  }

  test("text source round-trips line-oriented corpora") {
    // spark.read.text / write.text — the line-per-record surface a raw-crawl
    // ingest uses before any schema exists (the corpus has no newlines in
    // text, so lines == documents here; binary payloads go via binaryFile).
    val dir = Files.createTempDirectory("graft_text").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .orderBy("doc_id").select(col("text"))
    docs.write.mode("overwrite").text(s"$dir/lines")
    val back = spark.read.text(s"$dir/lines")
    assert(back.count() === docs.count())
    val a = docs.collect().map(_.getString(0)).sorted
    val b = back.collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("binaryFile source reads written blobs with path, length, and content intact") {
    // The multimodal-ingest twin of the reference's opaque-byte read path
    // (CephRgwInputStream): raw files on the FS surface become (path,
    // modificationTime, length, content) rows via the binaryFile source.
    val dir = Files.createTempDirectory("graft_blob").toString
    val fs = localFs
    val payloads = (0 until 5).map { i =>
      s"blob_$i.bin" -> Array.tabulate[Byte](100 + i)(j => ((i * 31 + j) % 127).toByte)
    }
    payloads.foreach { case (name, bytes) =>
      val os = fs.create(new Path(s"$dir/$name")); os.write(bytes); os.close()
    }
    try {
      val rows = spark.read.format("binaryFile").load(dir)
        .select(col("path"), col("length"), col("content")).collect()
      assert(rows.length === payloads.length)
      val byName = rows.map { r =>
        r.getString(0).split('/').last -> ((r.getLong(1), r.getAs[Array[Byte]](2)))
      }.toMap
      payloads.foreach { case (name, bytes) =>
        val (len, content) = byName(name)
        assert(len === bytes.length)
        assert(content.toSeq === bytes.toSeq)
      }
    } finally fs.delete(new Path(dir), true)
  }

  test("mergeSchema unifies evolved parquet schemas; old files read the new column as null") {
    // Schema evolution is a data-lake contract the FileSystem reference
    // delegates to the format layer: files written before a column existed
    // must stay readable after it is added. Spark's parquet mergeSchema
    // resolves the union schema across footers.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .write.parquet(s"$dir/v1")
      Seq((3L, "c", 9.5), (4L, "d", 7.25)).toDF("id", "name", "score")
        .write.parquet(s"$dir/v2")
      val unified = spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/v1", s"$dir/v2")
      assert(unified.columns.sorted.toSeq === Seq("id", "name", "score"))
      val rows = unified.orderBy("id").collect()
      assert(rows.length === 4)
      assert(rows.take(2).forall(_.isNullAt(unified.columns.indexOf("score"))),
        "pre-evolution files must surface the new column as null")
      assert(rows(2).getDouble(unified.columns.indexOf("score")) === 9.5)
      // without mergeSchema one footer's schema wins, but the read still
      // succeeds over both file sets — no poisoned-directory failure mode
      assert(spark.read.parquet(s"$dir/v1", s"$dir/v2").count() === 4)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
