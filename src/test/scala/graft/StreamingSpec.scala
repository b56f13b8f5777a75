package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Structured Streaming specs driven through MemoryStream: windowed counts
  * with watermark finalization, streaming dedup, and custom stateful
  * sessionization via flatMapGroupsWithState.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts finalizes on-time windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:05:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // advance watermark far past the first window, then send a too-late event
      mem.addData(Event(3, ts("2024-01-01 02:00:00"), 1, "click", 3.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts("2024-01-01 00:02:00"), 1, "click", 99.0)) // late: dropped
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select(col("w_start").cast("string"), col("cnt")).as[(String, Long)].collect().toMap
      assert(rows.get("2024-01-01 00:00:00").contains(2L))
      assert(!rows.contains("2024-01-01 00:02:00"))
    } finally q.stop()
  }

  test("dedupStream keeps first event per (user, type) within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:02:00"), 1, "click", 2.0), // dup (user,type)
        Event(3, ts("2024-01-01 00:03:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("dd").select("event_id").as[Long].collect().toSet
      assert(got === Set(1L, 3L))
    } finally q.stop()
  }

  test("file-source readStream processes the events table incrementally") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.limit(200).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(ev.schema).parquet(src)
    assert(stream.isStreaming)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("fileWc").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode windows finalize only past the watermark; with a finite
      // file batch nothing may emit yet — assert the query RUNS and state
      // machinery is active, then close it cleanly.
      assert(q.lastProgress != null && q.lastProgress.numInputRows >= 0)
      assert(q.isActive)
    } finally q.stop()
  }

  test("enrichStream joins each micro-batch against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamingOps.enrichStream(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:02:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 00:03:00"), 9, "click", 3.0)) // no dim row: dropped
      q.processAllAvailable()
      val got = spark.table("enr").select("event_id", "tier")
        .as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "gold", 2L -> "basic"))
    } finally q.stop()
  }

  test("clickToPurchase stream-stream join matches within the interval only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingOps.clickToPurchase(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("cp").outputMode("append").start()
    try {
      clicks.addData(
        Event(10, ts("2024-01-01 00:00:00"), 1, "click", 0.0),
        Event(11, ts("2024-01-01 05:00:00"), 2, "click", 0.0)) // 5h before purchase: out of window
      purchases.addData(
        Event(20, ts("2024-01-01 00:30:00"), 1, "purchase", 9.0),
        Event(21, ts("2024-01-01 12:00:00"), 2, "purchase", 5.0))
      q.processAllAvailable()
      val got = spark.table("cp").select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((20L, 10L)))
    } finally q.stop()
  }

  test("clickToPurchaseOuter emits unmatched purchases with null click after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingOps.clickToPurchaseOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("cpo").outputMode("append").start()
    try {
      clicks.addData(Event(10, ts("2024-01-01 00:00:00"), 1, "click", 0.0))
      purchases.addData(
        Event(20, ts("2024-01-01 00:30:00"), 1, "purchase", 9.0), // matched
        Event(21, ts("2024-01-01 00:45:00"), 2, "purchase", 5.0)) // no click ever
      q.processAllAvailable()
      // advance BOTH watermarks far past purchase 21's horizon so the outer
      // side finalizes and emits its null-matched row
      clicks.addData(Event(12, ts("2024-01-02 12:00:00"), 9, "click", 0.0))
      purchases.addData(Event(22, ts("2024-01-02 12:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("cpo")
        .select(col("purchase_id"), col("click_id")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got(20L) === Some(10L))
      assert(got.get(21L) === Some(None), s"unmatched purchase must emit null-click row: $got")
    } finally q.stop()
  }

  test("asofMatch enriches each purchase with the latest preceding click across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.asofMatch(mem.toDS())
      .writeStream.format("memory").queryName("am").outputMode("append").start()
    try {
      // batch 1: click then purchase (same batch), purchase with no click (user 2)
      mem.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 0.0),
        Event(2, ts("2024-01-01 00:30:00"), 1, "purchase", 9.0),
        Event(3, ts("2024-01-01 00:30:00"), 2, "purchase", 4.0))
      q.processAllAvailable()
      // batch 2: newer click, then a later purchase must pick the NEW click
      mem.addData(Event(4, ts("2024-01-01 01:00:00"), 1, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts("2024-01-01 01:30:00"), 1, "purchase", 7.0))
      q.processAllAvailable()
      val got = spark.table("am").as[StreamingOps.AsofMatch].collect()
        .map(m => m.p_id -> m.asof_click_id).toMap
      assert(got === Map(2L -> Some(1L), 3L -> None, 5L -> Some(4L)))
    } finally q.stop()
  }

  test("sessionize emits closed sessions with correct aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("ss").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0))
      q.processAllAvailable()
      // a gap > 30 min closes the first session
      mem.addData(Event(3, ts("2024-01-01 01:00:00"), 7, "click", 5.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts("2024-01-01 03:00:00"), 7, "click", 7.0))
      q.processAllAvailable()
      val sessions = spark.table("ss").as[StreamingOps.UserSession].collect()
      assert(sessions.exists(s =>
        s.user_id == 7 && s.n_events == 2 && math.abs(s.sum_value - 3.0) < 1e-9))
    } finally q.stop()
  }

  test("curateStream filters failing docs and dedups content within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.StreamDoc]
    val q = StreamingOps.curateStream(mem.toDF())
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    val good = "the quick brown fox jumps over the lazy dog while the calm cat " +
      "naps under the warm sun near the old oak tree today" // 24 clean tokens
    try {
      mem.addData(
        StreamingOps.StreamDoc(1, ts("2024-01-01 00:01:00"), good, "en"),
        StreamingOps.StreamDoc(2, ts("2024-01-01 00:02:00"), good, "en"), // dup content
        StreamingOps.StreamDoc(3, ts("2024-01-01 00:03:00"), "too short", "en"),
        StreamingOps.StreamDoc(4, ts("2024-01-01 00:04:00"),
          ("@#$%^&*()!! " * 30).trim, "en")) // symbol-heavy
      q.processAllAvailable()
      val kept = spark.table("cs").select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L))
    } finally q.stop()
  }

  test("latestState keeps the per-key winner across batches and ignores older late events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.latestState(mem.toDS())
      .writeStream.format("memory").queryName("ls").outputMode("update").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:05:00"), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 00:03:00"), 1, "click", 99.0)) // late, older: ignored
      q.processAllAvailable()
      mem.addData(Event(4, ts("2024-01-01 00:09:00"), 1, "click", 4.0))
      q.processAllAvailable()
      // update mode: the LAST row per key in the sink is the current state
      val last = spark.table("ls").as[StreamingOps.LatestState].collect().last
      assert(last.value === 4.0)
      val afterLate = spark.table("ls").as[StreamingOps.LatestState].collect()
        .count(_.value == 99.0)
      assert(afterLate === 0, "an older late event must never win")
    } finally q.stop()
  }

  test("spendTracker accumulates per-user state across batches via transformWithState (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = StreamingOps.spendTracker(mem.toDS(), threshold = 100.0)
      .writeStream.format("memory").queryName("spend").outputMode("update").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "purchase", 60.0),
        Event(2, ts("2024-01-01 00:02:00"), 2, "purchase", 10.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 00:05:00"), 1, "purchase", 50.0))
      q.processAllAvailable()
      val rows = spark.table("spend").as[StreamingOps.SpendUpdate].collect()
      val u1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
      assert(u1.n_events === 2 && u1.total_value === 110.0 && u1.big_spender,
        rows.mkString("; "))
      val u1First = rows.filter(_.user_id == 1L).minBy(_.n_events)
      assert(!u1First.big_spender, "threshold must not trip at 60.0")
      val u2 = rows.filter(_.user_id == 2L).maxBy(_.n_events)
      assert(u2.n_events === 1 && u2.total_value === 10.0 && !u2.big_spender)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("foreachBatch upserts each micro-batch into a parquet serving table") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_serve").toString
    val mem = MemoryStream[Event]
    val q = StreamingOps.latestState(mem.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingOps.LatestState], _: Long) =>
        // merge semantics: new keys insert, existing keys take the batch row
        val incoming = batch.toDF()
        val existing =
          try spark.read.parquet(dir).where(col("user_id").isNotNull)
          catch { case _: Throwable => spark.emptyDataFrame }
        val merged =
          if (existing.isEmpty) incoming
          else existing.join(incoming.select(col("user_id").as("u"), col("event_type").as("e")),
              col("user_id") === col("u") && col("event_type") === col("e"), "left_anti")
            .unionByName(incoming)
        val out = merged.collect() // materialize BEFORE overwriting the source dir
        spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq), incoming.schema)
          .write.mode("overwrite").parquet(dir)
        ()
      }
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:02:00"), 2, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 00:07:00"), 1, "click", 7.0))
      q.processAllAvailable()
      val served = spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
      assert(served((1L, "click")) === 7.0)
      assert(served((2L, "view")) === 5.0)
    } finally q.stop()
  }

  test("streaming query resumes from its checkpoint with state intact") {
    // Exactly-once operational contract: stop a stateful query, restart it
    // against the SAME checkpoint dir, and accumulated state (the dedup key
    // set here) must survive — the recovery path every production stream
    // leans on after executor loss or deploy.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val mem = MemoryStream[Event]
    // memory sinks refuse recovery; the parquet sink is the durable path
    def start() = StreamingOps.dedupStream(mem.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      mem.addData(Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start() // same checkpoint: dedup state must persist across restart
    try {
      mem.addData(
        Event(2, ts("2024-01-01 00:02:00"), 1, "click", 2.0), // dup of pre-restart key
        Event(3, ts("2024-01-01 00:03:00"), 2, "view", 3.0))
      q2.processAllAvailable()
      val got = spark.read.parquet(out).select("event_id").as[Long].collect().toSet
      assert(got.contains(1L) && got.contains(3L) && !got.contains(2L),
        s"state lost across restart (sink rows: $got)")
    } finally q2.stop()
  }

  test("nearDupStream drops LSH near-dups across batches via the persistent band index, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft_nd_idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft_nd_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nd_ckpt").toString
    val baseA = "the quick brown fox jumps over the lazy dog while the calm cat " +
      "naps under the warm sun near the old oak tree in the quiet garden today"
    val baseB = "distributed query engines partition shuffle and aggregate massive " +
      "datasets across many executor nodes with columnar storage and code generation"
    val baseC = "streaming pipelines watermark late events and checkpoint operator " +
      "state so failures recover exactly once without duplicating any output rows"
    def doc(id: Long, text: String) =
      StreamingOps.StreamDoc(id, ts("2024-01-01 00:01:00"), text, "en")
    val mem = MemoryStream[StreamingOps.StreamDoc]
    val q = StreamingOps.nearDupStream(mem.toDF(), idx, out, ckpt)
    try {
      // batch 0: 2 ≈ 1 (suffix tweak → high jaccard), 3 distinct
      mem.addData(doc(1, baseA), doc(2, baseA + " extra"), doc(3, baseB))
      q.processAllAvailable()
      // batch 1: 4 ≈ 1 (must hit the INDEX, not in-batch), 5 distinct
      mem.addData(doc(4, baseA + " more"), doc(5, baseC))
      q.processAllAvailable()
      val survivors = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamingOps.StreamDoc]].schema)
        .parquet(new java.io.File(out).listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
        .select("doc_id").as[Long].collect().toSet
      assert(survivors === Set(1L, 3L, 5L), s"got $survivors")
      // the drops are REAL near-dups: exact Jaccard of dropped vs keeper ≥ 0.7
      val shex = Seq((1L, baseA), (2L, baseA + " extra"), (4L, baseA + " more"))
        .toDF("doc_id", "text").selectExpr("doc_id", "shingle_hashes(text, 20) AS sh")
      val j = shex.as("a").crossJoin(shex.as("b"))
        .where(col("a.doc_id") === 1 && col("b.doc_id") > 1)
        .selectExpr("sorted_intersect_count(a.sh, b.sh) / " +
          "(size(a.sh) + size(b.sh) - sorted_intersect_count(a.sh, b.sh)) AS j")
        .as[Double].collect()
      assert(j.forall(_ >= 0.7), s"test fixtures not near-dups: ${j.toList}")
      // replay idempotence: re-running a committed batch against the (now
      // mutated) index reproduces the same survivors — self-hits excluded —
      // AND leaves the index row set unchanged (the replayed batch
      // OVERWRITES its own batch_1 segment instead of appending a
      // duplicate copy, the crash-redelivery case)
      val idxSchema = "doc_id LONG, band_idx INT, bkey STRING"
      def idxRows() = spark.read.schema(idxSchema)
        .option("recursiveFileLookup", "true").parquet(idx).count()
      val before = idxRows()
      val replay = graft.operators.Dedup.nearDupAgainstIndex(
        Seq(doc(4, baseA + " more"), doc(5, baseC)).toDS().toDF(), idx, batchId = 1L)
      assert(replay.select("doc_id").as[Long].collect().toSet === Set(5L))
      assert(idxRows() === before,
        s"replayed batch grew the index: $before -> ${idxRows()}")
    } finally q.stop()
  }

  test("band index compaction bounds segment count across many batches; drops survive compaction") {
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft_ndc_idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ndc_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ndc_ckpt").toString
    val baseA = "the quick brown fox jumps over the lazy dog while the calm cat " +
      "naps under the warm sun near the old oak tree in the quiet garden today"
    // 7 further mutually-distinct texts for batches 1..7
    def distinctText(i: Int) = s"batch $i corpus " + (0 until 24)
      .map(j => s"token${i}_$j").mkString(" ")
    def doc(id: Long, text: String) =
      StreamingOps.StreamDoc(id, ts("2024-01-01 00:01:00"), text, "en")
    val mem = MemoryStream[StreamingOps.StreamDoc]
    val q = StreamingOps.nearDupStream(mem.toDF(), idx, out, ckpt)
    def segs() = new java.io.File(idx).listFiles().toIndexedSeq
      .filter(f => f.isDirectory && (f.getName.startsWith("batch_") || f.getName.startsWith("compacted_")))
      .map(_.getName)
    try {
      mem.addData(doc(1, baseA)); q.processAllAvailable()
      (1 to 6).foreach { i =>
        mem.addData(doc(10L + i, distinctText(i))); q.processAllAvailable()
      }
      // 7 batches in: without compaction there'd be 7 segment dirs
      val afterSeven = segs()
      assert(afterSeven.size <= graft.operators.Dedup.CompactEvery,
        s"index segments unbounded: $afterSeven")
      assert(afterSeven.exists(_.startsWith("compacted_")),
        s"no compacted segment present: $afterSeven")
      // batch 7: a near-dup of the batch-0 keeper (doc 1) — its bands now
      // live only in the compacted segment; it must still drop
      mem.addData(doc(99, baseA + " tail"), doc(100, distinctText(7)))
      q.processAllAvailable()
      val last = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamingOps.StreamDoc]].schema)
        .parquet(s"$out/batch_7").select("doc_id").as[Long].collect().toSet
      assert(last === Set(100L), s"compacted index lost doc 1's bands: $last")
      // index rows are exactly 16 bands per surviving doc, no replay bloat
      val rows = spark.read.schema("doc_id LONG, band_idx INT, bkey STRING")
        .option("recursiveFileLookup", "true").parquet(idx)
      assert(rows.count() === 16L * 8, s"index rows: ${rows.count()}")
      assert(rows.distinct().count() === rows.count(), "duplicate index rows")
    } finally q.stop()
  }

  test("ivfUpsertStream: streaming-maintained vector index serves probes bit-identical to the in-flight ANN") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_ckpt").toString
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "float_vec_dot(embedding, embedding) AS n2")
    val cents = Similarity.ivfCentroids(base).localCheckpoint()
    // the whole corpus arrives as 5 micro-batches (vec_id mod 5 slices)
    val slices = (0 until 5).map { r =>
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
        .where(col("vec_id") % 5 === r)
        .as[StreamingOps.StreamVec].collect().toSeq
    }
    val codesDir = java.nio.file.Files.createTempDirectory("graft_pq_codes").toString
    val codebook = base.where(col("vec_id") < 16)
      .selectExpr("vec_id AS cid", "embedding AS cent").localCheckpoint()
    val mem = MemoryStream[StreamingOps.StreamVec]
    val q = StreamingOps.ivfUpsertStream(mem.toDF(), cents, idx, ckpt,
      pq = Some((codebook, codesDir)))
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val persisted = graft.sources.SegmentedIndex
      .read(spark, idx, StreamingOps.IvfIndexSchema)
    assert(persisted.count() === 500L, "index must cover the full corpus")
    // PQ codes advanced in lockstep: every vector has 8 subspace codes,
    // and the streamed codes equal a batch re-encode bit-for-bit
    val persistedCodes = graft.sources.SegmentedIndex
      .read(spark, codesDir, StreamingOps.PqCodesSchema)
    assert(persistedCodes.count() === 500L * 8)
    val batchCodes = graft.operators.Similarity.pqCodes(
      graft.operators.Similarity.pqSubDistsAgainst(
        base.select(col("vec_id"), col("embedding")), codebook))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val streamedCodes = persistedCodes
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamedCodes === batchCodes, "streamed PQ codes diverge from batch encode")
    // 5 batches with compactEvery=4: segments stay bounded, compaction ran
    val segs = new java.io.File(idx).listFiles().toIndexedSeq
      .filter(f => f.isDirectory && (f.getName.startsWith("batch_") || f.getName.startsWith("compacted_")))
      .map(_.getName)
    assert(segs.size <= 4 && segs.exists(_.startsWith("compacted_")), s"segments: $segs")
    // probes from the persisted index == the in-flight q67 ANN, bit-for-bit
    val fromIndex = Similarity.ivfProbe(persisted).collect().map(_.toSeq).toSeq
    val inFlight = Similarity.q67IvfAnn(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromIndex === inFlight)
  }

  test("catalogAppendStream: exactly-once appends into a versioned catalog table; replay aborts cleanly") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_eo_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt").toString
    spark.conf.set("spark.sql.catalog.eo_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.eo_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS eo_cat.ws")
    spark.sql("CREATE TABLE eo_cat.ws.sink (k BIGINT)")
    def ks() = spark.sql("SELECT k FROM eo_cat.ws.sink")
      .collect().map(_.getLong(0)).toSet
    def versions() = new java.io.File(root, "ws/sink/_graft_versions")
      .listFiles().count(_.getName.matches("v\\d+\\.json"))
    val mem = MemoryStream[Long]
    val q = StreamingOps.catalogAppendStream(
      mem.toDF().selectExpr("value AS k"), "eo_cat.ws.sink", ckpt,
      analyzeCols = Seq("k"), bloomCols = Seq("k"))
    try {
      mem.addData(1L, 20L); q.processAllAvailable() // batch 0
      mem.addData(30L); q.processAllAvailable()    // batch 1
      assert(ks() === Set(1L, 20L, 30L))
      assert(versions() === 2)
    } finally q.stop()
    // streaming auto-ANALYZE: the ingest maintained zone maps batch by
    // batch, so a ranged read prunes WITHOUT any manual CALL analyze
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    assert(spark.sql("SELECT count(*) FROM eo_cat.ws.sink WHERE k >= 30")
      .collect()(0).getLong(0) === 1L)
    val prune = graft.sources.catalog.ZoneMapScan.lastPrune
    assert(prune.exists { case (kept, total) => kept < total },
      s"streamed table did not prune: $prune")
    // streaming bloom maintenance: a point probe for an ABSENT key is
    // bloom-pruned to zero files (ranges alone could not prove absence of
    // an interior value like 17)
    graft.sources.catalog.ZoneMapScan.lastPrune = None
    assert(spark.sql("SELECT count(*) FROM eo_cat.ws.sink WHERE k = 17").collect()(0)
      .getLong(0) === 0L)
    val bprune = graft.sources.catalog.ZoneMapScan.lastPrune
    assert(bprune.exists { case (kept, _) => kept === 0 },
      s"streamed blooms did not prune the absent-key probe: $bprune")
    // crash-redelivery: the sink re-runs batch 1 (same id, same rows) —
    // the manifest-recorded batch id makes it a clean no-op
    Seq(30L).toDF("k").writeTo("eo_cat.ws.sink")
      .option("graft.batch-id", "1").append()
    assert(ks() === Set(1L, 20L, 30L), s"replay duplicated rows: ${ks()}")
    assert(versions() === 2, "replay minted a new version")
    // the aborted replay left no orphan data files behind either
    val dataFiles = new java.io.File(root, "ws/sink").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val referenced = spark.sql("SELECT count(*) FROM eo_cat.ws.sink").collect()(0).getLong(0)
    assert(referenced === 3L)
    // a genuinely new batch still appends
    Seq(4L).toDF("k").writeTo("eo_cat.ws.sink")
      .option("graft.batch-id", "2").append()
    assert(ks() === Set(1L, 20L, 30L, 4L) && versions() === 3)
    assert(dataFiles >= 1)
  }

  test("mvMaintainStream: change-feed-driven MV equals full recompute at every batch boundary, across a kill/restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ckpt").toString
    spark.conf.set("spark.sql.catalog.mv_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.mv_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mv_cat.ws")
    spark.sql("DROP TABLE IF EXISTS mv_cat.ws.src")
    spark.sql("DROP TABLE IF EXISTS mv_cat.ws.mv")
    spark.sql("CREATE TABLE mv_cat.ws.src (g STRING, x DOUBLE)")
    spark.sql("CREATE TABLE mv_cat.ws.mv (g STRING, n BIGINT, s DECIMAL(28,4))")
    spark.sql("INSERT INTO mv_cat.ws.src VALUES ('a', 1.5), ('b', 2.25), ('a', 3.0)")
    def mvState(): Map[String, (Long, java.math.BigDecimal)] =
      StreamingOps.mvServe(spark, "mv_cat.ws.mv").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    def recompute(): Map[String, (Long, java.math.BigDecimal)] =
      spark.sql("""SELECT g, count(*) AS n, sum(CAST(x AS DECIMAL(28,4))) AS s
        FROM mv_cat.ws.src GROUP BY g""").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    def start() = StreamingOps.mvMaintainStream(
      StreamingOps.catalogChangeStream(spark, "mv_cat", "ws", "src"),
      "mv_cat.ws.mv", "g", "x", ckpt)
    val q = start()
    try {
      q.processAllAvailable() // batch 0: the initial load
      assert(mvState() === recompute(), "MV diverges after initial load")
      spark.sql("INSERT INTO mv_cat.ws.src VALUES ('b', 10.0), ('c', 0.5)")
      q.processAllAvailable()
      assert(mvState() === recompute(), "MV diverges after delta")
    } finally q.stop()
    // kill/restart: rows landed while the maintainer was down catch up;
    // nothing double-applies
    spark.sql("INSERT INTO mv_cat.ws.src VALUES ('a', -1.0), ('c', 7.75)")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(mvState() === recompute(), "MV diverges after restart catch-up")
    } finally q2.stop()
    // the marker row carries the last-applied batch id, not user data
    val marker = spark.table("mv_cat.ws.mv")
      .where(col("g") === StreamingOps.MvBatchMarker).collect()
    assert(marker.length === 1 && marker(0).getLong(1) >= 1L)
  }

  test("catalogChangeStream tails committed inserts exactly-once across a restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    spark.conf.set("spark.sql.catalog.cdc_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdc_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdc_cat.ws")
    spark.sql("CREATE TABLE cdc_cat.ws.feed (k BIGINT)")
    spark.sql("INSERT INTO cdc_cat.ws.feed VALUES (1), (2)")
    // foreachBatch collector (the memory sink cannot recover a checkpoint)
    val seen = new scala.collection.mutable.ArrayBuffer[Long]
    def start() = StreamingOps
      .catalogChangeStream(spark, "cdc_cat", "ws", "feed")
      .writeStream
      .option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = batch.collect().map(_.getLong(0))
        seen.synchronized { seen ++= ks }
        ()
      }
      .start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.sorted === Seq(1L, 2L))
      spark.sql("INSERT INTO cdc_cat.ws.feed VALUES (3)")
      q1.processAllAvailable()
      assert(seen.sorted === Seq(1L, 2L, 3L))
    } finally q1.stop()
    // rows committed while the consumer was DOWN are delivered on restart,
    // and previously-delivered files are not re-read (file-source ledger)
    spark.sql("INSERT INTO cdc_cat.ws.feed VALUES (4), (5)")
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.sorted === Seq(4L, 5L), s"restart replayed or lost rows: $seen")
    } finally q2.stop()
  }

  test("change-feed face: appends stream as inserts, MERGE/UPDATE stream exact delete/insert pairs, OPTIMIZE skipped, DV-only MOR deltas flow, restart exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_cat").toString
    spark.conf.set("spark.sql.catalog.cdf_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdf_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf_cat.ws")
    spark.sql("CREATE TABLE cdf_cat.ws.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cdf_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(0, 10)")
    // (k, v, _change_type, _commit_version) -> delivery count (the
    // exactly-once ledger this test asserts over)
    val counts = new java.util.concurrent.ConcurrentHashMap[(Long, String, String, Long), Long]()
    def start(cp: String) =
      spark.readStream.table("cdf_cat.ws.t.changes")
        .writeStream.option("checkpointLocation", cp).outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            counts.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)),
              1L, _ + _)
          }
          ()
        }.start()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_ckpt").toString
    val q1 = start(ckpt)
    try {
      q1.processAllAvailable()
      assert(counts.size === 10, s"backlog: ${counts.size}")
      assert(counts.keySet().stream().allMatch(t => t._3 == "insert" && t._4 == 1L))
      // UPDATE: the rewritten file's unchanged rows cancel in the diff —
      // EXACTLY the touched row streams, and even on this KEYLESS table
      // the delete/insert re-type into update images (r12): the untouched
      // column k has identical multisets on both sides, so content
      // pairing by (k, occurrence#) is unambiguous here
      spark.sql("UPDATE cdf_cat.ws.t SET v = 'x' WHERE k = 3")
      q1.processAllAvailable()
      assert(counts.size === 12, s"update delta: ${counts.size}")
      assert(counts.containsKey((3L, "3", "update_preimage", 2L)) &&
        counts.containsKey((3L, "x", "update_postimage", 2L)), counts.toString)
      // OPTIMIZE: layout-only, never re-fed
      spark.sql("CALL cdf_cat.optimize('ws', 't', 2, 'k')")
      q1.processAllAvailable()
      assert(counts.size === 12, "OPTIMIZE leaked rows into the change feed")
      // MERGE: one matched update + one not-matched insert → three rows
      spark.sql(
        """MERGE INTO cdf_cat.ws.t t USING
          |  (SELECT 5L AS k, 'm' AS v UNION ALL SELECT 100L, 'new') s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      q1.processAllAvailable()
      assert(counts.size === 15, s"merge delta: ${counts.size}")
      assert(counts.containsKey((5L, "5", "delete", 4L)) &&
        counts.containsKey((5L, "m", "insert", 4L)) &&
        counts.containsKey((100L, "new", "insert", 4L)), counts.toString)
      // exactly-once: nothing ever delivered twice
      assert(!counts.values().stream().anyMatch(n => n > 1L), "a change row was re-delivered")
    } finally q1.stop()
    // restart: a commit while the consumer was down arrives once, no replay
    spark.sql("INSERT INTO cdf_cat.ws.t VALUES (200, 'late')")
    val q2 = start(ckpt)
    try {
      q2.processAllAvailable()
      assert(counts.containsKey((200L, "late", "insert", 5L)), counts.toString)
      assert(counts.size === 16 && !counts.values().stream().anyMatch(n => n > 1L),
        s"restart broke exactly-once: ${counts.size}")
    } finally q2.stop()
    // a TAG anchors consumer starts: starting-version accepts the tag name
    // (the release-anchored consumer — "stream me everything after rel1")
    spark.sql("CALL cdf_cat.tag('ws', 't', 'rel1', 4)")
    counts.clear()
    val ckptT = java.nio.file.Files.createTempDirectory("graft_cdf_ckptT").toString
    val qT = spark.readStream.option("graft.starting-version", "rel1")
      .table("cdf_cat.ws.t.changes")
      .writeStream.option("checkpointLocation", ckptT).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          counts.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)), 1L, _ + _)
        }
        ()
      }.start()
    try {
      qT.processAllAvailable()
      assert(counts.size === 1 && counts.containsKey((200L, "late", "insert", 5L)),
        s"tag-anchored start diverged: $counts")
    } finally qT.stop()
    val badTag = intercept[Exception] {
      spark.readStream.option("graft.starting-version", "nope")
        .table("cdf_cat.ws.t.changes")
        .writeStream.option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_cdf_ckptB").toString)
        .outputMode("append")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start().processAllAvailable()
    }
    assert(Iterator.iterate(badTag: Throwable)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(
        _.contains("neither a version number nor an existing tag"))),
      badTag.getMessage)
    // DV-only MOR commits (no file-set change) still stream their delta
    spark.sql(
      """CREATE TABLE cdf_cat.ws.m (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read',
        |               'graft.merge-keys'='k')""".stripMargin)
    spark.sql("INSERT INTO cdf_cat.ws.m SELECT id, CAST(id AS STRING) FROM range(0, 8)")
    spark.sql("DELETE FROM cdf_cat.ws.m WHERE k = 2") // DV-only: zero rewrites
    counts.clear()
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cdf_ckpt2").toString
    val q3 = spark.readStream.table("cdf_cat.ws.m.changes")
      .writeStream.option("checkpointLocation", ckpt2).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          counts.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)), 1L, _ + _)
        }
        ()
      }.start()
    try {
      q3.processAllAvailable()
      assert(counts.containsKey((2L, "2", "delete", 2L)),
        s"DV-only delete missing from the feed: $counts")
      assert(counts.size === 9 && !counts.values().stream().anyMatch(n => n > 1L),
        counts.toString)
    } finally q3.stop()
    // KEYED tables pair update images (r11 — the Delta-CDF surface): an
    // UPDATE's delete/insert rows sharing the merge key stream as
    // update_preimage/update_postimage, and a MERGE mixes a paired update
    // with a bare insert in one version. The unpaired DV-only DELETE above
    // stayed a bare 'delete' — pairing never invents a postimage.
    spark.sql("UPDATE cdf_cat.ws.m SET v = 'u' WHERE k = 5")
    spark.sql(
      """MERGE INTO cdf_cat.ws.m t USING
        |  (SELECT 6L AS k, 'mm' AS v UNION ALL SELECT 300L, 'fresh') s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    counts.clear()
    val q4 = spark.readStream.table("cdf_cat.ws.m.changes")
      .writeStream.option("checkpointLocation", ckpt2).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          counts.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)), 1L, _ + _)
        }
        ()
      }.start()
    try {
      q4.processAllAvailable()
      assert(counts.containsKey((5L, "5", "update_preimage", 3L)) &&
        counts.containsKey((5L, "u", "update_postimage", 3L)),
        s"UPDATE did not pair images: $counts")
      assert(counts.containsKey((6L, "6", "update_preimage", 4L)) &&
        counts.containsKey((6L, "mm", "update_postimage", 4L)) &&
        counts.containsKey((300L, "fresh", "insert", 4L)),
        s"MERGE did not mix paired update with bare insert: $counts")
      assert(counts.size === 5 && !counts.values().stream().anyMatch(n => n > 1L),
        counts.toString)
    } finally q4.stop()
  }

  test("lineage change feed: rows carry _row_id, updates pair by identity, inserts mint fresh ids") {
    import graft.sources.catalog.StagingMaintenance
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_rl").toString
    spark.conf.set("spark.sql.catalog.cdfrl_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfrl_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdfrl_cat.ws")
    spark.sql(
      """CREATE TABLE cdfrl_cat.ws.t (k BIGINT, v STRING)
        |TBLPROPERTIES ('graft.row-lineage'='true')""".stripMargin)
    spark.sql("INSERT INTO cdfrl_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(0, 10)")
    // (k, v, change, version, row_id) delivered exactly once
    val rows = new java.util.concurrent.ConcurrentHashMap[(Long, String, String, Long, Long), Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_rl_ckpt").toString
    val q = spark.readStream.table("cdfrl_cat.ws.t.changes")
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("k", "v", "_change_type", "_commit_version", "_row_id")
          .collect().foreach { r =>
            rows.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
              r.getLong(4)), 1L, _ + _)
          }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // the insert backlog carries the SAME ids the table serves
      val served = StagingMaintenance.readLineage(spark, "cdfrl_cat", "ws", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rows.size === 10, s"backlog: ${rows.size}")
      rows.keySet().forEach { t =>
        assert(t._3 == "insert" && served(t._1) == t._5,
          s"feed id diverged from the table's: $t vs ${served(t._1)}")
      }
      // an UPDATE streams ONE pre/post pair SHARING the row's id — exact
      // identity pairing with no merge key anywhere
      spark.sql("UPDATE cdfrl_cat.ws.t SET v = 'x' WHERE k = 3")
      q.processAllAvailable()
      assert(rows.size === 12, s"update delta: ${rows.size}")
      val id3 = served(3L)
      assert(rows.containsKey((3L, "3", "update_preimage", 2L, id3)) &&
        rows.containsKey((3L, "x", "update_postimage", 2L, id3)), rows.toString)
      // MERGE: the matched row's pair shares ITS id; the not-matched
      // insert mints a fresh id the table then serves
      spark.sql(
        """MERGE INTO cdfrl_cat.ws.t t USING
          |  (SELECT 5L AS k, 'm' AS v UNION ALL SELECT 100L, 'new') s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      q.processAllAvailable()
      assert(rows.size === 15, s"merge delta: ${rows.size}")
      val id5 = served(5L)
      assert(rows.containsKey((5L, "5", "update_preimage", 3L, id5)) &&
        rows.containsKey((5L, "m", "update_postimage", 3L, id5)), rows.toString)
      val served2 = StagingMaintenance.readLineage(spark, "cdfrl_cat", "ws", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rows.containsKey((100L, "new", "insert", 3L, served2(100L))), rows.toString)
      assert(served2(100L) > served.values.max, "merge insert reused an old id range")
      // a COW DELETE streams deletes carrying the vanished rows' ids
      spark.sql("DELETE FROM cdfrl_cat.ws.t WHERE k >= 8 AND k < 10")
      q.processAllAvailable()
      assert(rows.size === 17, s"delete delta: ${rows.size}")
      assert(rows.containsKey((8L, "8", "delete", 4L, served(8L))) &&
        rows.containsKey((9L, "9", "delete", 4L, served(9L))), rows.toString)
      // exactly-once throughout
      assert(!rows.values().stream().anyMatch(n => n > 1L), "a change row was re-delivered")
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS cdfrl_cat.ws.t")
  }

  test("lineage change feed × merge-on-read: DV-only versions stream identity deletes, MOR updates pair by _row_id") {
    import graft.sources.catalog.StagingMaintenance
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_rlm").toString
    spark.conf.set("spark.sql.catalog.cdfrlm_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfrlm_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdfrlm_cat.ws")
    spark.sql(
      """CREATE TABLE cdfrlm_cat.ws.m (k BIGINT NOT NULL, v STRING)
        |TBLPROPERTIES ('graft.row-lineage'='true',
        |               'graft.write.mode'='merge-on-read',
        |               'graft.merge-keys'='k')""".stripMargin)
    spark.sql("INSERT INTO cdfrlm_cat.ws.m SELECT id, CAST(id AS STRING) FROM range(0, 10)")
    val served = StagingMaintenance.readLineage(spark, "cdfrlm_cat", "ws", "m")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // a DV-only DELETE changes row VISIBILITY with an unchanged file set —
    // the lineage diff must chase it and stream the row's identity delete
    spark.sql("DELETE FROM cdfrlm_cat.ws.m WHERE k = 2") // v2: zero rewrites
    // a MOR UPDATE is DV-delete + preserved-id insert: ONE pre/post pair
    // sharing the row's id must stream, not a bare delete+insert
    spark.sql("UPDATE cdfrlm_cat.ws.m SET v = 'u' WHERE k = 5") // v3
    val rows = new java.util.concurrent.ConcurrentHashMap[(Long, String, String, Long, Long), Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_rlm_ckpt").toString
    val q = spark.readStream.table("cdfrlm_cat.ws.m.changes")
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("k", "v", "_change_type", "_commit_version", "_row_id")
          .collect().foreach { r =>
            rows.merge((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
              r.getLong(4)), 1L, _ + _)
          }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(rows.containsKey((2L, "2", "delete", 2L, served(2L))),
        s"DV-only delete missing its identity row: $rows")
      assert(rows.containsKey((5L, "5", "update_preimage", 3L, served(5L))) &&
        rows.containsKey((5L, "u", "update_postimage", 3L, served(5L))),
        s"MOR update did not pair by _row_id: $rows")
      assert(rows.size === 13, s"expected 10 inserts + 1 delete + 1 pair: ${rows.size}")
      assert(!rows.values().stream().anyMatch(n => n > 1L), "a change row was re-delivered")
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS cdfrlm_cat.ws.m")
  }

  test("readStream.table tails version manifests: exactly-once appends, OPTIMIZE skipped, changes gated") {
    // The DSv2 streaming face of the staging catalog (the Delta-source
    // shape): offsets are manifest VERSIONS, each batch reads only the
    // versions' appended file deltas — so compaction does NOT re-emit the
    // table (the file-tailing catalogChangeStream would double-read it),
    // and a data-changing commit is an explicit, gated event.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft_tail_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tail_ckpt").toString
    spark.conf.set("spark.sql.catalog.tail_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.tail_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tail_cat.ws")
    spark.sql("CREATE TABLE tail_cat.ws.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO tail_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(0, 100)")
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]() // k -> count
    def start(extra: Map[String, String] = Map.empty, cp: String = ckpt) = {
      var r = spark.readStream
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.table("tail_cat.ws.t")
        .writeStream.option("checkpointLocation", cp).outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(row => seen.merge(row.getLong(0), 1L, _ + _))
          ()
        }
        .start()
    }
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.size === 100, s"first drain must emit the backlog: ${seen.size}")
      spark.sql("INSERT INTO tail_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(100, 150)")
      q1.processAllAvailable()
      assert(seen.size === 150)
      // compaction mid-stream: kind=optimize versions carry NO new rows
      spark.sql("CALL tail_cat.optimize('ws', 't', 2, 'k')")
      q1.processAllAvailable()
      assert(seen.size === 150, "OPTIMIZE must not re-emit the table into the stream")
      assert(!seen.values().asScala.exists(_ > 1L), "a row was emitted twice")
      spark.sql("INSERT INTO tail_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(150, 160)")
      q1.processAllAvailable()
      assert(seen.size === 160)
    } finally q1.stop()
    // rows committed while the consumer was DOWN arrive on restart; the
    // checkpointed version offset prevents any replay of delivered versions
    spark.sql("INSERT INTO tail_cat.ws.t SELECT id, CAST(id AS STRING) FROM range(160, 170)")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.size === 170, s"restart lost or replayed rows: ${seen.size}")
    } finally q2.stop()
    // a FRESH checkpoint replays the whole retained history — and the
    // replay still skips the optimize version (no double-read of compacted
    // files), landing on exactly the appended row set
    seen.clear()
    val cp2 = java.nio.file.Files.createTempDirectory("graft_tail_ckpt2").toString
    val q3 = start(cp = cp2)
    try {
      q3.processAllAvailable()
      assert(seen.size === 170, s"fresh replay diverged: ${seen.size}")
      assert(!seen.values().asScala.exists(_ > 1L), "fresh replay double-read a file")
    } finally q3.stop()
    // a data-changing commit breaks the append contract: gated by default…
    spark.sql("UPDATE tail_cat.ws.t SET v = 'x' WHERE k = 0")
    spark.sql("INSERT INTO tail_cat.ws.t VALUES (170, '170')")
    val cp3 = java.nio.file.Files.createTempDirectory("graft_tail_ckpt3").toString
    seen.clear()
    val q4 = start(cp = cp3)
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q4.processAllAvailable()
    }
    q4.stop()
    assert(failed.getMessage.contains("update") ||
      Option(failed.getCause).exists(_.getMessage.contains("update")), failed.getMessage)
    // …and explicitly waived with graft.ignore-changes (appends-only tail)
    seen.clear()
    val cp4 = java.nio.file.Files.createTempDirectory("graft_tail_ckpt4").toString
    val q5 = start(extra = Map("graft.ignore-changes" -> "true"), cp = cp4)
    try {
      q5.processAllAvailable()
      assert(seen.size === 171, s"ignore-changes tail diverged: ${seen.size}")
    } finally q5.stop()
    // ignore-changes must not LOSE rows a change-commit newly INSERTED
    // (Delta ignoreChanges parity, r9 advisory): a MERGE whose NOT MATCHED
    // arm adds k=171 re-emits rewritten survivors as duplicates, but the
    // fresh row must arrive — the old skip-the-version-wholesale semantics
    // silently dropped it.
    spark.sql(
      """MERGE INTO tail_cat.ws.t t USING (SELECT 171L AS k, '171' AS v) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    seen.clear()
    val cp5 = java.nio.file.Files.createTempDirectory("graft_tail_ckpt5").toString
    val q6 = start(extra = Map("graft.ignore-changes" -> "true"), cp = cp5)
    try {
      q6.processAllAvailable()
      assert(seen.containsKey(171L), "merge-inserted row lost under ignore-changes")
      assert(seen.size === 172, s"ignore-changes tail diverged: ${seen.size}")
    } finally q6.stop()
  }

  test("rate-limited catalog streams: a commit backlog drains in bounded micro-batches, exactly-once, both faces; AvailableNow still drains fully") {
    // Admission control on the manifest-version axis (Delta's
    // maxFilesPerTrigger shape): a fresh consumer of a long commit backlog
    // must NOT plan one giant batch — graft.max-versions-per-trigger and
    // graft.max-files-per-trigger bound each micro-batch, and the drain
    // stays exactly-once because each bounded batch checkpoints its own
    // version offset.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft_rl_cat").toString
    spark.conf.set("spark.sql.catalog.rl_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.rl_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl_cat.ws")
    spark.sql("CREATE TABLE rl_cat.ws.t (k BIGINT, v STRING)")
    // 6-commit backlog, one file per commit (single-slice range input)
    (0 until 6).foreach { i =>
      spark.sql(s"INSERT INTO rl_cat.ws.t SELECT id, CAST(id AS STRING) " +
        s"FROM range(${i * 100}, ${(i + 1) * 100}, 1, 1)")
    }
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def drain(table: String, opts: Map[String, String],
        trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): Unit = {
      seen.clear(); batches.set(0)
      val cp = java.nio.file.Files.createTempDirectory("graft_rl_ckpt").toString
      var r = spark.readStream
      opts.foreach { case (k, v) => r = r.option(k, v) }
      var w = r.table(table)
        .writeStream.option("checkpointLocation", cp).outputMode("append")
      trigger.foreach(t => w = w.trigger(t))
      val q = w.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
          if (rows.nonEmpty) {
            batches.incrementAndGet()
            rows.foreach(row => seen.merge(row.getLong(0), 1L, _ + _))
          }
          ()
        }.start()
      try {
        if (trigger.isDefined) q.awaitTermination() else q.processAllAvailable()
      } finally q.stop()
    }
    def assertExactlyOnce(n: Int): Unit = {
      assert(seen.size === n, s"drain lost rows: ${seen.size} of $n")
      assert(!seen.values().asScala.exists(_ > 1L), "a row was emitted twice")
    }
    // append face, version cap: 6 versions / cap 2 = exactly 3 batches
    drain("rl_cat.ws.t", Map("graft.max-versions-per-trigger" -> "2"))
    assert(batches.get === 3, s"6-version backlog at cap 2 must drain in 3 batches, got ${batches.get}")
    assertExactlyOnce(600)
    // append face, file cap: one file per commit, cap 2 files = 3 batches
    drain("rl_cat.ws.t", Map("graft.max-files-per-trigger" -> "2"))
    assert(batches.get === 3, s"6-file backlog at 2 files/trigger must drain in 3 batches, got ${batches.get}")
    assertExactlyOnce(600)
    // Trigger.AvailableNow + cap: drains FULLY (Spark re-triggers to the
    // prepared head) in the same bounded batches, then terminates
    drain("rl_cat.ws.t", Map("graft.max-versions-per-trigger" -> "2"),
      Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    assert(batches.get === 3, s"AvailableNow at cap 2 must drain in 3 bounded batches, got ${batches.get}")
    assertExactlyOnce(600)
    // changes face honors the same caps (offsets are the same version axis)
    drain("rl_cat.ws.t.changes", Map("graft.max-versions-per-trigger" -> "3"))
    assert(batches.get === 2, s"6-version changes backlog at cap 3 must drain in 2 batches, got ${batches.get}")
    assertExactlyOnce(600)
    // uncapped stays one batch (the pre-existing default, unchanged)
    drain("rl_cat.ws.t", Map.empty)
    assert(batches.get === 1, s"uncapped drain must stay a single batch, got ${batches.get}")
    assertExactlyOnce(600)
    // a malformed cap fails fast at stream construction
    val bad = intercept[Exception] {
      drain("rl_cat.ws.t", Map("graft.max-versions-per-trigger" -> "0"))
    }
    assert(bad.getMessage.contains("must be positive") ||
      Option(bad.getCause).exists(_.getMessage.contains("must be positive")), bad.getMessage)
  }

  test("bm25MaintainStream: commit-log-driven index maintenance survives compaction and restarts") {
    // End-to-end composition of the round's pieces: documents stream in
    // through the versioned catalog, the DSv2 manifest-tailing source
    // feeds the posting/doclen tables exactly-once, and an OPTIMIZE of the
    // docs table mid-stream must NOT re-feed the index (the manifest
    // source skips dataChange=false versions — a file-tailing consumer
    // would double every posting here).
    val root = java.nio.file.Files.createTempDirectory("graft_bm25m_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25m_ckpt").toString
    spark.conf.set("spark.sql.catalog.bm25m_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.bm25m_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bm25m_cat.ws")
    spark.sql("CREATE TABLE bm25m_cat.ws.docs (doc_id BIGINT, text STRING)")
    spark.sql(
      """CREATE TABLE bm25m_cat.ws.postings (tok STRING, doc_id BIGINT, tf BIGINT)
        |TBLPROPERTIES ('graft.sort-order'='tok')""".stripMargin)
    spark.sql("CREATE TABLE bm25m_cat.ws.doclen (doc_id BIGINT, dl BIGINT)")
    // r11: the index pair is a COMMIT GROUP — each micro-batch's two
    // appends are invisible phase-1 work and the stream's own per-batch
    // group_publish flips them visible together; every read below goes
    // through the group pin
    spark.sql("CALL bm25m_cat.group_create('ws', 'bm25idx', 'postings,doclen')")
    def expected(): Map[(String, Long), Long] =
      spark.sql("""SELECT tok, doc_id, count(*) AS tf FROM
        |(SELECT doc_id, explode(split(text, ' ')) AS tok FROM bm25m_cat.ws.docs)
        |GROUP BY tok, doc_id""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def indexed(): Map[(String, Long), Long] =
      spark.sql("SELECT tok, doc_id, tf FROM bm25m_cat.ws.postings")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.sql("INSERT INTO bm25m_cat.ws.docs VALUES (1, 'fast scan fast'), (2, 'slow scan')")
    val q = StreamingOps.bm25MaintainStream(spark, "bm25m_cat.ws.docs",
      "bm25m_cat.ws.postings", "bm25m_cat.ws.doclen", ckpt)
    try {
      q.processAllAvailable()
      assert(indexed() === expected(), "index diverged after first slice")
      // compaction of the DOCS table mid-stream: manifest tail skips it
      spark.sql("CALL bm25m_cat.optimize('ws', 'docs', 1)")
      q.processAllAvailable()
      assert(indexed() === expected(), "OPTIMIZE re-fed the index")
      spark.sql("INSERT INTO bm25m_cat.ws.docs VALUES (3, 'vector scan stream')")
      q.processAllAvailable()
      assert(indexed() === expected(), "index diverged after second slice")
    } finally q.stop()
    // rows committed while the maintainer was DOWN arrive on restart,
    // exactly once (batch-id ledger absorbs the one replayed batch)
    spark.sql("INSERT INTO bm25m_cat.ws.docs VALUES (4, 'stream stream stream')")
    val q2 = StreamingOps.bm25MaintainStream(spark, "bm25m_cat.ws.docs",
      "bm25m_cat.ws.postings", "bm25m_cat.ws.doclen", ckpt)
    try {
      q2.processAllAvailable()
      assert(indexed() === expected(), "restart lost or duplicated postings")
      val dl = spark.sql("SELECT doc_id, dl FROM bm25m_cat.ws.doclen")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dl === Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 3L), dl)
    } finally q2.stop()
    // the torn window the group closes: a member commit WITHOUT its
    // publish (a maintainer dying between phase-1 appends) stays invisible
    // to readers, then flips visible at the next publish
    val before = indexed()
    spark.sql("INSERT INTO bm25m_cat.ws.postings VALUES ('zzz_torn', 99, 1)")
    assert(indexed() === before, "un-published member commit leaked to readers")
    spark.sql("CALL bm25m_cat.group_publish('ws', 'bm25idx')")
    assert(indexed().contains(("zzz_torn", 99L)), "publish did not flip the member visible")
  }

  test("catalogUpsertStream into a MERGE-ON-READ table: every CDC batch is DV + fresh files, zero rewrites") {
    // The end-to-end CDC story the deletion vectors exist for: a keyed
    // change stream maintained into a MOR current-state table — each
    // micro-batch's MERGE commits one deletion vector plus the changed
    // rows' files, and NO pre-existing file is ever rewritten, so per-batch
    // write cost is O(changed rows) however large the table grows.
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_morups_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_morups_ckpt").toString
    spark.conf.set("spark.sql.catalog.morups_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.morups_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morups_cat.ws")
    spark.sql(
      """CREATE TABLE morups_cat.ws.state (k BIGINT NOT NULL, v BIGINT)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read', 'graft.merge-keys'='k')""".stripMargin)
    // a hash-distributed base the CDC stream churns against
    spark.sql(
      "INSERT INTO morups_cat.ws.state SELECT /*+ REPARTITION(4, id) */ id, id FROM range(0, 200)")
    def files(): Set[String] = graft.sources.catalog.StagingMaintenance
      .currentFileNames(spark, "morups_cat", "ws", "state").toSet
    def state() = spark.sql("SELECT k, v FROM morups_cat.ws.state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = files()
    assert(base.size === 4)
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingOps.catalogUpsertStream(
      mem.toDF().selectExpr("_1 AS k", "_2 AS v"), "morups_cat.ws.state", "k", ckpt)
    try {
      mem.addData((5L, 1000L), (105L, 1001L), (500L, 1002L)); q.processAllAvailable()
      val afterB1 = files()
      assert(base.subsetOf(afterB1), "CDC batch 1 rewrote a base file")
      assert(graft.sources.catalog.StagingMaintenance
        .activeDvs(spark, "morups_cat", "ws", "state").nonEmpty,
        "CDC merge committed no deletion vector")
      mem.addData((5L, 2000L), (501L, 2001L)); q.processAllAvailable()
      assert(afterB1.subsetOf(files()), "CDC batch 2 rewrote an existing file")
    } finally q.stop()
    val expect = (0L until 200L).map(k => k -> k).toMap ++
      Map(5L -> 2000L, 105L -> 1001L, 500L -> 1002L, 501L -> 2001L)
    assert(state() === expect, "MOR CDC state diverged")
    // fold: OPTIMIZE compacts the churn away and the state is unchanged
    graft.sources.catalog.StagingMaintenance.optimize(
      spark, "morups_cat", "ws", "state", targetFiles = 2)
    assert(graft.sources.catalog.StagingMaintenance
      .activeDvs(spark, "morups_cat", "ws", "state").isEmpty)
    assert(state() === expect, "OPTIMIZE fold changed CDC state")
  }

  test("catalogUpsertStream: per-batch MERGE maintains current state; replay is data-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ups_cat").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ups_ckpt").toString
    spark.conf.set("spark.sql.catalog.ups_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.ups_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ups_cat.ws")
    spark.sql("CREATE TABLE ups_cat.ws.state (k BIGINT, v BIGINT)")
    def state() = spark.sql("SELECT k, v FROM ups_cat.ws.state")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingOps.catalogUpsertStream(
      mem.toDF().selectExpr("_1 AS k", "_2 AS v"), "ups_cat.ws.state", "k", ckpt)
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      assert(state() === Map(1L -> 10L, 2L -> 20L))
      // overlapping keys: matched rows update, new keys insert
      mem.addData((2L, 21L), (3L, 30L)); q.processAllAvailable()
      assert(state() === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))
    } finally q.stop()
    // crash-replay: re-applying a batch's merge reproduces the SAME state —
    // upserts are data-idempotent without a batch-id ledger
    spark.range(1).selectExpr("CAST(2 AS BIGINT) AS k", "CAST(21 AS BIGINT) AS v")
      .createOrReplaceTempView("ups_replay")
    spark.sql(
      """MERGE INTO ups_cat.ws.state t USING ups_replay s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state() === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))

    // CDC reality: one batch carries SEVERAL changes for a key. The sink
    // must compact to the per-key winner by the sequence column before the
    // MERGE — neither a multi-match MERGE error nor duplicate inserts.
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ups_ckpt2").toString
    spark.sql("CREATE TABLE ups_cat.ws.state2 (k BIGINT, v BIGINT, seq BIGINT)")
    def state2() = spark.sql("SELECT k, v FROM ups_cat.ws.state2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mem2 = MemoryStream[(Long, Long, Long)]
    val q2 = StreamingOps.catalogUpsertStream(
      mem2.toDF().selectExpr("_1 AS k", "_2 AS v", "_3 AS seq"),
      "ups_cat.ws.state2", "k", ckpt2, orderCol = Some("seq"))
    try {
      // new key seen twice in one batch + existing-key double update
      mem2.addData((1L, 100L, 1L), (1L, 101L, 2L), (2L, 200L, 1L))
      q2.processAllAvailable()
      assert(state2() === Map(1L -> 101L, 2L -> 200L),
        s"per-key compaction by seq failed: ${state2()}")
      assert(spark.sql("SELECT count(*) FROM ups_cat.ws.state2").collect()(0).getLong(0) === 2,
        "duplicate rows inserted for a multi-change key")
      mem2.addData((2L, 202L, 3L), (2L, 201L, 2L)) // out-of-order in the batch
      q2.processAllAvailable()
      assert(state2() === Map(1L -> 101L, 2L -> 202L), "seq-DESC winner must apply")
    } finally q2.stop()
  }

  test("curateStream exactly-once: kill + checkpoint restart neither duplicates nor loses rows") {
    // The streaming analogue of the rename-commit hazard (the reference's
    // copy+delete window, CephRgwFileSystem.java:310-313): a file-source
    // curateStream is killed after committing some batches, restarted on the
    // SAME checkpoint, and fed more files. Exactly-once demands (a) no
    // pre-kill batch is re-emitted after restart, (b) no post-restart file
    // is skipped, (c) dedup state crosses the restart. The foreachBatch
    // sink writes one parquet dir per batchId (overwrite), the standard
    // replay-idempotent pattern: a batch redelivered after a crash between
    // sink-write and checkpoint-commit overwrites its own output instead of
    // appending a duplicate.
    val src = java.nio.file.Files.createTempDirectory("graft_eo_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_eo_sink").toString
    val base = "the quick brown fox jumps over the lazy dog while the calm cat " +
      "naps under the warm sun near the old oak tree today"
    def doc(id: Long, minute: Int, tag: String) =
      StreamingOps.StreamDoc(id, ts(f"2024-01-01 00:$minute%02d:00"), s"$base $tag", "en")
    val docSchema = implicitly[org.apache.spark.sql.Encoder[StreamingOps.StreamDoc]].schema
    def startQ() = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .transform(StreamingOps.curateStream)
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$sink/batch_$id")
        ()
      }
      .start()
    // wave writer: the file source lists files directly under src (no
    // recursion), so each wave lands as a single <name>.parquet FILE there
    def addWave(name: String, docs: Seq[StreamingOps.StreamDoc]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_eo_wave").toString
      docs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    // wave 1: two files, three clean docs
    addWave("wave1a", Seq(doc(1, 1, "alpha"), doc(2, 2, "bravo")))
    addWave("wave1b", Seq(doc(3, 3, "charlie")))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop() // the "kill" after commit
    // wave 2, added while the query is DOWN: one new clean doc, one exact
    // content dup of doc 1 (must be dropped by state carried across the
    // restart), landing inside the 1 h watermark horizon
    addWave("wave2", Seq(doc(4, 10, "delta"), doc(5, 11, "alpha")))
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      // explicit schema: a batch whose rows were all filtered/deduped leaves
      // an empty dir (no footers), which would break schema inference
      val curatedSchema = org.apache.spark.sql.types.StructType(docSchema.fields :+
        org.apache.spark.sql.types.StructField("content_hash",
          org.apache.spark.sql.types.StringType))
      val served = spark.read.schema(curatedSchema).option("basePath", sink).parquet(
          new java.io.File(sink).listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
        .select("doc_id").as[Long].collect().toList
      // no losses: 1,2,3 (pre-kill) and 4 (post-restart) all present exactly
      // once; no duplicates: nothing re-emitted, and doc 5 (dup content)
      // dropped by restored dedup state
      assert(served.sorted === List(1L, 2L, 3L, 4L),
        s"exactly-once violated, sink rows: $served")
    } finally q2.stop()
  }

  test("capstone: curateStream feeds catalogAppendStream; restart-safe, versioned, change-feed-readable") {
    // The continuous-ingest twin of the batch curation capstone (q275): raw
    // docs stream through the quality+dedup curation DAG straight into a
    // VERSIONED catalog table via the exactly-once batch-id sink. Killed
    // and restarted mid-stream, the final table must equal the batch
    // curation of the same input, every micro-batch must be a pinnable
    // version, and the change feed must replay the ingest increments.
    val src = java.nio.file.Files.createTempDirectory("graft_cap_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cap_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft_cap_cat").toString
    spark.conf.set("spark.sql.catalog.cap_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.cap_cat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cap_cat.ws")
    spark.sql("""CREATE TABLE cap_cat.ws.corpus
      (doc_id BIGINT, ts TIMESTAMP, text STRING, lang STRING, content_hash STRING)""")
    val base = "the quick brown fox jumps over the lazy dog while the calm cat " +
      "naps under the warm sun near the old oak tree today"
    def doc(id: Long, minute: Int, tag: String) =
      StreamingOps.StreamDoc(id, ts(f"2024-01-01 00:$minute%02d:00"), s"$base $tag", "en")
    val docSchema = implicitly[org.apache.spark.sql.Encoder[StreamingOps.StreamDoc]].schema
    def addWave(name: String, docs: Seq[StreamingOps.StreamDoc]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cap_wave").toString
      docs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    def startQ() = StreamingOps.catalogAppendStream(
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1).parquet(src)
        .transform(StreamingOps.curateStream),
      "cap_cat.ws.corpus", ckpt)
    addWave("wave1a", Seq(doc(1, 1, "alpha"), doc(2, 2, "bravo")))
    addWave("wave1b", Seq(doc(3, 3, "charlie")))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop() // kill after commit
    // while DOWN: one clean doc + one exact content dup of doc 1 (state
    // carried across the restart must drop it)
    addWave("wave2", Seq(doc(4, 10, "delta"), doc(5, 11, "alpha")))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()

    def served() = spark.sql("SELECT doc_id FROM cap_cat.ws.corpus")
      .collect().map(_.getLong(0)).toList.sorted
    assert(served() === List(1L, 2L, 3L, 4L), s"exactly-once violated: ${served()}")
    // final table state == the BATCH curation of the same input (q275's
    // batch DAG: quality filter + keep first arrival per content hash)
    val batchCurated = graft.operators.Curation.qualityFlags(
        spark.read.schema(docSchema).parquet(src))
      .where(!col("f_short") && !col("f_word_len") && !col("f_symbol"))
      .withColumn("content_hash", sha2(col("text"), 256))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
          .orderBy(col("ts"), col("doc_id"))))
      .where(col("rn") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toList.sorted
    assert(served() === batchCurated, s"stream != batch curate: ${served()} vs $batchCurated")
    // every micro-batch is a pinnable version with its batch id recorded
    val hist = graft.sources.catalog.StagingMaintenance
      .history(spark, "cap_cat", "ws", "corpus")
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(3)))
    assert(hist.nonEmpty && hist.forall(_._2 == "commit"), hist.toSeq)
    assert(hist.forall(_._3 != null), s"batch ids missing from manifests: ${hist.toSeq}")
    val maxV = hist.map(_._1).max
    assert(spark.sql(s"SELECT count(*) FROM cap_cat.ws.corpus VERSION AS OF 1")
      .collect()(0).getLong(0) <= served().size)
    // the change feed replays the whole ingest and the last increment
    val full = graft.sources.catalog.StagingMaintenance
      .changesBetween(spark, "cap_cat", "ws", "corpus", 0L, maxV)
      .select("doc_id").collect().map(_.getLong(0)).toList.sorted
    assert(full === served(), s"change feed diverged: $full")
    val lastDelta = graft.sources.catalog.StagingMaintenance
      .changesBetween(spark, "cap_cat", "ws", "corpus", maxV - 1, maxV)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lastDelta.subsetOf(Set(4L, 5L)) || lastDelta.isEmpty,
      s"last increment wrong: $lastDelta")
    // maintenance composes onto the STREAMED table: zone maps analyze the
    // committed files and a doc_id slice prunes through prunedScan
    val analyzed = spark.sql("CALL cap_cat.analyze('ws', 'corpus', 'doc_id')")
      .collect()(0).getInt(0)
    assert(analyzed > 0)
    val (slice, cur, read) = graft.sources.catalog.StagingMaintenance
      .prunedScan(spark, "cap_cat", "ws", "corpus", "doc_id", 1L, 2L)
    assert(read <= cur && slice.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("cusumStream raises the same alarms as the batch CUSUM recursion across batches") {
    implicit val sqlCtx = spark.sqlContext
    // user 9: steady low values, then a sustained high run that accumulates
    // past the alarm threshold — split across two micro-batches so the
    // carried state (one long) is exercised
    val feed = (1 to 5).map(i =>
      Event(i.toLong, ts(f"2024-01-01 00:0$i:00"), 9, "view", 10.0)) ++
      (6 to 9).map(i => Event(i.toLong, ts(f"2024-01-01 00:0$i:00"), 9, "view", 400.0))
    val mem = MemoryStream[Event]
    val q = StreamingOps.cusumStream(mem.toDS())
      .writeStream.format("memory").queryName("cus").outputMode("append").start()
    try {
      mem.addData(feed.take(6): _*)
      q.processAllAvailable()
      mem.addData(feed.drop(6): _*)
      q.processAllAvailable()
      val got = spark.table("cus").as[StreamingOps.CusumFlag].collect()
        .sortBy(_.event_id)
      // reference: the q206 recursion replayed directly
      var s = 0L
      val want = feed.sortBy(_.event_id).map { e =>
        s = math.max(0L, s + math.floor(e.value * 100.0).toLong - 3459L)
        (e.event_id, s, s > 50000L)
      }
      assert(got.map(f => (f.event_id, f.s, f.alarm)).toSeq === want)
      assert(want.count(_._3) > 0, "test feed must cross the alarm threshold")
      // and the per-user aggregate matches the batch q206 output shape
      val nAlarms = got.count(_.alarm).toLong
      val maxS = got.map(_.s).max
      assert(nAlarms === want.count(_._3).toLong && maxS === want.map(_._2).max)
    } finally q.stop()
  }

  test("anomalyStream flags the same events as the batch detector (in-order feed)") {
    implicit val sqlCtx = spark.sqlContext
    // user 7: constant 10.0 run then a 100.0 spike, split across batches
    val feed = (1 to 6).map(i =>
      Event(i.toLong, ts(f"2024-01-01 00:0$i:00"), 7, "view", 10.0)) :+
      Event(7L, ts("2024-01-01 00:07:00"), 7, "view", 100.0)
    val mem = MemoryStream[Event]
    val q = StreamingOps.anomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("an").outputMode("append").start()
    try {
      mem.addData(feed.take(4): _*)
      q.processAllAvailable()
      mem.addData(feed.drop(4): _*)
      q.processAllAvailable()
      val got = spark.table("an").as[StreamingOps.AnomalyFlag].collect()
        .map(f => f.event_id -> f.is_anomaly).toMap
      // batch twin over the same rows
      val batch = graft.operators.Timeline
        .rollingAnomaly(feed.toDF("event_id", "ts", "user_id", "event_type", "value"), 10, 5)
        .select("event_id", "is_anomaly").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got === batch)
      assert(got(7L) === true && got(6L) === false)
    } finally q.stop()
  }
}
