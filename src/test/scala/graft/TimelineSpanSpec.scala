package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Round-4 operator specs: span-level dedup, prefix-filtered similarity
  * join, SCD2 intervals, rolling anomaly detection, forward fill, k-means
  * step, co-occurrence, and the generator sweep.
  */
class TimelineSpanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  // ---------------------------------------------------------------- q110

  test("prefix filter finds EXACTLY the brute-force J>=0.6 pairs (completeness + precision)") {
    val shingled = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "shingle_hashes(text, 20) AS sh")
    val filtered = SpanOps.prefixFilterJoin(shingled, 3, 5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val brute = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .withColumn("inter", expr("sorted_intersect_count(sh_a, sh_b)"))
      .where(col("inter") * 8 >= (size(col("sh_a")) + size(col("sh_b"))) * 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered === brute)
    assert(brute.nonEmpty) // the corpus must actually exercise the join
  }

  test("integer prefix length never undershoots the ceiling bound") {
    // p = n - ceil(0.6 n) + 1 must use true integer ceiling: for n = 5 the
    // float form ceil(0.6*5) = ceil(3.0000000000000004) = 4 shortens the
    // prefix below the completeness bound.
    for (n <- 1 to 1000) {
      val intCeil = (3 * n + 4) / 5
      val mathCeil = math.ceil(0.6 * n.toDouble) // reference, may over-round
      assert(intCeil === (3 * n + 4) / 5)
      assert(intCeil >= (3 * n) / 5)
      assert(intCeil === ((3 * n) + 4) / 5 && intCeil * 5 >= 3 * n && (intCeil - 1) * 5 < 3 * n)
      assert(mathCeil >= intCeil.toDouble - 0.0) // float form can only over-round upward
    }
  }

  // ---------------------------------------------------------------- q109

  test("span dedup: duplicated twins are fully duplicated, unique doc is clean") {
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en"),
      (2L, "a b c d e f g h i j", "en"), // exact twin: every span duplicated
      (3L, "z y x w v u t s r q", "en")  // unique: no span duplicated
    ).toDF("doc_id", "text", "lang")
    val stats = SpanOps.spanDupStats(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) === ((3L, 3L))) // 10 tokens → 3 spans, all shared with doc 2
    assert(stats(2L) === ((3L, 3L)))
    assert(stats(3L) === ((3L, 0L)))
  }

  test("span dedup: doc shorter than the span width contributes zero spans") {
    val docs = Seq((1L, "too short", "en"), (2L, "a b c d e f g h", "en"))
      .toDF("doc_id", "text", "lang")
    val stats = SpanOps.spanDupStats(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) === 0L)
    assert(stats(2L) === 1L)
  }

  // ---------------------------------------------------------------- q111

  // ---------------------------------------------------------------- q287

  test("Mann–Kendall inversion-count walk equals the O(k²) pair definition, incl. ties") {
    // hand case with ties in value AND in ts: user 1 = [3, 1, 3, 5] in
    // (ts, event_id) order → pairs: (3,1)− (3,3)0 (3,5)+ (1,3)+ (1,5)+
    // (3,5)+ = S=3 of n_pairs=6; user 2 strictly down (S=−1); user 3 has a
    // single event → no pairs → dropped (the join form emits no row)
    val handDir = "/tmp/graft_mk_spec"
    Seq(
      (1L, ts(1), 10L, 3.0), (1L, ts(2), 11L, 1.0),
      (1L, ts(2), 12L, 3.0), (1L, ts(3), 13L, 5.0),
      (2L, ts(1), 20L, 9.0), (2L, ts(2), 21L, 4.0),
      (3L, ts(1), 30L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
      .write.mode("overwrite").parquet(s"$handDir/events.parquet")
    val hand = graft.operators.Timeline.q287MannKendall(spark, handDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(hand === Map(1L -> ((6L, 3L, "up")), 2L -> ((1L, -1L, "down"))))
    // full operator vs brute force on the REAL corpus
    val walk = graft.operators.Timeline.q287MannKendall(spark, sfDir)
    val e = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val a = e.select(col("user_id"), col("event_id").as("id_a"),
      col("ts").as("ts_a"), col("value").as("v_a"))
    val b = e.select(col("user_id"), col("event_id").as("id_b"),
      col("ts").as("ts_b"), col("value").as("v_b"))
    val brute = a.join(b, Seq("user_id"))
      .where(col("ts_a") < col("ts_b") ||
        (col("ts_a") === col("ts_b") && col("id_a") < col("id_b")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("v_b") - col("v_a")).cast("long")).as("s_stat"))
    val wm = walk.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bm = brute.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wm === bm, "inversion-count walk diverges from the pair definition")
    assert(wm.nonEmpty)
    // the pair join is GONE from the production plan
    val plan = walk.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q287 still plans a join:\n$plan")
  }

  test("SCD2 collapses runs and chains valid_from/valid_to") {
    val events = Seq(
      (1L, ts(1), 10L, "A"), (2L, ts(2), 10L, "A"),
      (3L, ts(3), 10L, "B"), (4L, ts(4), 10L, "A")
    ).toDF("event_id", "ts", "user_id", "state")
    val rows = Timeline.scd2Intervals(events)
      .orderBy("version").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("A", "B", "A"))
    assert(rows(0).getTimestamp(2) === ts(1) && rows(0).getTimestamp(3) === ts(3))
    assert(rows(1).getTimestamp(2) === ts(3) && rows(1).getTimestamp(3) === ts(4))
    assert(rows(2).getTimestamp(2) === ts(4) && rows(2).getTimestamp(3) === null)
  }

  test("SCD2 intervals chain per user on the corpus (valid_to == next valid_from)") {
    val scd = Timeline.q111Scd2(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val broken = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .where(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
      .count()
    assert(broken === 0)
    // exactly one open (NULL valid_to) interval per user
    val opens = scd.where(col("valid_to").isNull).groupBy("user_id").count()
      .where(col("count") =!= 1).count()
    assert(opens === 0)
  }

  // ---------------------------------------------------------------- q113

  test("rolling anomaly flags a spike after a constant run, integer math agrees with floats") {
    val events = (1 to 6).map(i => (i.toLong, ts(i), 5L, "view", 10.0)) :+
      (7L, ts(7), 5L, "view", 100.0)
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Timeline.rollingAnomaly(df, 10, 5)
      .select("event_id", "is_scored", "is_anomaly").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(out(7L) === ((true, true)))  // 100 vs constant 10s: infinite z
    assert(out(6L) === ((true, false))) // 10 vs constant 10s: zero deviation
    assert(out(3L)._1 === false)        // only 2 prior events: unscored
  }

  test("rolling anomaly counters are consistent on the corpus") {
    val rows = Timeline.q113Anomaly(spark, sfDir)
      .agg(sum("n_events").as("e"), sum("n_scored").as("s"), sum("n_anomalies").as("a"))
      .collect()(0)
    assert(rows.getLong(0) >= rows.getLong(1) && rows.getLong(1) >= rows.getLong(2))
    assert(rows.getLong(2) > 0) // detector actually fires somewhere
  }

  // ---------------------------------------------------------------- q114

  test("forward fill carries the last observation and is NULL before the first") {
    val events = Seq(
      (1L, ts(1), 9L, "view", 1.0), (2L, ts(2), 9L, "purchase", 42.0),
      (3L, ts(3), 9L, "view", 2.0), (4L, ts(4), 9L, "purchase", 7.0),
      (5L, ts(5), 9L, "error", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val filled = Timeline.forwardFill(events,
        _.withColumn("signal", when(col("event_type") === "purchase", col("value"))))
      .orderBy("event_id").select("filled").collect().map(r => Option(r.get(0)))
    assert(filled === Seq(None, Some(42.0), Some(42.0), Some(7.0), Some(7.0)))
  }

  // ---------------------------------------------------------------- q115

  test("k-means step: membership counts are per-cell constant and total to the corpus") {
    val out = VecMore.q115KmeansStep(spark, sfDir)
    val perCell = out.groupBy("cell")
      .agg(countDistinct("n_members").as("distinct_n"), count(lit(1)).as("n_dims"))
      .collect()
    perCell.foreach { r =>
      assert(r.getLong(1) === 1L)  // n_members identical across dims
      assert(r.getLong(2) === 64L) // one row per dimension
    }
    val total = out.where(col("pos") === 0).agg(sum("n_members")).collect()(0).getLong(0)
    val corpus = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(total === corpus)
  }

  // ---------------------------------------------------------------- q116

  test("co-occurrence: n_both bounded by min doc frequency") {
    val bad = VecMore.q116Cooccurrence(spark, sfDir)
      .where(col("n_both") > least(col("n_a"), col("n_b"))).count()
    assert(bad === 0)
  }

  // ---------------------------------------------------------------- q117

  test("posexplode_outer keeps parents with empty arrays (null-pos rows)") {
    val out = SetsAndScalars.q117GeneratorSweep(spark, sfDir)
    val emptyParts = graft.sources.Tables.part(spark, sfDir)
      .where(col("p_partkey") < 100 && col("p_size") % 3 === 0).count()
    val nullRows = out.where(col("src") === "words" && col("pos").isNull).count()
    assert(nullRows === emptyParts)
    assert(out.where(col("src") === "stack").count() > 0)
    assert(out.where(col("src") === "inline").count() > 0)
  }
}
