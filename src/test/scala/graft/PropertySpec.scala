package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators._

/** Property-based invariants: dedup idempotence, top-k monotonicity,
  * window-sum conservation. Uses scalacheck generators sampled with fixed
  * seeds (the scalatest↔scalacheck bridge artifact isn't available offline).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val textsGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf(
      "the quick brown fox jumps over the lazy dog again and again",
      "spark query engine processes columnar batches with codegen",
      "the quick brown fox jumps over the lazy dog again and again!",
      "completely unrelated content about storage systems and caches"))

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    samples(textsGen, 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
        d.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      }
      val once = dedup(df)
      val twice = dedup(once)
      assert(once.select("doc_id").collect().toSet === twice.select("doc_id").collect().toSet)
      assert(once.count() === texts.distinct.size)
    }
  }

  test("top-k is monotone: top-k rows ⊆ top-(k+5) rows") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    def top(n: Int) = orders.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(n).select("o_orderkey").collect().map(_.getLong(0)).toSet
    samples(Gen.chooseNum(1, 20), 5).foreach { k =>
      assert(top(k).subsetOf(top(k + 5)))
    }
  }

  test("window running total ends at the group total (sum conservation)") {
    val frames = Windows.q16WindowFrames(spark, sfDir)
    val finals = frames.groupBy("o_custkey").agg(max("run_total").as("final_run"))
    val direct = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(Det.dsum(col("o_totalprice")).as("direct"))
    val diff = finals.join(direct, "o_custkey")
      .where(abs(col("final_run") - col("direct")) > 1e-9).count()
    assert(diff === 0)
  }

  test("jaccard pair output is canonical (doc_a < doc_b always)") {
    val pairs = Dedup.q33NgramJaccard(spark, sfDir)
    assert(pairs.where(col("doc_a") >= col("doc_b")).count() === 0)
  }

  test("minhash_sig estimates jaccard within sketch error on random shingle sets") {
    // Random long-sets with RANDOM-membership overlap (a prefix subset would
    // correlate with hash minima under a weak family — which is exactly the
    // bug this test caught in the original small-multiplier affine family).
    // k=48 → σ = √(j(1−j)/48) ≤ 0.073; assert within 4σ + slack.
    val setGen = for {
      base <- Gen.listOfN(500, Gen.chooseNum(0L, 1000000000L))
      mask <- Gen.listOfN(500, Gen.chooseNum(0, 2)) // 0: a only, 1: both, 2: b only
    } yield {
      val items = base.distinct.zip(mask)
      (items.collect { case (x, m) if m <= 1 => x },
        items.collect { case (x, m) if m >= 1 => x })
    }
    samples(setGen, 8).foreach { case (a, b) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val trueJ = inter / (a.toSet ++ b.toSet).size
      val df = Seq((1L, a.toArray), (2L, b.toArray)).toDF("id", "sh")
        .selectExpr("id", "minhash_sig(sh, 48) AS sig")
      val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 48.0
      assert(math.abs(est - trueJ) <= 0.30, s"est=$est true=$trueJ")
    }
  }

  test("percentile_approx honors its rank-error bound under ANY partitioning (merge contract)") {
    // The scale contract of sketch aggregation: partial sketches built on
    // arbitrary partitions and merged in arbitrary order must still land
    // within the accuracy bound eps = 1/accuracy of the true rank. (Exact
    // equality across partitionings is NOT guaranteed — merge order shifts
    // which sample survives — so the bound, not the value, is the
    // invariant a 1000-executor plan relies on.)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v"))
    val n = li.count()
    val accuracy = 100
    val sorted = li.orderBy(col("v")).collect().map(_.getDouble(0))
    for (parts <- Seq(1, 4, 32); q <- Seq(0.1, 0.5, 0.9)) {
      val approx = li.repartition(parts)
        .agg(expr(s"approx_percentile(v, $q, $accuracy)")).head.getDouble(0)
      // observed rank of the approx answer vs target rank, in units of n
      val rank = sorted.count(_ <= approx).toDouble
      val err = math.abs(rank / n - q)
      assert(err <= 1.0 / accuracy + 1.0 / n,
        f"parts=$parts q=$q: approx=$approx rank-err=$err%.4f > eps")
    }
  }

  test("as-of window rewrite matches a brute-force reference on adversarial streams") {
    // Equal-timestamp ties (click@ts vs purchase@ts counts; among equal-ts
    // clicks the max id wins) and clickless purchases — the cases the
    // join-free rewrite must get right.
    val evGen = Gen.listOfN(40, for {
      user <- Gen.chooseNum(1L, 3L)
      tsMin <- Gen.chooseNum(0, 8) // tiny range → many exact ties
      isClick <- Gen.oneOf(true, false)
    } yield (user, tsMin, isClick))
    samples(evGen, 6).foreach { evs =>
      val rows = evs.zipWithIndex.map { case ((u, m, c), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0$m%d:00"), u,
          if (c) "click" else "purchase", 1.0)
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = EventOps.asofJoin(df)
        .select("p_id", "asof_click_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val clicks = rows.filter(_._4 == "click")
      val expected = rows.filter(_._4 == "purchase").flatMap { p =>
        val cands = clicks.filter(c => c._3 == p._3 && !c._2.after(p._2))
        if (cands.isEmpty) None
        else Some(p._1 -> cands.maxBy(c => (c._2.getTime, c._1))._1)
      }.toMap
      assert(got === expected)
    }
  }

  test("int8 quantization reconstructs every element within half a step") {
    val out = Similarity.q95EmbeddingQuantize(spark, sfDir)
    val joined = graft.sources.Tables.embeddings(spark, sfDir)
      .join(out, "vec_id")
      .selectExpr("vec_id", "max_abs",
        // recompute q inline (same formula) and check the reconstruction gap
        "aggregate(embedding, CAST(0 AS DOUBLE), (worst, x) -> " +
          "greatest(worst, abs(CAST(floor(CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5) AS INT) " +
          "* (max_abs / 127.0) - CAST(x AS DOUBLE)))) AS worst_gap")
    val bad = joined.where(col("worst_gap") > col("max_abs") / lit(127.0) / lit(2.0) + lit(1e-9))
    assert(bad.count() === 0)
  }

  test("shard packing conserves tokens and fills every non-final shard to budget") {
    val shards = TextAnalysis.q96ShardPacking(spark, sfDir)
    val direct = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), size(split(col("text"), " ")).as("toks"))
      .groupBy("lang").agg(sum("toks").as("total_tokens"))
    // conservation: shard sums add back to the per-lang total
    val sums = shards.groupBy("lang").agg(sum("sum_tokens").as("packed"))
      .join(direct, "lang").where(col("packed") =!= col("total_tokens"))
    assert(sums.count() === 0)
    // every shard except a language's last holds >= the 4000-token budget
    val lastShard = shards.groupBy("lang").agg(max("shard").as("last_shard"))
    val underfull = shards.join(lastShard, "lang")
      .where(col("shard") =!= col("last_shard") && col("sum_tokens") < 4000)
    assert(underfull.count() === 0)
  }

  test("shingle_hashes walks codepoints: non-ASCII text matches a reference fold") {
    // Unicode text: the kernel must window/fold per CODEPOINT (as DuckDB's
    // unicode(substr(...)) does), not per UTF-8 byte.
    val text = "héllo wörld ünïcode çafé naïve résumé façade"
    val w = 5
    val cps = text.codePoints().toArray
    val P = 1000000007L
    val expected = (0 to cps.length - w).map { s =>
      cps.slice(s, s + w).foldLeft(0L)((acc, c) => (acc * 31 + c) % P)
    }.distinct.sorted
    val got = Seq(Tuple1(text)).toDF("t")
      .selectExpr(s"shingle_hashes(t, $w) AS sh")
      .head.getSeq[Long](0)
    assert(got === expected)
  }

  test("SegmentedIndex: any batch sequence with random replays + compaction reads back the exact union") {
    // The storage-state invariant every streaming face leans on: after N
    // batches land (some redelivered — the crash-replay case) and any
    // number of compactions fire, read() returns EXACTLY the union of the
    // batches' rows — no replay duplicates, no rows lost across
    // compactions, regardless of batch sizes or replay points.
    val schema = "k BIGINT, v STRING"
    val rng = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_segprop_$trial").toString
      val batches = (0 until 6).map { b =>
        val n = 1 + rng.nextInt(5)
        (0 until n).map(i => (b * 100L + i, s"row_${b}_$i"))
      }
      batches.zipWithIndex.foreach { case (rows, id) =>
        def land(): Unit = graft.sources.SegmentedIndex.writeBatch(
          rows.toDF("k", "v"), dir, id.toLong, schema,
          compactEvery = 3, compactPartitions = 2, sortCol = "k")
        land()
        if (rng.nextBoolean()) land() // random crash-replay redelivery
      }
      val gotRows = graft.sources.SegmentedIndex.read(spark, dir, schema)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val expected = batches.flatten.toSet
      assert(gotRows.toSet === expected, s"trial $trial: rows differ")
      // EXACT multiset: replays (even of already-compacted batches) must
      // not leave duplicate physical rows behind
      assert(gotRows.size === expected.size,
        s"trial $trial: ${gotRows.size} physical rows for ${expected.size} logical")
    }
  }
}
