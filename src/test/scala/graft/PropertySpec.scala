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

  test("KLL sketch quantiles honor the rank-error bound under ANY partitioning (merge contract)") {
    // Spark 4's datasketches KLL is RANDOMIZED (compaction offsets), so —
    // unlike approx_percentile — even its value cannot be oracle-matched or
    // hash-pinned; the shippable contract is the rank-error bound under
    // arbitrary partial-sketch merge orders, same as the percentile test
    // above. Default k=200 ⇒ single-sided normalized rank error ≈1.65%;
    // assert a conservative 3%.
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v"))
    val n = li.count()
    val sorted = li.orderBy(col("v")).collect().map(_.getDouble(0))
    for (parts <- Seq(1, 4, 32); q <- Seq(0.1, 0.5, 0.9)) {
      val approx = li.repartition(parts)
        .selectExpr(s"kll_sketch_get_quantile_double(kll_sketch_agg_double(v), $q) AS a")
        .head.getDouble(0)
      val rank = sorted.count(_ <= approx).toDouble
      val err = math.abs(rank / n - q)
      assert(err <= 0.03 + 1.0 / n, f"parts=$parts q=$q: approx=$approx rank-err=$err%.4f")
    }
    // and the merge face: per-group partials merged with kll_merge_agg_double
    val merged = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"))
      .selectExpr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5) AS a")
      .head.getDouble(0)
    val rank = sorted.count(_ <= merged).toDouble
    assert(math.abs(rank / n - 0.5) <= 0.03 + 1.0 / n, s"merged median $merged")
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

  test("staging catalog: random INSERT/DELETE/OPTIMIZE/CLUSTER/VACUUM sequences match a model") {
    // The lakehouse-state invariant behind q248/q250/q253/q257/q261: after
    // ANY interleaving of appends, copy-on-write deletes, layout rewrites,
    // and retention, (a) the current read equals the model, (b) every
    // RETAINED version reads back exactly its snapshot, (c) vacuumed
    // versions error, (d) commit-only change-feed ranges equal the model
    // delta and rewrite-crossing ranges are refused.
    import graft.sources.catalog.StagingMaintenance
    val rng = new scala.util.Random(4242)
    spark.conf.set("spark.sql.catalog.prop_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    // one root for all trials: the session caches the initialized catalog
    // instance, so per-trial roots would desync conf from catalog state
    spark.conf.set("spark.sql.catalog.prop_cat.root",
      java.nio.file.Files.createTempDirectory("graft_catprop_").toString)
    (0 until 2).foreach { trial =>
      spark.sql("CREATE NAMESPACE IF NOT EXISTS prop_cat.ws")
      spark.sql(s"DROP TABLE IF EXISTS prop_cat.ws.t$trial")
      var nextKey = 0L
      def freshRange(n: Int): (Long, Long) = { val lo = nextKey; nextKey += n; (lo, nextKey) }
      val model = scala.collection.mutable.SortedSet.empty[Long]
      // version -> (kind, snapshot); CTAS below is version 1
      val versions = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Set[Long])]
      val (lo0, hi0) = freshRange(50 + rng.nextInt(100))
      // checkpoint arm: interval 3 makes log checkpoints + pointer rewrites
      // interleave with the random vacuums/tags/restores below, so every
      // invariant (a)-(d) also exercises pointer-resolved reads — including
      // reads through a pointer VACUUM just re-wrote and reads falling back
      // to the listing when the random walk outruns the checkpoint
      spark.sql(s"CREATE TABLE prop_cat.ws.t$trial " +
        "TBLPROPERTIES ('graft.checkpoint-interval'='3') " +
        s"AS SELECT id AS k FROM range($lo0, $hi0)")
      model ++= (lo0 until hi0)
      versions(1L) = ("commit", model.toSet)
      // tag name -> pinned version (the VACUUM-retention exemption)
      val tagged = scala.collection.mutable.Map.empty[String, Long]
      // live WAP branch: (name, fork version, per-branch-commit snapshots)
      var liveBranch: Option[(String, Long,
        scala.collection.mutable.ArrayBuffer[Set[Long]])] = None
      var v = 1L
      (0 until 12).foreach { _ =>
        rng.nextInt(12) match {
          case 0 | 1 => // append a fresh slice
            val (lo, hi) = freshRange(20 + rng.nextInt(60))
            spark.sql(s"INSERT INTO prop_cat.ws.t$trial SELECT id AS k FROM range($lo, $hi)")
            model ++= (lo until hi)
            v += 1; versions(v) = ("commit", model.toSet)
          case 2 => // copy-on-write range delete (possibly empty)
            val a = rng.nextLong(math.max(nextKey, 1L)); val b = a + 1 + rng.nextInt(80)
            spark.sql(s"DELETE FROM prop_cat.ws.t$trial WHERE k >= $a AND k < $b")
            model --= model.rangeImpl(Some(a), Some(b)).toSeq
            v += 1; versions(v) = ("delete", model.toSet)
          case 3 => // layout rewrite (plain or clustered)
            val cluster = if (rng.nextBoolean()) Some("k") else None
            StagingMaintenance.optimize(spark, "prop_cat", "ws", s"t$trial",
              targetFiles = 1 + rng.nextInt(3), clusterBy = cluster)
            v += 1; versions(v) = ("optimize", model.toSet)
          case 4 => // bounded retention — tagged versions AND a live
            // branch's fork version are exempt
            val retain = 1 + rng.nextInt(3)
            StagingMaintenance.vacuum(spark, "prop_cat", "ws", s"t$trial", retainLast = retain)
            val keep = (versions.keys.toSeq.takeRight(retain) ++ tagged.values ++
              liveBranch.map(_._2)).toSet
            versions.filterInPlace { case (k, _) => keep(k) }
          case 5 => // SQL UPDATE via the group-based row-level rewrite:
            // shift a key range far outside the live keyspace
            val a = rng.nextLong(math.max(nextKey, 1L)); val b = a + 1 + rng.nextInt(50)
            spark.sql(s"UPDATE prop_cat.ws.t$trial SET k = k + 1000000 " +
              s"WHERE k >= $a AND k < $b")
            val moved = model.rangeImpl(Some(a), Some(b)).toSeq
            model --= moved; model ++= moved.map(_ + 1000000L)
            v += 1; versions(v) = ("update", model.toSet)
          case 6 => // metadata-only RESTORE to a random retained version
            val target = versions.keys.toSeq(rng.nextInt(versions.size))
            StagingMaintenance.restore(spark, "prop_cat", "ws", s"t$trial", target)
            model.clear(); model ++= versions(target)._2
            v += 1; versions(v) = ("restore", model.toSet)
          case 7 => // atomic INSERT OVERWRITE (truncate-and-load)
            val (lo, hi) = freshRange(20 + rng.nextInt(40))
            spark.sql(s"INSERT OVERWRITE prop_cat.ws.t$trial " +
              s"SELECT id AS k FROM range($lo, $hi)")
            model.clear(); model ++= (lo until hi)
            v += 1; versions(v) = ("overwrite", model.toSet)
          case 8 => // tag the current head (metadata-only, no new version)
            val name = s"pin_${trial}_$v"
            if (!tagged.contains(name)) {
              StagingMaintenance.tag(spark, "prop_cat", "ws", s"t$trial", name)
              tagged(name) = v
            }
          case 9 => // drop a random tag: its version re-enters retention
            if (tagged.nonEmpty) {
              val name = tagged.keys.toSeq(rng.nextInt(tagged.size))
              StagingMaintenance.dropTag(spark, "prop_cat", "ws", s"t$trial", name)
              tagged -= name
            }
          case 10 => // WAP branch arm: fork, or ingest onto the live branch
            liveBranch match {
              case None =>
                val name = s"b${trial}_$v"
                StagingMaintenance.branch(spark, "prop_cat", "ws", s"t$trial", name)
                liveBranch = Some((name, v, scala.collection.mutable.ArrayBuffer.empty))
              case Some((name, _, snaps)) =>
                val (lo, hi) = freshRange(10 + rng.nextInt(30))
                spark.sql(s"INSERT INTO prop_cat.ws.t$trial.branch_$name " +
                  s"SELECT id AS k FROM range($lo, $hi)")
                val bm = snaps.lastOption.getOrElse(
                  // a branch reads the FORK snapshot until it commits; the
                  // fork version may have been vacuumed from the model map
                  // only if untagged AND unpinned — the fork is pinned, so
                  // read the face itself for the base (cheap at test scale)
                  spark.sql(s"SELECT k FROM prop_cat.ws.t$trial.branch_$name")
                    .collect().map(_.getLong(0)).toSet -- (lo until hi)) ++ (lo until hi)
                snaps += bm
                // branch-face read == branch model; MAIN isolation is (a)
                val bcur = spark.sql(s"SELECT k FROM prop_cat.ws.t$trial.branch_$name")
                  .collect().map(_.getLong(0))
                assert(bcur.length === bm.size && bcur.toSet === bm,
                  s"trial $trial: branch read diverged")
            }
          case 11 => // publish (legal only at the fork) or drop the branch
            liveBranch.foreach { case (name, fork, snaps) =>
              if (v != fork) {
                // main advanced since the fork: publish MUST conflict…
                val e = intercept[Exception] {
                  StagingMaintenance.publish(spark, "prop_cat", "ws", s"t$trial", name)
                }
                assert(e.getMessage.contains("publish conflict"), e.getMessage)
                // …and the candidate is dropped; main never saw it
                StagingMaintenance.dropBranch(spark, "prop_cat", "ws", s"t$trial", name)
              } else if (snaps.isEmpty || rng.nextBoolean()) {
                StagingMaintenance.dropBranch(spark, "prop_cat", "ws", s"t$trial", name)
              } else {
                StagingMaintenance.publish(spark, "prop_cat", "ws", s"t$trial", name)
                // each branch commit becomes a main version with its snapshot
                snaps.foreach { snap =>
                  v += 1; versions(v) = ("commit", snap)
                }
                model.clear(); model ++= snaps.last
              }
              liveBranch = None
            }
        }
        // (a) current read == model
        val cur = spark.sql(s"SELECT k FROM prop_cat.ws.t$trial").collect().map(_.getLong(0))
        assert(cur.length === model.size && cur.toSet === model.toSet,
          s"trial $trial v$v: current read diverged from model")
      }
      // (b) every retained version reads back its exact snapshot
      versions.foreach { case (ver, (_, snap)) =>
        val got = spark.sql(s"SELECT k FROM prop_cat.ws.t$trial VERSION AS OF $ver")
          .collect().map(_.getLong(0))
        assert(got.length === snap.size && got.toSet === snap,
          s"trial $trial: VERSION AS OF $ver diverged")
      }
      // (b') every TAG resolves by name to exactly its pinned snapshot —
      // however many vacuums ran since it was created
      tagged.foreach { case (name, ver) =>
        val got = spark.sql(s"SELECT k FROM prop_cat.ws.t$trial VERSION AS OF '$name'")
          .collect().map(_.getLong(0)).toSet
        assert(got === versions(ver)._2, s"trial $trial: tag $name (v$ver) diverged")
      }
      // (c) a vacuumed (or never-minted) version errors clearly
      val dropped = (1L to v).find(!versions.contains(_))
      dropped.foreach { ver =>
        val e = intercept[Exception] {
          spark.sql(s"SELECT k FROM prop_cat.ws.t$trial VERSION AS OF $ver").collect()
        }
        assert(e.getMessage.contains("version"), e.getMessage)
      }
      // (d) change feed over adjacent retained COMMIT pairs == model delta;
      // ranges crossing a rewrite are refused
      val retained = versions.toSeq
      retained.sliding(2).foreach {
        case Seq((v1, (_, s1)), (v2, (k2, s2))) if v2 == v1 + 1 =>
          if (k2 == "commit") {
            val delta = StagingMaintenance
              .changesBetween(spark, "prop_cat", "ws", s"t$trial", v1, v2)
              .collect().map(_.getLong(0)).toSet
            assert(delta === (s2 -- s1), s"trial $trial: feed $v1->$v2 diverged")
          } else {
            val e = intercept[IllegalArgumentException] {
              StagingMaintenance.changesBetween(spark, "prop_cat", "ws", s"t$trial", v1, v2).collect()
            }
            assert(e.getMessage.contains(k2.toUpperCase), e.getMessage)
          }
        case _ => ()
      }
    }
  }

  test("merge-on-read catalog: random MERGE/DELETE/OPTIMIZE/RESTORE/VACUUM sequences match a keyed model") {
    // The deletion-vector twin of the copy-on-write model test above: the
    // table is a keyed current-state store (the CDC shape MOR exists for).
    // After ANY interleaving of keyed upserts (DV + fresh files, zero
    // rewrites), keyed deletes (DV-only), folds, restores, and retention:
    // (a) the current read equals the keyed model, (b) every retained
    // version reads back ITS snapshot under ITS deletion vectors, (c)
    // OPTIMIZE always leaves the head version DV-free, and (d) a MERGE
    // commit never removes a pre-existing file from the manifest.
    import graft.sources.catalog.StagingMaintenance
    val rng = new scala.util.Random(9119)
    spark.conf.set("spark.sql.catalog.morp_cat",
      classOf[graft.sources.catalog.GraftStagingCatalog].getName)
    spark.conf.set("spark.sql.catalog.morp_cat.root",
      java.nio.file.Files.createTempDirectory("graft_morprop_").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morp_cat.ws")
    spark.sql("DROP TABLE IF EXISTS morp_cat.ws.m")
    spark.sql(
      """CREATE TABLE morp_cat.ws.m (k BIGINT NOT NULL, v BIGINT)
        |TBLPROPERTIES ('graft.write.mode'='merge-on-read', 'graft.merge-keys'='k')""".stripMargin)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    val versions = scala.collection.mutable.LinkedHashMap.empty[Long, Map[Long, Long]]
    var payload = 0L
    def nextPayload(): Long = { payload += 1; payload }
    spark.sql("INSERT INTO morp_cat.ws.m SELECT id, id * 10 FROM range(0, 60)") // v1
    (0L until 60L).foreach(k => model(k) = k * 10)
    versions(1L) = model.toMap
    var v = 1L
    def currentFiles(): Set[String] =
      StagingMaintenance.currentFileNames(spark, "morp_cat", "ws", "m").toSet
    (0 until 12).foreach { step =>
      rng.nextInt(6) match {
        case 0 | 1 => // keyed MERGE upsert: mixed existing + fresh keys
          val existing = model.keys.toSeq
          val batch = ((0 until 1 + rng.nextInt(6)).map { _ =>
            if (existing.nonEmpty && rng.nextBoolean()) existing(rng.nextInt(existing.size))
            else 1000L + rng.nextLong(1000L)
          }).distinct.map(k => (k, nextPayload()))
          import spark.implicits._
          batch.toDF("k", "v").createOrReplaceTempView("morp_src")
          val before = currentFiles()
          spark.sql(
            """MERGE INTO morp_cat.ws.m t USING morp_src s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET v = s.v
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          assert(before.subsetOf(currentFiles()),
            s"step $step: MOR MERGE dropped a pre-existing file")
          batch.foreach { case (k, p) => model(k) = p }
          v += 1; versions(v) = model.toMap
        case 2 => // keyed DELETE: DV-only, file set unchanged
          val existing = model.keys.toSeq
          val victims =
            if (existing.isEmpty) Seq(999999L)
            else (0 until 1 + rng.nextInt(4)).map(_ => existing(rng.nextInt(existing.size)))
              .distinct
          val before = currentFiles()
          spark.sql(
            s"DELETE FROM morp_cat.ws.m WHERE k IN (${victims.mkString(",")})")
          assert(currentFiles() === before,
            s"step $step: MOR DELETE must not change the file set")
          victims.foreach(model.remove)
          v += 1; versions(v) = model.toMap
        case 3 => // fold: OPTIMIZE leaves the head DV-free
          StagingMaintenance.optimize(spark, "morp_cat", "ws", "m",
            targetFiles = 1 + rng.nextInt(3))
          assert(StagingMaintenance.activeDvs(spark, "morp_cat", "ws", "m").isEmpty,
            s"step $step: OPTIMIZE left active DVs")
          v += 1; versions(v) = model.toMap
        case 4 => // metadata-only RESTORE to a random retained version
          val target = versions.keys.toSeq(rng.nextInt(versions.size))
          StagingMaintenance.restore(spark, "morp_cat", "ws", "m", target)
          model.clear(); model ++= versions(target)
          v += 1; versions(v) = model.toMap
        case 5 => // bounded retention
          val retain = 1 + rng.nextInt(3)
          StagingMaintenance.vacuum(spark, "morp_cat", "ws", "m", retainLast = retain)
          val keep = versions.keys.toSeq.takeRight(retain).toSet
          versions.filterInPlace { case (ver, _) => keep(ver) }
      }
      // (a) current read == keyed model (exactly one row per live key)
      val cur = spark.sql("SELECT k, v FROM morp_cat.ws.m").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(cur.length === model.size && cur.toMap === model.toMap,
        s"step $step: current read diverged from keyed model")
    }
    // (b) every retained version reads back ITS snapshot under ITS DVs
    versions.foreach { case (ver, snap) =>
      val got = spark.sql(s"SELECT k, v FROM morp_cat.ws.m VERSION AS OF $ver")
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(got.length === snap.size && got.toMap === snap,
        s"VERSION AS OF $ver diverged from its MOR snapshot")
    }
  }
}
