package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Invariant + plan-shape checks for the corpus-curation operators
  * (decontamination, stratified sampling, context packing, quality filter,
  * random projection, incremental dedup). Value-level correctness is the
  * driver's DuckDB oracle; these assert the semantic invariants and the
  * scale-critical plan shapes.
  */
class CurationSpec extends SparkSpec {

  test("q98 contamination counts are bounded by the training counts") {
    val rows = Curation.q98Decontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (train, cont) = (r.getLong(1), r.getLong(2))
      assert(cont >= 0 && cont <= train, s"lang=${r.getString(0)} $cont/$train")
    }
  }

  test("q98 eval-index probe broadcasts (no shuffle join for the semi probe)") {
    val p = Curation.q98Decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q99 samples at most 50 per stratum, ranks contiguous from 1") {
    val df = Curation.q99StratifiedSample(spark, sfDir)
    val perLang = df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("rk")).as("lo"), max(col("rk")).as("hi"))
      .collect()
    perLang.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getInt(2), r.getInt(3))
      assert(n <= 50 && lo == 1 && hi == n, r.toString)
    }
  }

  test("q99 re-evaluates to the same sample (deterministic, no RNG state)") {
    val a = Curation.q99StratifiedSample(spark, sfDir).collect().toSeq
    val b = Curation.q99StratifiedSample(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("q100 window token sums reconstruct the corpus total") {
    val packed = Curation.q100PackContext(spark, sfDir)
    val total = packed.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val direct = graft.sources.Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(total == direct, s"packed=$total direct=$direct")
  }

  test("q100 window ids are dense per lang starting at 0") {
    Curation.q100PackContext(spark, sfDir)
      .groupBy(col("lang"))
      .agg(min(col("window_id")).as("lo"), max(col("window_id")).as("hi"),
        countDistinct(col("window_id")).as("n"))
      .collect()
      .foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1, r.toString)
      }
  }

  test("q101 per-reason counts and kept partition the corpus consistently") {
    Curation.q101QualityFilter(spark, sfDir).collect().foreach { r =>
      val n = r.getLong(1)
      val kept = r.getLong(5)
      assert(kept <= n)
      // kept + (docs failing >= 1 rule) = n, and each rule count <= n
      (2 to 4).foreach(i => assert(r.getLong(i) <= n, r.toString))
    }
  }

  test("q102 projection is map-only (no exchange in the plan)") {
    val p = Curation.q102RandomProjection(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the final orderBy sorts, but nothing before it should shuffle for the
    // projection itself; assert no hash-partitioned exchange
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q102 emits 8 dims per vector") {
    val df = Curation.q102RandomProjection(spark, sfDir)
    val bad = df.groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .where(col("n") =!= 8).count()
    assert(bad == 0)
  }

  test("q103 n_dup + n_fresh = n_new per lang") {
    Curation.q103IncrementalDedup(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), r.toString)
    }
  }

  // ------------- generative brute-force cross-checks on the core API -------

  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "x1", "##", "a")

  /** Deterministic pseudo-random corpus: (doc_id, text, lang). */
  private def corpus(n: Int, seed: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val text = Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")
      (i.toLong, text, s"l${rnd.nextInt(3)}")
    }
  }

  test("contaminatedDocs matches brute-force n-gram overlap on random corpora") {
    (1 to 3).foreach { seed =>
      val rows = corpus(40, seed)
      val docs = rows.toDF("doc_id", "text", "lang")
      val w = 5
      // shingle_hashes emits one whole-text shingle when len < width (the
      // DuckDB CTE's greatest(len - w + 1, 1) lower bound) — mirror that
      def grams(t: String): Set[String] =
        if (t.length < w) Set(t) else (0 to t.length - w).map(i => t.substring(i, i + w)).toSet
      val evalGrams = rows.filter(_._1 % 5 == 0).flatMap(r => grams(r._2)).toSet
      val expected = rows.filter(r => r._1 % 5 != 0 && grams(r._2).intersect(evalGrams).nonEmpty)
        .map(_._1).toSet
      val got = Curation.contaminatedDocs(docs, col("doc_id") % 5 === 0, w)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("stratifiedSample matches brute-force md5-order selection") {
    (1 to 3).foreach { seed =>
      val rows = corpus(60, seed)
      val docs = rows.toDF("doc_id", "text", "lang")
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = rows.groupBy(_._3).flatMap { case (_, rs) =>
        rs.sortBy(r => (md5hex(r._1.toString), r._1)).take(7).map(_._1)
      }.toSet
      val got = Curation.stratifiedSample(docs, col("lang"), 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("packContext matches brute-force running-sum assignment") {
    (1 to 3).foreach { seed =>
      val rows = corpus(50, seed)
      val docs = rows.toDF("doc_id", "text", "lang")
      val budget = 40
      val expected = rows.groupBy(_._3).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy(_._1).map { r =>
          val tok = r._2.split(" ", -1).length.toLong
          val win = cum / budget
          cum += tok
          r._1 -> win
        }
      }
      val got = Curation.packContext(docs, col("lang"), budget)
        .select("doc_id", "window_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected.toMap, s"seed=$seed")
    }
  }

  test("batchDuplicates matches brute-force content membership") {
    (1 to 3).foreach { seed =>
      val rows = corpus(50, seed)
      val docs = rows.toDF("doc_id", "text", "lang")
      val idxTexts = rows.filter(_._1 % 2 == 0).map(_._2).toSet
      val expected = rows.filter(r => r._1 % 2 == 1 && idxTexts.contains(r._2)).map(_._1).toSet
      val got = Curation.batchDuplicates(
          docs.where(col("doc_id") % 2 === 1), docs.where(col("doc_id") % 2 === 0))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomProjectionQ matches a brute-force IEEE fold") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val dim = 16
    val expected = vecs.flatMap { case (id, v) =>
      (0 until 4).map { j =>
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val c = ((1103515245L * (j * dim + i) + 12345L) % 2048 - 1024).toDouble / 1024.0
          acc += v(i).toDouble * c
          i += 1
        }
        (id, j.toLong) -> math.floor(acc * 1000.0).toLong
      }
    }.toMap
    val got = Curation.randomProjectionQ(df, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }
}
