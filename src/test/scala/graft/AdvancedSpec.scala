package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Invariant tests for the round-2 operator batch (q51–q68). */
class AdvancedSpec extends SparkSpec {

  test("q51 moments: std² == var and corr bounded in [-1, 1]") {
    val rows = AdvancedSql.q51StatsMoments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val varQ = r.getAs[Double]("var_qty")
      val stdQ = r.getAs[Double]("std_qty")
      val corr = r.getAs[Double]("corr_qty_price")
      assert(math.abs(stdQ * stdQ - varQ) <= 1e-9 * varQ)
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q52 percentiles are ordered p0 <= p25 <= p50 <= p75 <= p100") {
    AdvancedSql.q52Percentiles(spark, sfDir).collect().foreach { r =>
      val vs = Seq("p0", "p25", "p50", "p75", "p100").map(r.getAs[Double])
      assert(vs == vs.sorted, s"unordered: $vs")
    }
  }

  test("q53 correlated scalar subquery keeps only above-1.2x-avg orders") {
    val out = AdvancedSql.q53ScalarSubquery(spark, sfDir)
    val avg = graft.sources.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("k"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("a"))
    val viol = out.join(avg, col("o_custkey") === col("k"))
      .where(col("o_totalprice") <= lit(1.2) * col("a"))
    assert(viol.count() === 0)
  }

  test("q58 array invariants: |A∪B| == |A| + |B| - |A∩B|") {
    AdvancedSql.q58ArrayFuncs(spark, sfDir).collect().foreach { r =>
      val union = r.getAs[Int]("union_sz")
      val inter = r.getAs[Int]("inter_sz")
      assert(union === 7 + 7 - inter)
      assert(r.getAs[Int]("except_sz") === 7 - inter)
    }
  }

  test("q59 tpch-q3 returns at most 10 rows in strict revenue order") {
    val rows = Composite.q59TpchQ3(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("q61 hash sample keeps roughly 5% of distinct orders") {
    val total = graft.sources.Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_orderkey"))).head.getLong(0)
    val sampled = Composite.q61HashSample(spark, sfDir)
      .head.getAs[Long]("sample_orders")
    val frac = sampled.toDouble / total
    assert(frac > 0.02 && frac < 0.09, s"fraction $frac out of band")
  }

  test("q62 date spine is gapless monthly") {
    val months = Composite.q62DateSpine(spark, sfDir)
      .select(col("month")).collect().map(_.getTimestamp(0).toInstant)
    assert(months.length === 84) // 1995-01 .. 2001-12
    assert(months.toSeq == months.toSeq.sorted)
  }

  test("q65 lexical diversity: hapax <= vocab <= total_tokens, 0 < ttr <= 1") {
    TextAnalysis.q65LexicalDiversity(spark, sfDir).collect().foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val vocab = r.getAs[Long]("vocab")
      val hapax = r.getAs[Long]("hapax")
      val ttr = r.getAs[Double]("ttr")
      assert(hapax <= vocab && vocab <= total)
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("q66 histogram shares sum to 1") {
    val shares = TextAnalysis.q66LengthHistogram(spark, sfDir)
      .agg(sum(col("share"))).head.getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("q67 IVF cells come from the centroid set and cos is bounded") {
    val rows = Similarity.q67IvfAnn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cell") >= 0 && r.getAs[Long]("cell") < 8)
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
  }

  test("q77 clusters: both endpoints of every near-dup pair share a cluster") {
    val pairs = Dedup.q33NgramJaccard(spark, sfDir).select("doc_a", "doc_b").collect()
    val comp = Dedup.q77DedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    pairs.foreach { p =>
      assert(comp(p.getLong(0)) === comp(p.getLong(1)))
    }
    // the label IS the minimum member of its cluster
    comp.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
  }

  test("q75 latest-per-key agrees with a window-dedup formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(desc("event_id"))
    val viaWindow = graft.sources.Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    AdvancedSql.q75LatestPerKey(spark, sfDir).collect().foreach { r =>
      assert(viaWindow(r.getAs[Long]("user_id")) === r.getAs[String]("last_type"))
    }
  }

  test("q68 centroids cover every (label, pos<8) with consistent counts") {
    val out = Similarity.q68LabelCentroids(spark, sfDir)
    val labels = graft.sources.Tables.embeddings(spark, sfDir)
      .select(countDistinct(col("label"))).head.getLong(0)
    assert(out.count() === labels * 8)
  }

  test("q104 merge actions partition base + inserts exactly") {
    val rows = AdvancedSql.q104MergeUpsert(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = graft.sources.Tables.customer(spark, sfDir).count()
    // keep + update = every base row exactly once; inserts are extra rows
    assert(rows.getOrElse("keep", 0L) + rows.getOrElse("update", 0L) === base)
    assert(rows.getOrElse("update", 0L) > 0 && rows.getOrElse("insert", 0L) > 0)
  }

  test("q105 winsorized bounds sit inside the stratum's min/max and order correctly") {
    val stats = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    AdvancedSql.q105WinsorizedStats(spark, sfDir).collect().foreach { r =>
      val (lang, lo, hi) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (mn, mx) = stats(lang)
      assert(lo >= mn && hi <= mx && lo <= hi, s"$lang: [$lo,$hi] vs [$mn,$mx]")
      // clamp counts must be consistent with the bounds being p05/p95-ish
      val n = r.getLong(1)
      assert(r.getLong(4) <= n / 10 && r.getLong(5) <= n / 10, r.toString)
    }
  }
}
