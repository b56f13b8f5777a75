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

  test("q278 nprobe=2 on the persisted index dominates the nprobe=1 probe per query") {
    // nprobe=2's candidate set per query is a SUPERSET of nprobe=1's (its
    // own cell plus the runner-up), so its top-3 similarity can only
    // improve: for every query the k-th best cosine at nprobe=2 is >= the
    // k-th best at nprobe=1.
    def topByQuery(name: String) =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.toSeq).toMap
    val n1 = topByQuery("q246_ivf_catalog_index")
    val n2 = topByQuery("q278_ivf_catalog_nprobe2")
    assert(n1.keySet.subsetOf(n2.keySet), "nprobe=2 lost a query")
    n1.foreach { case (q, cos1) =>
      val cos2 = n2(q)
      cos1.zip(cos2).foreach { case (c1, c2) =>
        assert(c2 >= c1 - 1e-12, s"query $q: nprobe=2 rank worse ($c2 < $c1)")
      }
    }
  }

  test("graft_bins TVF covers [lo, hi) exactly; uneven last bin clamps to hi") {
    val even = spark.sql("SELECT * FROM graft_bins(0, 100, 25)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(even.toSeq === Seq((0L, 0L, 25L), (1L, 25L, 50L), (2L, 50L, 75L), (3L, 75L, 100L)))
    // (hi - lo) % width != 0: the final bin must END at hi, not overrun —
    // a range-join consumer would otherwise absorb [hi, overrun) silently
    val uneven = spark.sql("SELECT * FROM graft_bins(0, 95, 30)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(uneven.toSeq === Seq((0L, 0L, 30L), (1L, 30L, 60L), (2L, 60L, 90L), (3L, 90L, 95L)))
    assert(uneven.last._3 === 95L, "last bin must clamp to hi")
  }
}
