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
}
