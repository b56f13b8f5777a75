package graft

import graft.operators._
import org.apache.spark.sql.functions.col

/** Physical-plan shape assertions — the 100 TB design contract: filters reach
  * the parquet scan, projections prune columns, dim joins broadcast, top-k
  * avoids a global sort.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 pushes predicates into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(l_returnflag"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity") || p.contains("l_quantity"), p)
  }

  test("q02 prunes columns at the scan (no l_tax/l_comment read)") {
    val p = plan("q02_filter_pushdown")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax"), readSchema)
  }

  test("q03 broadcasts every dim side") {
    val p = plan("q03_broadcast_join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q14 plans TakeOrderedAndProject (no global sort for top-k)") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01 uses partial+final hash aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p) // map-side combine before the shuffle
  }

  test("q34 LSH candidate generation is an equi join, not a cartesian product") {
    val p = plan("q34_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q40 broadcasts the query side") {
    val p = plan("q40_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q59 tpch-q3: customer broadcasts, top-k avoids global sort") {
    val p = plan("q59_tpch_q3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q60 tpch-q5: all four dims broadcast, no cartesian product") {
    val p = plan("q60_tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q53 correlated subquery decorrelates to a join (no per-row subquery)") {
    val p = plan("q53_scalar_subquery")
    assert(!p.contains("Subquery"), p) // rewritten into join + aggregate
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q61 hash-sample filter evaluates inside the scan stage (no shuffle before it)") {
    val p = plan("q61_hash_sample")
    assert(p.contains("Filter"), p)
    // one exchange for the global agg is fine; the sample filter must not add one
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q69 bucketed join reads pre-bucketed files with no join-side exchange") {
    val p = plan("q69_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    assert("Bucketed: true".r.findAllIn(p).size >= 2, p)
    // the only exchanges are for the final agg/sort, never under the join
    val joinSection = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"), joinSection)
  }

  test("q34 signature path has no explode-shuffle (map-only minhash_sig)") {
    val p = plan("q34_minhash_lsh")
    assert(p.contains("minhash_sig") || p.contains("minhashsig"), p)
    assert(!p.toLowerCase.contains("partial_min("), p)
  }

  test("q26 as-of join is join-free: one window pass, linear in events") {
    val p = plan("q26_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("ShuffledHashJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q81 pushes the two-nation filter into both nation dim scans") {
    val p = plan("q81_tpch_q7")
    assert("In\\(n_name".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("centroid scale path uses partial aggregation, never collect_list") {
    val p = operators.Similarity.labelCentroidsScale(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(!p.contains("collect_list"), p)
  }

  test("q85 market share: dims broadcast around the one fact-fact shuffle") {
    val p = plan("q85_tpch_q8")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q88 large orders: top-k plans TakeOrderedAndProject") {
    val p = plan("q88_tpch_q18")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q89 OR'd predicate: derived single-table filters reach both scans") {
    val p = plan("q89_tpch_q19")
    assert(p.contains("Or(And(EqualTo(p_brand") || p.contains("EqualTo(p_brand"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity") || p.contains("l_quantity"), p)
  }

  test("q91 EXISTS plans as a LeftSemi join (never a full join + distinct)") {
    val p = plan("q91_tpch_q4")
    assert(p.contains("LeftSemi"), p)
  }

  test("q106 broadcasts both the brand part keys and the threshold table") {
    val p = plan("q106_tpch_q17")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q107 global max is a broadcast scalar, not a driver collect") {
    val p = plan("q107_tpch_q15")
    // Catalyst rewrites the 1-row scalar cross join + equality filter into a
    // broadcast hash join on the (normalized) double key; either broadcast
    // form is the no-driver-collect contract.
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q129 tpch-q9: part/supplier/nation broadcast, one fact-fact shuffle join") {
    val p = plan("q129_tpch_q9")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q131 top-k aggregator plans partial (map-side) object aggregation") {
    val p = plan("q131_topk_per_group")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_topkagg") || "partial".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("Window"), p) // the point: no per-group sort pipeline
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter: a selective filter on one join side
    // builds a bloom filter that the other side's scan probes BEFORE the
    // shuffle — at 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the ~matching fraction. Thresholds are
    // sized for clusters, so pin them down to demonstrate on test data.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.lineitem(spark, sfDir)
      val o = graft.sources.Tables.orders(spark, sfDir)
        .where(col("o_totalprice") > 400000) // selective creation side
      val p = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q139 tpch-q2: dims broadcast; min-cost via ONE window, no re-join of an aggregate") {
    val p = plan("q139_tpch_q2")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q140 tpch-q11: global total reuses the group-sum exchange (single fact scan at runtime)") {
    val df = SparkEntry.queries("q140_tpch_q11")(spark, sfDir)
    df.collect() // execute THIS plan so AQE finalizes it; reuse is a runtime decision
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedSubquery") ||
      "FileScan parquet \\[l_partkey".r.findAllIn(p).size <= 1, p)
  }

  test("q141 tpch-q16: supplier exclusion is a broadcast anti join") {
    val p = plan("q141_tpch_q16")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q142 tpch-q20: supplier probe is a semi join, part prefix broadcasts") {
    val p = plan("q142_tpch_q20")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q144 trailing distinct: contribution-explode (Generate) + broadcast semi day filter, no range join") {
    val p = plan("q144_trailing_distinct")
    assert(p.contains("Generate explode"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q145 attribution: one equi join on user, credits split via window (no per-purchase subquery)") {
    val p = plan("q145_linear_attribution")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q146 chi2: lang marginals broadcast; token marginals shuffle on the token key") {
    val p = plan("q146_chi2_terms")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q147 linkage: candidate pairs form an equi join on the block key, never all-pairs") {
    val p = plan("q147_edit_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.toLowerCase.contains("levenshtein"), p)
  }

  test("q148 share-of-parent: heavy shuffle keys on (day,type); window runs on aggregated rows only") {
    val p = plan("q148_share_of_day")
    assert(p.contains("Window"), p)
    assert(p.contains("partial_sum"), p) // map-side combine before the one heavy exchange
  }

  test("dynamic partition pruning reaches a year-partitioned scan") {
    // The 100 TB fact-table contract: joining a partitioned fact against a
    // filtered dim must prune partitions at RUNTIME via the broadcast result
    // (dynamicpruningexpression in PartitionFilters), not scan all years.
    import org.apache.spark.sql.functions.{col, year}
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(s"$dir/orders_part")
    val fact = spark.read.parquet(s"$dir/orders_part")
    val dim = spark.range(1990, 2010).select(col("id").as("y"))
      .where(col("y") >= 1996 && col("y") <= 1997)
    val joined = fact.join(dim, fact("o_year") === dim("y"))
      .groupBy(col("o_year")).count()
    // match the truncation-safe prefix: long exprIds can elide the
    // PartitionFilters list mid-word ("dynamicpruningexpressio...")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p)
    assert(joined.collect().map(_.getInt(0)).toSet === Set(1996, 1997))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The second runtime-pruning contract next to DPP: when a selective dim
    // filter feeds a shuffle join, the optimizer injects a bloom filter of
    // the dim's join keys into the fact scan (might_contain semi-reduction),
    // so non-matching fact rows die before the exchange. Thresholds are
    // tuned down because the local corpus is far below the 10 GiB
    // application-side default that a real 100 TB fact table would clear.
    import graft.sources.Tables
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1") // force the shuffle join the filter exists for
      val o = Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val q = Tables.lineitem(spark, sfDir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloom"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // The runtime complement of q230's explicit salting: AQE measures the
    // ACTUAL map-output sizes after the shuffle and splits any partition
    // over factor×median into sub-reads, so one hot key no longer pins the
    // join on a single task. Thresholds are sized for clusters, so pin
    // them down to fire on test-scale bytes; at 100 TB this is the
    // default defense against the skewed-key join stall.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{expr, lit, when}
      // 90% of fact rows share key 0 → one reduce partition gets ~18 MB
      // while the others stay ~1 MB
      // pay must be row-dependent (repeat of a per-row digit) or constant
      // folding + column pruning would strip it before the shuffle
      val fact = spark.range(0, 100000).toDF("i")
        .withColumn("k", when(col("i") % 10 < 9, 0L).otherwise(col("i") % 97))
        .withColumn("pay", expr("repeat(cast(i % 10 as string), 200)"))
      val dim = spark.range(0, 97).toDF("k").withColumn("d", col("k") * 2)
      // aggregate over pay so column pruning can't drop the heavy column
      // before the shuffle — the skew must exist in actual shuffled bytes
      val j = fact.join(dim, "k").groupBy(lit(1).as("one"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(col("pay"))).as("bytes"))
      val r = j.collect()(0)
      assert(r.getLong(1) === 100000L && r.getLong(2) === 100000L * 200L)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE skew split did not fire:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q143/q161 graph iterations never broadcast the rank/frontier table") {
    // The O(nodes) rank and frontier tables converge toward the whole node
    // set — at web scale they exceed any broadcast limit, so the iteration
    // joins must be shuffle joins (co-partitioned on the node key), with no
    // BroadcastExchange anywhere in either plan.
    for (name <- Seq("q143_fixed_point_pagerank", "q161_bfs_hops",
        "q270_label_propagation")) {
      val p = plan(name)
      assert(!p.contains("BroadcastExchange"), s"$name broadcasts:\n$p")
      assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    }
  }

  test("iterative graph ops leave ZERO persisted round state (reliable checkpoint, not cache)") {
    // Round state in the iterative graph family is RELIABLY checkpointed
    // (lineage cut per round, durable files, zero recompute under
    // eviction — the r8 `weak` fix), never left in the block-manager
    // cache: an N-round iteration that persists per-round O(nodes)/O(edges)
    // frames either accretes N copies (cache churn) or, worse, keeps full
    // lineage whose eviction silently re-runs the whole chain. After each
    // query completes, NO persisted RDDs may remain (build-phase caches
    // must be unpersisted once folded into the checkpointed working set).
    for (name <- Seq("q143_fixed_point_pagerank", "q270_label_propagation",
        "q276_kcore_peel", "q161_bfs_hops")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(name)(spark, sfDir).collect()
      val added = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(added.isEmpty,
        s"$name left ${added.size} persisted RDDs: round state must live in " +
          "reliable checkpoints, and build caches must be released")
    }
  }

  test("q178 a-priori prunes baskets to frequent brands before the pair join") {
    // Downward closure: pair support >= 20 requires both singleton supports
    // >= 20, so the basket rows semi-join the frequent-brand set BEFORE the
    // quadratic self-join. The plan shows the singleton-count filter (c >= 20)
    // feeding broadcast joins below the pair aggregation.
    val p = plan("q178_association_lift")
    assert(p.contains(">= 20)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q242 BM25: term-stat broadcasts are hinted, doc-length join is left to the planner") {
    // df (per query term) and the 1-row corpus stats carry explicit
    // broadcast() hints — safe at any scale. The O(docs) length table
    // deliberately has NO hint: Catalyst broadcasts it at this test scale
    // (correct for small corpora) and shifts to a shuffle join when stats
    // grow — the adaptive behavior a hard-coded hint would destroy. Assert
    // the hinted broadcasts and the absence of any cartesian fallback.
    val p = plan("q242_bm25_retrieval")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q245 sparse cosine: df guard filters BOTH pair-join sides; norms stay unguarded") {
    // The (lang, source, tok) pair join must sit behind `df <= cap` on each
    // side — the structural guarantee that a stopword-frequency token can
    // never detonate within-block candidates to all-pairs. The norm
    // aggregation reads the unfiltered weight table (exact norms), so
    // exactly two guard filters appear.
    val p = plan("q245_sparse_cosine")
    val guards = s"<= ${TextAnalysis.DfCap245}".r.findAllIn(p).size
    assert(guards >= 2, s"expected df-cap filters on both join sides:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q246 probe reads only the persisted catalog table, never the source embeddings") {
    // The point of a PERSISTENT index: probes must not re-derive assignments
    // from the embeddings source. Every scan in the probe plan is a parquet
    // read of the staging-catalog table.
    val p = plan("q246_ivf_catalog_index")
    assert(!p.contains("embeddings.parquet"),
      s"probe re-reads the source embeddings table:\n$p")
    assert(p.toLowerCase.contains("parquet"), p)
  }

  test("q278 nprobe=2 probe reads only the persisted catalog table") {
    // Same serving contract as q246, with the recall dial at 2: queries,
    // quantizer, and candidates all resolve from the catalog index table —
    // never the source embeddings.
    val p = plan("q278_ivf_catalog_nprobe2")
    assert(!p.contains("embeddings.parquet"),
      s"nprobe=2 probe re-reads the source embeddings table:\n$p")
    assert(p.toLowerCase.contains("parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q303 IVF-PQ serving reads only persisted catalog tables (no raw scan, no code rebuild)") {
    // The FAISS-parity contract: cells, codes, and codebook all resolve
    // from catalog tables; the raw embeddings files appear nowhere in the
    // plan, and the only pqSubDists computation is the per-query distance
    // table (20 queries × codebook — bounded), never the corpus-wide code
    // build (which would show as a window argmin over the full index).
    val p = plan("q303_ivfpq_serve")
    assert(!p.contains("embeddings.parquet"),
      s"IVF-PQ serving re-reads the source embeddings:\n$p")
    assert(p.toLowerCase.contains("parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q247 blocks the pair scan on the IVF cell (equi-join, centroids broadcast)") {
    // Cell assignment: the 8-centroid quantizer is explicitly broadcast
    // (BroadcastNestedLoopJoin from the deliberate crossJoin). The pair
    // comparison itself keys on `cell` — an equi-join, never all-pairs.
    val p = plan("q247_ivf_blocked_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroids not broadcast:\n$p")
    assert("\\[cell#\\d+".r.findFirstIn(p).isDefined, s"no cell equi-join key:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q252 RRF legs end in TakeOrdered; the dense query vector broadcasts") {
    // Both retrieval legs must cut to top-K with TakeOrderedAndProject
    // (per-partition heads + driver merge) — a global Sort before the rank
    // window would be the non-scalable shape. The single query embedding
    // rides a broadcast (BroadcastNestedLoopJoin from the deliberate
    // 1-row crossJoin).
    val p = plan("q252_rrf_hybrid")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"legs must TakeOrdered, not global-sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"query vector not broadcast:\n$p")
  }

  test("q266 banded theta join is a pure equi-join (no nested-loop band scan)") {
    val p = plan("q266_binned_band_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join degenerated to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no hash/merge equi-join found:\n$p")
  }

  test("NO query in the entire inventory plans a CartesianProduct") {
    // The blanket 100 TB safety net: a cartesian product anywhere is a bug.
    // (Deliberate small-side broadcasts plan as BroadcastNestedLoopJoin.)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
