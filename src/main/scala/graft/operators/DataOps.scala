package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Data-operations suite: snapshot reconciliation (table diff), referential-
  * integrity auditing, one-pass column profiling, and incremental aggregate
  * maintenance — the jobs that run AROUND analytics queries in a production
  * lake, all expressed as ordinary shuffles/broadcasts so they hold at 100 TB.
  */
object DataOps {

  // ---------------------------------------------------------------- q119

  /** Core: classify every key across two table snapshots as added / removed /
    * changed / unchanged via one full outer join on the key. `cmp` is the
    * column whose change matters. At scale this is one shuffle co-partitioned
    * on the key — the standard data-diff / CDC-reconciliation shape (compare
    * q75's compaction and q104's merge, which CONSUME such diffs).
    */
  def tableDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String, cmp: String): DataFrame = {
    val o = oldSnap.select(col(key).as("k"), col(cmp).as("v_old"))
    val n = newSnap.select(col(key).as("k"), col(cmp).as("v_new"))
    o.join(n, Seq("k"), "full_outer")
      .withColumn("class",
        when(col("v_old").isNull, "added")
          .when(col("v_new").isNull, "removed")
          .when(col("v_old") =!= col("v_new"), "changed")
          .otherwise("unchanged"))
  }

  /** Snapshot reconciliation report: the odd-vs-even-tail halves of orders
    * play two table versions (keys % 10 == 3 dropped, % 10 == 7 yet to
    * arrive, % 5 == 0 repriced +10 — an IEEE add both engines compute
    * bit-identically). Emits per-class row counts and an exact key checksum.
    */
  def q119TableDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val oldSnap = orders.where(col("o_orderkey") % 10 =!= 3)
    val newSnap = orders.where(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    tableDiff(oldSnap, newSnap, "o_orderkey", "o_totalprice")
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
      .orderBy(col("class"))
  }

  val q119Oracle: String =
    """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS v_old FROM orders
      |           WHERE o_orderkey % 10 <> 3),
      |n AS (SELECT o_orderkey AS k,
      |        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
      |             ELSE o_totalprice END AS v_new
      |      FROM orders WHERE o_orderkey % 10 <> 7),
      |d AS (
      |  SELECT coalesce(o.k, n.k) AS k,
      |    CASE WHEN o.k IS NULL THEN 'added'
      |         WHEN n.k IS NULL THEN 'removed'
      |         WHEN v_old <> v_new THEN 'changed'
      |         ELSE 'unchanged' END AS class
      |  FROM o FULL OUTER JOIN n ON o.k = n.k)
      |SELECT class, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
      |FROM d GROUP BY class ORDER BY class""".stripMargin

  // ---------------------------------------------------------------- q120

  /** Referential-integrity audit: orphan counts for every foreign key in the
    * star schema, plus one seeded-corruption check (a stale part snapshot
    * missing every 7th key) proving the audit actually detects violations.
    * Each check is an anti join — broadcast when the parent key set is a
    * dim, shuffle otherwise — and all checks share one output schema, so
    * the audit extends by appending to a list.
    */
  def q120FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    val checks: Seq[(String, DataFrame)] = Seq(
      ("lineitem.l_orderkey->orders",
        li.join(orders.select(col("o_orderkey").as("pk")),
          col("l_orderkey") === col("pk"), "left_anti")),
      ("lineitem.l_partkey->part",
        li.join(broadcast(Tables.part(spark, dir).select(col("p_partkey").as("pk"))),
          col("l_partkey") === col("pk"), "left_anti")),
      ("lineitem.l_partkey->part_stale_snapshot",
        li.join(broadcast(Tables.part(spark, dir)
            .where(col("p_partkey") % 7 =!= 0).select(col("p_partkey").as("pk"))),
          col("l_partkey") === col("pk"), "left_anti")),
      ("lineitem.l_suppkey->supplier",
        li.join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey").as("pk"))),
          col("l_suppkey") === col("pk"), "left_anti")),
      ("orders.o_custkey->customer",
        orders.join(broadcast(Tables.customer(spark, dir).select(col("c_custkey").as("pk"))),
          col("o_custkey") === col("pk"), "left_anti")),
      ("customer.c_nationkey->nation",
        Tables.customer(spark, dir).join(
          broadcast(Tables.nation(spark, dir).select(col("n_nationkey").as("pk"))),
          col("c_nationkey") === col("pk"), "left_anti"))
    )
    checks.map { case (name, orphans) =>
      orphans.agg(count(lit(1)).as("n_orphans")).select(lit(name).as("fk_check"), col("n_orphans"))
    }.reduce(_.unionByName(_)).orderBy(col("fk_check"))
  }

  val q120Oracle: String =
    """SELECT fk_check, n_orphans FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS fk_check, count(*) AS n_orphans
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part', count(*)
      |  FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part_stale_snapshot', count(*)
      |  FROM lineitem WHERE l_partkey NOT IN
      |    (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 0)
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier', count(*)
      |  FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer', count(*)
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'customer.c_nationkey->nation', count(*)
      |  FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
      |ORDER BY fk_check""".stripMargin

  // ---------------------------------------------------------------- q121

  /** One-pass column profiler over orders: per column null count, distinct
    * count, and min/max — numerics surfaced as DOUBLE (exact copies or
    * exact long→double widenings; never computed floats), strings and
    * timestamps as canonical strings.
    *
    * Shape: ONE scan → `stack` to long (column, value) form → count per
    * distinct value → per-column stats over the distinct sets. Everything
    * stays in HashAggregate/codegen; a naive "all metrics in one aggregate"
    * mixes count(distinct) Expand with string min/max buffers and planwalks
    * into chained single-threaded SortAggregates (measured 6× slower).
    * Min/max over a column's distinct set equals min/max over the column;
    * numeric strings round-trip to their exact doubles per engine, so the
    * derived stats are engine-identical even though intermediate formatting
    * is not. At 100 TB: one scan, two shuffles keyed on (column, value)
    * then (column) — the distinct sets partition, nothing collects.
    */
  def q121ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority", "o_orderdate")
    val long = Tables.orders(spark, dir).selectExpr("stack(6," +
      "'o_orderkey', CAST(o_orderkey AS STRING)," +
      "'o_custkey', CAST(o_custkey AS STRING)," +
      "'o_totalprice', CAST(o_totalprice AS STRING)," +
      "'o_orderstatus', o_orderstatus," +
      "'o_orderpriority', o_orderpriority," +
      "'o_orderdate', CAST(o_orderdate AS STRING)" +
      ") AS (column_name, v)")
    val inSet = (cols: Seq[String]) => col("column_name").isin(cols: _*)
    long
      .groupBy(col("column_name"), col("v")).agg(count(lit(1)).as("n"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("n")).as("n_rows"),
        sum(when(col("v").isNull, col("n")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"),
        min(when(inSet(numCols), col("v").cast("double"))).as("min_num"),
        max(when(inSet(numCols), col("v").cast("double"))).as("max_num"),
        min(when(inSet(strCols), col("v"))).as("min_str"),
        max(when(inSet(strCols), col("v"))).as("max_str"))
      .orderBy(col("column_name"))
  }

  val q121Oracle: String =
    """SELECT column_name, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str
      |FROM (
      |  SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |    count(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num,
      |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', count(*),
      |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT o_custkey),
      |    CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE), NULL, NULL
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', count(*),
      |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT o_totalprice),
      |    min(o_totalprice), max(o_totalprice), NULL, NULL
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', count(*),
      |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT o_orderstatus),
      |    NULL, NULL, min(o_orderstatus), max(o_orderstatus)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', count(*),
      |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT o_orderpriority),
      |    NULL, NULL, min(o_orderpriority), max(o_orderpriority)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderdate', count(*),
      |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    count(DISTINCT o_orderdate),
      |    NULL, NULL, CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
      |  FROM orders)
      |ORDER BY column_name""".stripMargin

  // ---------------------------------------------------------------- q122

  /** Incremental aggregate maintenance: a standing per-customer state
    * (count + exact decimal revenue over even order keys) merges with a
    * delta batch (odd keys) via one full outer join and component-wise
    * combination — no recompute over the full history. The query also
    * recomputes from scratch and emits a per-key `matches` bit, proving
    * merged == direct exactly (decimal sums are associative, so the
    * incremental path is bit-identical at any merge granularity).
    *
    * At 100 TB this is THE pattern for daily rollups: state and delta
    * co-partition on the key, merge cost scales with |delta| + |touched
    * state|, and the decimal (not double) accumulator is what makes
    * incremental == batch exact.
    */
  def q122IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def rollup(d: DataFrame): DataFrame = d.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,4)")).as("s"))
    val state = rollup(orders.where(col("o_orderkey") % 2 === 0))
      .select(col("o_custkey"), col("n").as("n0"), col("s").as("s0"))
    val delta = rollup(orders.where(col("o_orderkey") % 2 === 1))
      .select(col("o_custkey"), col("n").as("n1"), col("s").as("s1"))
    val merged = state.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n_merged"),
        (coalesce(col("s0"), lit(0).cast("decimal(18,4)")) +
          coalesce(col("s1"), lit(0).cast("decimal(18,4)"))).as("s_merged"))
    val direct = rollup(orders).select(col("o_custkey"),
      col("n").as("n_direct"), col("s").as("s_direct"))
    merged.join(direct, Seq("o_custkey"))
      .select(col("o_custkey"), col("n_merged"),
        col("s_merged").cast("double").as("revenue"),
        (col("n_merged") === col("n_direct") &&
          col("s_merged") === col("s_direct")).as("matches"))
      .orderBy(col("o_custkey"))
  }

  val q122Oracle: String =
    """WITH state AS (
      |  SELECT o_custkey, count(*) AS n0, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s0
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey),
      |delta AS (
      |  SELECT o_custkey, count(*) AS n1, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s1
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey),
      |merged AS (
      |  SELECT coalesce(state.o_custkey, delta.o_custkey) AS o_custkey,
      |    coalesce(n0, 0) + coalesce(n1, 0) AS n_merged,
      |    coalesce(s0, 0) + coalesce(s1, 0) AS s_merged
      |  FROM state FULL OUTER JOIN delta ON state.o_custkey = delta.o_custkey),
      |direct AS (
      |  SELECT o_custkey, count(*) AS n_direct, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s_direct
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, n_merged, CAST(s_merged AS DOUBLE) AS revenue,
      |  n_merged = n_direct AND s_merged = s_direct AS matches
      |FROM merged JOIN direct USING (o_custkey)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q126

  /** Mergeable distinct-count sketches: per-language HLL sketches of doc_id
    * (Apache DataSketches via `hll_sketch_agg`), re-aggregated into a global
    * count with `hll_union_agg` — WITHOUT rescanning raw data. This is the
    * 100 TB distinct-count architecture: partitions sketch locally, sketches
    * union associatively at any granularity (hour→day→month), and the union
    * is the same few KB regardless of data size. Per-group AND union rows
    * carry a within-5% tolerance bit against the exact count (the q10-style
    * sketch oracle: DuckDB asserts the tolerance contract, not the
    * engine-specific estimate, while rows/schema/count still hash-compare).
    */
  def q126HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perLang = docs.groupBy(col("lang"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"),
        countDistinct(col("doc_id")).as("n_exact"))
    val langRows = perLang
      .select(col("lang"), col("n_exact"),
        hll_sketch_estimate(col("sk")).as("est"))
    val totalRow = perLang
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
        sum(col("n_exact")).as("n_exact")) // langs partition doc_ids: sum == global distinct
      .select(lit("TOTAL").as("lang"), col("n_exact"), col("est"))
    langRows.unionByName(totalRow)
      .select(col("lang"), col("n_exact"),
        (abs(col("est") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
          .as("within_5pct"))
      .orderBy(col("lang"))
  }

  val q126Oracle: String =
    """SELECT lang, n_exact, TRUE AS within_5pct FROM (
      |  SELECT lang, count(DISTINCT doc_id) AS n_exact FROM documents GROUP BY lang
      |  UNION ALL
      |  SELECT 'TOTAL', count(DISTINCT doc_id) FROM documents)
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q127

  /** Equi-depth histogram of document lengths via BROADCAST QUANTILE
    * BOUNDARIES: one aggregation computes the 7 octile cut points
    * (cross-engine-exact interpolated percentiles, the q52 contract), the
    * 1-row boundary array broadcasts, and bucket assignment is a map-only
    * fold — NOT an `ntile` over a global sort, which would funnel 100 TB
    * through one ordering. Ties at boundaries go to the lower bucket in
    * both engines (strict > comparison), so depths are only approximately
    * equal on tied data — which is the honest semantics of equi-depth.
    */
  def q127EquidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bounds = docs.agg(expr(
      "percentile(n_chars, array(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875))").as("bs"))
    docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(
        "aggregate(bs, 0, (acc, b) -> acc + CASE WHEN CAST(n_chars AS DOUBLE) > b THEN 1 ELSE 0 END)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("bucket"))
  }

  val q127Oracle: String =
    """WITH b AS (
      |  SELECT [quantile_cont(n_chars, 0.125), quantile_cont(n_chars, 0.25),
      |          quantile_cont(n_chars, 0.375), quantile_cont(n_chars, 0.5),
      |          quantile_cont(n_chars, 0.625), quantile_cont(n_chars, 0.75),
      |          quantile_cont(n_chars, 0.875)] AS bs
      |  FROM documents),
      |assigned AS (
      |  SELECT n_chars,
      |    list_reduce([0] || [CASE WHEN CAST(n_chars AS DOUBLE) > x THEN 1 ELSE 0 END
      |                        for x in bs], (acc, v) -> acc + v) AS bucket
      |  FROM documents, b)
      |SELECT bucket, count(*) AS n_docs, min(n_chars) AS lo, max(n_chars) AS hi,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM assigned GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q130

  /** Nested analytics: per-customer order history materialized as a SORTED
    * array of structs, then consumed entirely with higher-order functions —
    * the document-model surface (struct construction, deterministic
    * sort_array on struct fields, element access, transform + array_max)
    * that lakehouse users lean on for "latest N events per entity" payloads.
    *
    * Determinism: sort_array orders by (date, orderkey) — a unique total
    * order — and every derived metric copies or integer-differences values.
    *
    * Scale note: collect_list materializes one customer's history in one
    * reducer — bounded fan-in here (orders per customer is small and
    * business-bounded); for unbounded histories the windowed forms (q75,
    * q16) are the right tool, which is exactly the trade this query
    * demonstrates against.
    */
  def q130NestedHistory(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(
        col("o_orderdate").as("d"), col("o_orderkey").as("k"),
        col("o_totalprice").as("p")))).as("h"))
      .select(
        col("o_custkey"),
        size(col("h")).as("n_orders"),
        expr("h[0].d").as("first_order"),
        expr("CASE WHEN size(h) >= 2 THEN datediff(h[1].d, h[0].d) END").as("gap_days"),
        expr("array_max(transform(h, e -> e.p))").as("max_price"))
      .orderBy(col("o_custkey"))

  val q130Oracle: String =
    """SELECT o_custkey, len(h) AS n_orders, h[1].d AS first_order,
      |  CASE WHEN len(h) >= 2
      |       THEN CAST(date_diff('day', h[1].d, h[2].d) AS INT) END AS gap_days,
      |  list_max([e.p for e in h]) AS max_price
      |FROM (
      |  SELECT o_custkey,
      |    list({'d': o_orderdate, 'k': o_orderkey, 'p': o_totalprice}
      |         ORDER BY o_orderdate, o_orderkey) AS h
      |  FROM orders GROUP BY o_custkey)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q131

  /** Per-group top-k via the typed mergeable [[graft.functions.TopKAgg]]
    * aggregator — top-3 orders per customer by (price DESC, orderkey ASC).
    *
    * The window formulation (row_number over partitionBy/orderBy) SORTS
    * every customer's complete order set before discarding all but 3; the
    * aggregator form is map-side combinable, so each partition pre-reduces
    * a group to ≤ k rows before the shuffle — per-group
    * `TakeOrderedAndProject`. The oracle runs the window formulation, so
    * the hash match doubles as an equivalence proof of the two shapes.
    */
  def q131TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = new graft.functions.TopKAgg(3)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("topk"))
      .toDF("o_custkey", "topk")
      .select(col("o_custkey"), posexplode(col("topk")).as(Seq("r0", "s")))
      .select(col("o_custkey"), (col("r0") + 1).cast("int").as("rk"),
        col("s._2").as("o_orderkey"), col("s._1").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q131Oracle: String =
    """SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  // ---------------------------------------------------------------- q133

  /** Weighted median line-item price per return flag, weight = quantity —
    * the discrete weighted-quantile operator (weighted p50): order values
    * within each group, take the first value whose running weight reaches
    * half the group's total. Quantities quantize to integer units
    * (floor(q·100): exact), so the cumulative comparison 2·cum ≥ total is
    * pure integer arithmetic with a deterministic (value, orderkey...)
    * tie order.
    *
    * Scale shape: one shuffle on the group key; the running sum is a ROWS
    * frame streaming per partition; the per-group total joins back from a
    * broadcast-size aggregate. A giant group serializes its window through
    * one task — the standard fix (pre-bucket by value range, aggregate
    * buckets) applies without changing the contract.
    */
  def q133WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        floor(col("l_quantity") * 100.0).cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val ord = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = li.groupBy(col("l_returnflag")).agg(sum(col("w")).as("w_total"))
    // qualifying rows are a suffix of the (price, key) order, and cum is
    // monotone along it — so the first qualifying value is simply the min
    li.withColumn("cum", sum(col("w")).over(ord))
      .join(broadcast(tot), Seq("l_returnflag"))
      .where(col("cum") * 2 >= col("w_total"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median"),
        max(col("w_total")).as("w_total"))
      .orderBy(col("l_returnflag"))
  }

  val q133Oracle: String =
    """WITH li AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(floor(l_quantity * 100.0) AS BIGINT) AS w, l_orderkey, l_linenumber
      |  FROM lineitem),
      |cum AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS w_total
      |  FROM li)
      |SELECT l_returnflag,
      |  min(l_extendedprice) AS weighted_median,
      |  max(w_total) AS w_total
      |FROM cum WHERE cum * 2 >= w_total
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q134

  /** Benford first-significant-digit audit of order totals — the classic
    * fabricated-data screen: digit counts, observed share (single exact
    * division), and observed-vs-expected per-mille deviation. The Benford
    * expectation table ⌊1000·log10(1+1/d)⌉ is baked in as INTEGER literals:
    * Java's Math.log10 and libm's disagree by an ulp at d=3, so computing
    * the expectation at query time is a cross-engine hash hazard. Map-only
    * digit extraction; one 9-key aggregation.
    */
  def q134BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
    val o = Tables.orders(spark, dir).where(col("o_totalprice") >= 1.0)
    val n = o.agg(count(lit(1)).as("n_total"))
    o.select(digit.cast("int").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(n))
      .withColumn("expected_pm", expr(
        "element_at(map(1, 301, 2, 176, 3, 125, 4, 97, 5, 79, 6, 67, 7, 58, 8, 51, 9, 46), d)"))
      .select(col("d"), col("n_orders"),
        (col("n_orders").cast("double") / col("n_total")).as("observed"),
        col("expected_pm"),
        (col("n_orders") * 1000 - col("expected_pm") * col("n_total")).as("deviation_pm_scaled"))
      .orderBy(col("d"))
  }

  val q134Oracle: String =
    """WITH o AS (SELECT o_totalprice FROM orders WHERE o_totalprice >= 1.0),
      |n AS (SELECT count(*) AS n_total FROM o),
      |d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
      |    count(*) AS n_orders
      |  FROM o GROUP BY 1),
      |exp AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS d,
      |               unnest([301,176,125,97,79,67,58,51,46]) AS expected_pm)
      |SELECT d.d, n_orders,
      |  CAST(n_orders AS DOUBLE) / n_total AS observed,
      |  expected_pm,
      |  n_orders * 1000 - expected_pm * n_total AS deviation_pm_scaled
      |FROM d JOIN exp USING (d) CROSS JOIN n ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q147

  /** Blocked edit-distance record linkage over part names: candidate pairs
    * are generated ONLY within a blocking key (the name's noun token), then
    * scored with Levenshtein ≤ 3 — the classic linkage shape where the
    * block bounds the quadratic (at 100 TB the block key keeps per-block
    * candidate sets small and the pairing is an equi-join on the block, not
    * an all-pairs scan; a runaway block would be df-capped like q33's
    * shingle index). Distances are integers from identical codepoint
    * sequences — codegen'd `levenshtein` on the Spark side, byte-identical
    * in both engines for this ASCII corpus.
    */
  def q147EditLinkage(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("noun"), col("p_name").as("name_a"), col("n_parts").as("na"))
    val b = names.select(col("noun"), col("p_name").as("name_b"), col("n_parts").as("nb"))
    a.join(b, Seq("noun"))
      .where(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .where(col("lev") <= 3)
      .select(col("noun"), col("name_a"), col("name_b"), col("lev"),
        col("na"), col("nb"))
      .orderBy(col("noun"), col("name_a"), col("name_b"))
  }

  val q147Oracle: String =
    """WITH names AS (
      |  SELECT p_name, string_split(p_name, ' ')[2] AS noun, count(*) AS n_parts
      |  FROM part GROUP BY 1, 2)
      |SELECT a.noun, a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name) AS lev,
      |  a.n_parts AS na, b.n_parts AS nb
      |FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY a.noun, a.p_name, b.p_name""".stripMargin

  // ---------------------------------------------------------------- q150

  /** Key-skew audit with an exact integer Gini coefficient — the diagnostic
    * that decides whether a join/agg key needs salting (q73) or AQE skew
    * splitting before a 100 TB run. Per-key counts are one distributed
    * aggregation; the Gini then runs on the AGGREGATED key histogram
    * (|keys| ≪ |rows|), where the sorted-rank identity
    *   G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)
    * is evaluated entirely in 64-bit integers (deterministic rank order:
    * count then key) and finished with ONE IEEE division. The global
    * row_number window is single-partition by design — it sees only the
    * per-key histogram, never the fact rows; a key space too large for one
    * partition would bin counts first (q66's histogram shape).
    */
  def q150SkewAudit(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val ranked = counts.withColumn("i",
      row_number().over(Window.orderBy(col("c"), col("l_partkey"))))
    ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("total_rows"),
      max(col("c")).as("max_count"),
      sum(col("i") * col("c")).as("ic"))
      .select(col("n_keys"), col("total_rows"), col("max_count"),
        ((lit(2) * col("ic") - (col("n_keys") + 1) * col("total_rows")).cast("double") /
          (col("n_keys") * col("total_rows")).cast("double")).as("gini"))
  }

  val q150Oracle: String =
    """WITH counts AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
      |ranked AS (SELECT l_partkey, c,
      |             row_number() OVER (ORDER BY c, l_partkey) AS i FROM counts),
      |s AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total_rows,
      |        max(c) AS max_count, CAST(sum(i * c) AS BIGINT) AS ic FROM ranked)
      |SELECT n_keys, total_rows, max_count,
      |  CAST(2 * ic - (n_keys + 1) * total_rows AS DOUBLE) /
      |  CAST(n_keys * total_rows AS DOUBLE) AS gini
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q152

  /** Robust outlier audit via median/MAD — the heavy-tail-safe alternative
    * to the z-score screen (q128), which a single extreme value can blind.
    * Everything is integer: values quantize to cents, both medians are
    * DISCRETE lower medians picked by rank ((n+1) div 2-th smallest, total
    * order via the event-id tiebreak), deviations are integer |x − med|,
    * and the flag is the pure-integer test dev > 3·MAD — no float
    * boundary anywhere. Two ranked passes (value, then deviation), each a
    * per-group window over the group's own rows; medians broadcast back.
    */
  def q152MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(spark, dir).select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"), col("event_id").as("k"))
    val byType = Window.partitionBy(col("event_type"))
    val r1 = b
      .withColumn("rn", row_number().over(byType.orderBy(col("cents"), col("k"))))
      .withColumn("n", count(lit(1)).over(byType))
    val med = r1.where(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("cents").as("med_cents"), col("n"))
    val d = b.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("cents") - col("med_cents")))
    val r2 = d.withColumn("rn", row_number().over(byType.orderBy(col("dev"), col("k"))))
    val mad = r2.where(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("dev").as("mad_cents"))
    d.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("n"), col("med_cents"), col("mad_cents"))
      .agg(sum(when(col("dev") > lit(3) * col("mad_cents"), 1L).otherwise(0L))
        .as("n_outliers"))
      .select(col("event_type"), col("n"), col("med_cents"), col("mad_cents"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }

  val q152Oracle: String =
    """WITH b AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
      |    event_id AS k
      |  FROM events),
      |r1 AS (SELECT event_type, cents,
      |         row_number() OVER (PARTITION BY event_type ORDER BY cents, k) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n FROM b),
      |med AS (SELECT event_type, cents AS med_cents, n FROM r1 WHERE rn = (n + 1) // 2),
      |d AS (SELECT b.event_type, abs(b.cents - med_cents) AS dev, b.k,
      |        med_cents, n FROM b JOIN med USING (event_type)),
      |r2 AS (SELECT event_type, dev, med_cents, n,
      |         row_number() OVER (PARTITION BY event_type ORDER BY dev, k) AS rn FROM d),
      |mad AS (SELECT event_type, dev AS mad_cents FROM r2 WHERE rn = (n + 1) // 2)
      |SELECT d.event_type, n, med_cents, mad_cents,
      |  CAST(sum(CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN mad USING (event_type)
      |GROUP BY d.event_type, n, med_cents, mad_cents
      |ORDER BY d.event_type""".stripMargin

  // ---------------------------------------------------------------- q160

  /** Two-phase distributed exact median — selection WITHOUT a global sort.
    * Phase 1: a 1024-cell integer histogram (cents >> 16) with a running
    * cumulative locates the bucket containing the k-th value (k = (n+1)/2,
    * lower median). Phase 2 ranks ONLY inside that one bucket (~n/1024 of
    * the data) and picks the residual offset. This is how an exact quantile
    * survives 100 TB: the full data is touched twice by map-side
    * aggregations, and the only sort ever performed is over a single
    * bucket's rows — compare q52, whose `percentile` sorts each group's
    * values in the aggregation buffer. All arithmetic is integer; the
    * bucket id and offset are driver scalars derived from the 1024-row
    * cumulative table (the broadcast-scalar control pattern, not a data
    * collect).
    */
  def q160TwoPhaseMedian(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir).select(
      floor(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_orderkey").as("k1"), col("l_linenumber").as("k2"))
    val n = b.count()
    val k = (n + 1) / 2
    val cum = b.groupBy(shiftright(col("cents"), 16).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
      .collect().sortBy(_.getLong(0))
    val bStar = cum.find(_.getAs[Long]("cum") >= k).get.getLong(0)
    val cumBefore = cum.filter(_.getLong(0) < bStar).lastOption
      .map(_.getAs[Long]("cum")).getOrElse(0L)
    val off = k - cumBefore
    val w = Window.orderBy(col("cents"), col("k1"), col("k2"))
    b.where(shiftright(col("cents"), 16) === bStar)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === off)
      .select(lit(n).as("n"), lit(bStar).as("bucket"), lit(off).as("off"),
        col("cents").as("median_cents"))
  }

  val q160Oracle: String =
    """WITH b AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
      |                  l_orderkey AS k1, l_linenumber AS k2 FROM lineitem),
      |n AS (SELECT count(*) AS n, (count(*) + 1) // 2 AS k FROM b),
      |hist AS (SELECT cents >> 16 AS bucket, count(*) AS c FROM b GROUP BY 1),
      |cum AS (SELECT bucket, c, CAST(sum(c) OVER (ORDER BY bucket) AS BIGINT) AS cum
      |        FROM hist),
      |tgt AS (SELECT min(bucket) AS b_star FROM cum, n WHERE cum >= k),
      |off AS (SELECT CAST(k - coalesce((SELECT max(cum) FROM cum
      |          WHERE bucket < (SELECT b_star FROM tgt)), 0) AS BIGINT) AS off FROM n),
      |inb AS (SELECT cents, row_number() OVER (ORDER BY cents, k1, k2) AS rn
      |        FROM b WHERE cents >> 16 = (SELECT b_star FROM tgt))
      |SELECT n.n, (SELECT b_star FROM tgt) AS bucket, off.off,
      |       (SELECT cents FROM inb WHERE rn = off.off) AS median_cents
      |FROM n, off""".stripMargin

  // ---------------------------------------------------------------- q165

  /** Two-proportion A/B z-test: users hash-split into two arms (user_id
    * parity — the deterministic assignment an experimentation platform
    * uses), conversion = ≥ 15 purchase events, and the pooled-proportion
    * z-statistic for the rate difference. Every input to the statistic is
    * an exact integer count; the arithmetic chain (divisions, multiply,
    * 1−p, sqrt, final division) is all IEEE-754 fully-specified operations
    * — sqrt is correctly rounded by the standard — so even the z-score is
    * bit-reproducible across engines. Shape: one per-user aggregation,
    * a 2-row arm rollup, then scalar math.
    */
  def q165AbZTest(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15, 1L)
        .otherwise(0L).as("converted"))
      .withColumn("grp", col("user_id") % 2)
    val arms = u.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    arms.agg(
      max(when(col("grp") === 0, col("n"))).as("n0"),
      max(when(col("grp") === 0, col("conv"))).as("c0"),
      max(when(col("grp") === 1, col("n"))).as("n1"),
      max(when(col("grp") === 1, col("conv"))).as("c1"))
      .withColumn("p0", col("c0").cast("double") / col("n0").cast("double"))
      .withColumn("p1", col("c1").cast("double") / col("n1").cast("double"))
      .withColumn("pp",
        (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")).cast("double"))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        (col("p0") - col("p1")).as("rate_diff"),
        ((col("p0") - col("p1")) /
          sqrt(col("pp") * (lit(1.0) - col("pp")) *
            (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double"))))
          .as("z"))
  }

  val q165Oracle: String =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS grp,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
      |         THEN 1 ELSE 0 END AS converted
      |  FROM events GROUP BY user_id),
      |g AS (SELECT grp, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
      |      FROM u GROUP BY 1),
      |w AS (SELECT max(CASE WHEN grp = 0 THEN n END) AS n0,
      |             max(CASE WHEN grp = 0 THEN conv END) AS c0,
      |             max(CASE WHEN grp = 1 THEN n END) AS n1,
      |             max(CASE WHEN grp = 1 THEN conv END) AS c1 FROM g)
      |SELECT n0, c0, n1, c1,
      |  CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1 AS rate_diff,
      |  (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
      |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
      |         (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
      |         (1.0 / n0 + 1.0 / n1)) AS z
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- q167

  /** 2-D skyline (Pareto frontier): parts not dominated on (price, size) —
    * both minimized. The classic preference-query operator, computed with
    * the sort-scan identity: ordered by (price, key), a point is on the
    * skyline iff its size is strictly below the running minimum of all
    * cheaper points. One window over the part dim (integer cents, integer
    * size — exact); at fact scale the same identity runs per partition
    * after a range-partition on price, then a second pass merges partition
    * frontiers (frontier size ≪ data).
    */
  def q167Skyline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"),
      floor(col("p_retailprice") * 100).cast("long").as("price_cents"), col("p_size"))
    val w = Window.orderBy(col("price_cents"), col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    p.withColumn("prev_min", min(col("p_size")).over(w))
      .where(col("prev_min").isNull || col("p_size") < col("prev_min"))
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
      .orderBy(col("price_cents"), col("p_partkey"))
  }

  val q167Oracle: String =
    """WITH p AS (SELECT p_partkey,
      |             CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
      |             p_size FROM part),
      |r AS (SELECT *, min(p_size) OVER (ORDER BY price_cents, p_partkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
      |      FROM p)
      |SELECT p_partkey, price_cents, p_size FROM r
      |WHERE prev_min IS NULL OR p_size < prev_min
      |ORDER BY price_cents, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q173

  /** Ingest-volume anomaly monitor: per-day row counts tested against the
    * trailing 7-day window with the same exact-integer z² inequality as
    * q113 ((n·v − S)² > 4·(n·Q − S²), i.e. |v − mean| > 2σ, no float
    * variance) — the pipeline-health check that catches a broken upstream
    * feed the day it happens. One aggregation to the daily table, one
    * ordered window over ~30 rows.
    */
  def q173VolumeMonitor(spark: SparkSession, dir: String): DataFrame = {
    val fr = Window.orderBy(col("day")).rowsBetween(-7, -1)
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .withColumn("np", count(lit(1)).over(fr))
      .withColumn("s", sum(col("n")).over(fr))
      .withColumn("q", sum(col("n") * col("n")).over(fr))
      .withColumn("is_scored", col("np") >= 4)
      .withColumn("is_anomaly", col("is_scored") &&
        (col("np") * col("n") - col("s")) * (col("np") * col("n") - col("s")) >
          lit(4L) * (col("np") * col("q") - col("s") * col("s")))
      .select(col("day"), col("n"), col("np"), col("is_scored"), col("is_anomaly"))
      .orderBy(col("day"))
  }

  val q173Oracle: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
      |w AS (SELECT day, n, count(*) OVER fr AS np,
      |        CAST(sum(n) OVER fr AS BIGINT) AS s,
      |        CAST(sum(n * n) OVER fr AS BIGINT) AS q
      |      FROM d WINDOW fr AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, n, np, np >= 4 AS is_scored,
      |  np >= 4 AND (np*n - s)*(np*n - s) > 4*(np*q - s*s) AS is_anomaly
      |FROM w ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q174

  /** Header↔detail reconciliation: every order's lineitem total (integer
    * cents) against its header total, classified with pure-integer 10%
    * band tests (detail·10 < header·9 → under, etc.) plus a no-lines
    * class — the financial-integrity audit run before any revenue number
    * ships. One aggregation of the detail table, one left join on the
    * order key (co-partitioned at scale), one 4-class rollup with exact
    * integer drift sums.
    */
  def q174HeaderDetail(spark: SparkSession, dir: String): DataFrame = {
    val detail = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("detail_cents"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("header_cents"))
      .join(detail, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("cls",
        when(col("detail_cents").isNull, "no_lines")
          .when(col("detail_cents") * 10 < col("header_cents") * 9, "under")
          .when(col("header_cents") * 10 < col("detail_cents") * 9, "over")
          .otherwise("close"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n"),
        sum(col("header_cents")).as("header_total"),
        sum(coalesce(col("detail_cents"), lit(0L))).as("detail_total"))
      .orderBy(col("cls"))
  }

  val q174Oracle: String =
    """WITH li AS (SELECT l_orderkey,
      |              CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |                AS detail_cents
      |            FROM lineitem GROUP BY 1),
      |o AS (SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS header_cents
      |      FROM orders),
      |j AS (SELECT header_cents, detail_cents,
      |        CASE WHEN detail_cents IS NULL THEN 'no_lines'
      |             WHEN detail_cents * 10 < header_cents * 9 THEN 'under'
      |             WHEN header_cents * 10 < detail_cents * 9 THEN 'over'
      |             ELSE 'close' END AS cls
      |      FROM o LEFT JOIN li ON o_orderkey = l_orderkey)
      |SELECT cls, count(*) AS n, CAST(sum(header_cents) AS BIGINT) AS header_total,
      |  CAST(sum(coalesce(detail_cents, 0)) AS BIGINT) AS detail_total
      |FROM j GROUP BY cls ORDER BY cls""".stripMargin

  // ---------------------------------------------------------------- q180

  /** Distribution-drift audit between time slices: the order-key traffic
    * histogram (custkey mod 16 buckets) for the 1995–1997 era vs the rest, each
    * bucket tested with the two-proportion z (q165's statistic — integer
    * counts in, IEEE-exact arithmetic out) and flagged at |z| > 2. The
    * drift monitor a feature store runs between training and serving
    * windows; a PSI would need log(), which is libm-dependent — the
    * per-bucket z test gives the same alarm surface in fully-specified
    * arithmetic. One scan, one 16-key aggregation, scalar totals broadcast.
    */
  def q180DriftAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.orders(spark, dir).select((col("o_custkey") % 16).as("bk"),
      when(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"), 1)
        .otherwise(2).as("wk"))
    val h = w.groupBy(col("bk"))
      .agg(sum(when(col("wk") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("wk") === 2, 1L).otherwise(0L)).as("c2"))
    val t = h.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
    h.crossJoin(broadcast(t))
      .withColumn("p1", col("c1").cast("double") / col("t1").cast("double"))
      .withColumn("p2", col("c2").cast("double") / col("t2").cast("double"))
      .withColumn("pp",
        (col("c1") + col("c2")).cast("double") / (col("t1") + col("t2")).cast("double"))
      .withColumn("z", (col("p1") - col("p2")) /
        sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("t1").cast("double") + lit(1.0) / col("t2").cast("double"))))
      .select(col("bk"), col("c1"), col("c2"), col("z"),
        (abs(col("z")) > 2.0).as("drifted"))
      .orderBy(col("bk"))
  }

  val q180Oracle: String =
    """WITH w AS (SELECT o_custkey % 16 AS bk,
      |             CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |                  THEN 1 ELSE 2 END AS wk
      |           FROM orders),
      |h AS (SELECT bk,
      |        CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |        CAST(sum(CASE WHEN wk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |      FROM w GROUP BY 1),
      |t AS (SELECT CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c2) AS BIGINT) AS t2 FROM h),
      |s AS (SELECT bk, c1, c2,
      |        (CAST(c1 AS DOUBLE)/t1 - CAST(c2 AS DOUBLE)/t2) /
      |        sqrt((CAST(c1+c2 AS DOUBLE)/(t1+t2)) * (1 - CAST(c1+c2 AS DOUBLE)/(t1+t2)) *
      |             (1.0/t1 + 1.0/t2)) AS z
      |      FROM h, t)
      |SELECT bk, c1, c2, z, abs(z) > 2.0 AS drifted
      |FROM s ORDER BY bk""".stripMargin

  // ---------------------------------------------------------------- q188

  /** Basket-size distribution: the lines-per-order histogram — the
    * fan-out profile that sizes every header↔detail join (q174) and
    * per-order state budget. Two aggregations: per-order line counts,
    * then the count-of-counts, both integer-exact with map-side combine.
    */
  def q188BasketHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_lines"))

  val q188Oracle: String =
    """WITH lc AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1)
      |SELECT n_lines, count(*) AS n_orders FROM lc
      |GROUP BY 1 ORDER BY n_lines""".stripMargin

  // ---------------------------------------------------------------- q189

  /** Exact two-sample Kolmogorov–Smirnov statistic between the ASIA and
    * EUROPE order-price distributions. The max CDF gap is computed with an
    * ALL-INTEGER numerator: at every price point, D·n₁·n₂ = |c₁·n₂ − c₂·n₁|
    * over running counts (RANGE-frame window, so ties at a value are
    * counted together on both sides — the correct CDF right-limit), and
    * only the final D = max/(n₁·n₂) is a division. The nonparametric
    * distribution-shift test that needs no binning choice — the rigorous
    * companion to q180's bucketed drift z. The ordered prefix runs on the
    * tagged order rows (orders ≪ lineitems); web-scale input would use the
    * two-phase parallel prefix like q181.
    */
  def q189KsStatistic(spark: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
          .where(col("r_name").isin("ASIA", "EUROPE"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("r_name") === "ASIA", 1).otherwise(2).as("src"))
    val cdf = Window.orderBy(col("v")) // RANGE frame: ties counted together
    val r = tagged
      .withColumn("c1", sum(when(col("src") === 1, 1L).otherwise(0L)).over(cdf))
      .withColumn("c2", sum(when(col("src") === 2, 1L).otherwise(0L)).over(cdf))
    val n = tagged.agg(
      sum(when(col("src") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("src") === 2, 1L).otherwise(0L)).as("n2"))
    r.crossJoin(broadcast(n))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("dn"))
      .select(col("n1"), col("n2"), col("dn"),
        (col("dn").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double"))).as("ks"))
  }

  val q189Oracle: String =
    """WITH tagged AS (
      |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
      |    CASE WHEN r_name = 'ASIA' THEN 1 ELSE 2 END AS src
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name IN ('ASIA', 'EUROPE')),
      |n AS (SELECT CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |             CAST(sum(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |      FROM tagged),
      |r AS (SELECT
      |        CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) OVER (ORDER BY v)
      |             AS BIGINT) AS c1,
      |        CAST(sum(CASE WHEN src = 2 THEN 1 ELSE 0 END) OVER (ORDER BY v)
      |             AS BIGINT) AS c2
      |      FROM tagged)
      |SELECT n1, n2, max(abs(c1*n2 - c2*n1)) AS dn,
      |  CAST(max(abs(c1*n2 - c2*n1)) AS DOUBLE) /
      |    (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks
      |FROM r, n GROUP BY n1, n2""".stripMargin

  // ---------------------------------------------------------------- q190

  /** Spearman rank correlation between price and quantity — the
    * outlier-robust monotonic-association companion to Pearson (q51). Ranks
    * are row_number over a TOTAL order (value, orderkey, linenumber), so
    * the permutation is deterministic (documented variant: ties broken by
    * key rather than averaged — identical in both engines), Σd² is an
    * exact decimal/HUGEINT integer, and ρ = 1 − 6Σd²/(n(n²−1)) is one IEEE
    * expression. Two global rank windows over the fact rows — the ordered
    * prefix caveat of q181/q189 applies at extreme scale.
    */
  def q190Spearman(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir).select(
      floor(col("l_extendedprice") * 100).cast("long").as("p"),
      col("l_quantity").cast("long").as("q"),
      col("l_orderkey").as("k1"), col("l_linenumber").as("k2"))
    val r = b
      .withColumn("rp", row_number().over(Window.orderBy(col("p"), col("k1"), col("k2"))))
      .withColumn("rq", row_number().over(Window.orderBy(col("q"), col("k1"), col("k2"))))
    r.agg(count(lit(1)).as("n"),
        sum(((col("rp").cast("long") - col("rq")) * (col("rp").cast("long") - col("rq")))
          .cast("decimal(38,0)")).as("d2dec"))
      .select(col("n"), col("d2dec").cast("long").as("d2"),
        (lit(1.0) - lit(6.0) * col("d2dec").cast("double") /
          (col("n").cast("double") * (col("n").cast("double") * col("n") - lit(1.0))))
          .as("rho"))
  }

  val q190Oracle: String =
    """WITH b AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS p,
      |             CAST(l_quantity AS BIGINT) AS q,
      |             l_orderkey AS k1, l_linenumber AS k2 FROM lineitem),
      |r AS (SELECT row_number() OVER (ORDER BY p, k1, k2) AS rp,
      |        row_number() OVER (ORDER BY q, k1, k2) AS rq FROM b),
      |s AS (SELECT count(*) AS n,
      |        sum(CAST(rp - rq AS HUGEINT) * (rp - rq)) AS d2h FROM r)
      |SELECT n, CAST(d2h AS BIGINT) AS d2,
      |  1.0 - 6.0 * CAST(d2h AS DOUBLE) /
      |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1.0)) AS rho
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q194

  /** Catalog coverage: per brand, how much of the part assortment has ever
    * been ordered — a left-semi-derived flag per part (the demand join runs
    * once over the distinct ordered-part keys, broadcast into the dim) and
    * per-brand coverage ratios. The assortment-health audit behind "dead
    * SKU" cleanup; integer counts, one IEEE ratio.
    */
  def q194CatalogCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ordered = Tables.lineitem(spark, dir)
      .select(col("l_partkey")).distinct()
    Tables.part(spark, dir)
      .join(ordered.withColumnRenamed("l_partkey", "ok"),
        col("p_partkey") === col("ok"), "left")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("ok").isNotNull, 1L).otherwise(0L)).as("n_ordered"))
      .select(col("p_brand"), col("n_parts"), col("n_ordered"),
        (col("n_parts") - col("n_ordered")).as("n_never"),
        (col("n_ordered").cast("double") / col("n_parts").cast("double"))
          .as("coverage"))
      .orderBy(col("p_brand"))
  }

  val q194Oracle: String =
    """WITH o AS (SELECT DISTINCT l_partkey FROM lineitem)
      |SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_ordered,
      |  CAST(count(*) - sum(CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_never,
      |  CAST(sum(CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE) AS coverage
      |FROM part LEFT JOIN o ON p_partkey = l_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q295

  /** Functional-dependency audit (TANE's g3 error): for each candidate
    * A→B, the minimum number of rows that must be removed for the
    * dependency to HOLD — Σ over A-groups of (group size − the majority
    * B's count). g3 = 0 is an exact FD (a key/denormalization invariant
    * worth enforcing); small-but-nonzero surfaces dirty rows; large means
    * "not a dependency, stop treating it as one". This is the schema-
    * discovery pass a profiler ([[q121ColumnProfile]]) feeds: q121 says
    * what columns look like, this says how columns DETERMINE each other.
    *
    * Scale shape per candidate: one shuffle on (A,B) to count, a partial
    * re-aggregation to per-A (max, sum) — the second groupBy arrives
    * already partitioned by a prefix of its key, so it is exchange-free —
    * then a two-value fold. All counts are int64; the error RATE is one
    * IEEE division at the end. Candidates are checked independently
    * (embarrassingly parallel across FDs).
    */
  def q295FdAudit(spark: SparkSession, dir: String): DataFrame = {
    def g3(df: DataFrame, table: String, a: String, b: String): DataFrame =
      df.groupBy(col(a).as("ka"), col(b).as("kb"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("ka"))
        .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("tot") - col("mx")).as("violations"),
          sum(col("tot")).as("n_rows"))
        .select(lit(table).as("tbl"), lit(a).as("det"), lit(b).as("dep"),
          col("n_groups"), col("violations"),
          (col("violations").cast("double") / col("n_rows").cast("double")).as("g3"))
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    g3(li, "lineitem", "l_orderkey", "l_returnflag")     // holds only per chance
      .unionAll(g3(li, "lineitem", "l_partkey", "l_suppkey"))
      .unionAll(g3(o, "orders", "o_orderkey", "o_custkey")) // key: must be exact
      .unionAll(g3(o, "orders", "o_custkey", "o_orderstatus"))
      .unionAll(g3(o, "orders", "o_custkey", "o_orderpriority"))
      .orderBy(col("tbl"), col("det"), col("dep"))
  }

  val q295Oracle: String = {
    def g3(table: String, a: String, b: String): String =
      s"""SELECT '$table' AS tbl, '$a' AS det, '$b' AS dep,
         |  count(*) AS n_groups,
         |  CAST(sum(tot - mx) AS BIGINT) AS violations,
         |  CAST(sum(tot - mx) AS DOUBLE) / CAST(sum(tot) AS DOUBLE) AS g3
         |FROM (SELECT ka, max(c) AS mx, sum(c) AS tot FROM (
         |        SELECT $a AS ka, $b AS kb, count(*) AS c FROM $table GROUP BY 1, 2)
         |      GROUP BY ka)""".stripMargin
    Seq(
      g3("lineitem", "l_orderkey", "l_returnflag"),
      g3("lineitem", "l_partkey", "l_suppkey"),
      g3("orders", "o_orderkey", "o_custkey"),
      g3("orders", "o_custkey", "o_orderstatus"),
      g3("orders", "o_custkey", "o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, det, dep")
  }

  // ---------------------------------------------------------------- q299

  /** CUPED variance reduction (Deng et al., WSDM'13) — the experimentation
    * upgrade over the plain A/B read (q165): each user's PRE-period
    * activity is the covariate, θ = cov(pre, post)/var(pre) is fit POOLED
    * (arm-agnostic — the unbiasedness requirement), and each arm reports
    * its adjusted mean  post̄_a − θ·(prē_a − prē) . Determinism: per-user
    * pre/post sums are exact decimals; the moment sums (Σx, Σy, Σx²,
    * Σxy) re-enter decimal after each double product (the Det rule —
    * double→decimal rounding is identical in both engines, decimal
    * addition is order-free), and θ and the adjusted means are the SAME
    * parenthesized IEEE expression on both sides.
    *
    * Scale shape: one shuffle to per-user sums, then two tiny aggregates
    * (global moments, per-arm means) and a broadcast of the 1-row θ —
    * the covariate fit never rescans raw events.
    */
  def q299CupedAdjust(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(dayofmonth(col("ts")) < 16, col("value")).otherwise(lit(0.0))
          .cast("decimal(18,4)")).cast("double").as("pre"),
        sum(when(dayofmonth(col("ts")) >= 16, col("value")).otherwise(lit(0.0))
          .cast("decimal(18,4)")).cast("double").as("post"))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    val g = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("pre").cast("decimal(28,6)")).cast("double").as("sx"),
      sum(col("post").cast("decimal(28,6)")).cast("double").as("sy"),
      sum((col("pre") * col("pre")).cast("decimal(28,6)")).cast("double").as("sxx"),
      sum((col("pre") * col("post")).cast("decimal(28,6)")).cast("double").as("sxy"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("pre").cast("decimal(28,6)")).cast("double").as("asx"),
        sum(col("post").cast("decimal(28,6)")).cast("double").as("asy"))
    arms.crossJoin(broadcast(g))
      .withColumn("theta",
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) /
          (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))))
      .withColumn("mean_post", col("asy") / col("n_users"))
      .withColumn("adj_mean",
        col("asy") / col("n_users") -
          col("theta") * (col("asx") / col("n_users") - col("sx") / col("n")))
      .select(col("arm"), col("n_users"), col("mean_post"), col("theta"), col("adj_mean"))
      .orderBy(col("arm"))
  }

  val q299Oracle: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
      |    CAST(sum(CAST(CASE WHEN day(CAST(ts AS TIMESTAMP)) < 16 THEN value ELSE 0.0 END
      |             AS DECIMAL(18,4))) AS DOUBLE) AS pre,
      |    CAST(sum(CAST(CASE WHEN day(CAST(ts AS TIMESTAMP)) >= 16 THEN value ELSE 0.0 END
      |             AS DECIMAL(18,4))) AS DOUBLE) AS post
      |  FROM events GROUP BY user_id),
      |g AS (SELECT count(*) AS n,
      |        CAST(sum(CAST(pre AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |        CAST(sum(CAST(post AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |        CAST(sum(CAST(pre * pre AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |        CAST(sum(CAST(pre * post AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |      FROM pu),
      |arms AS (SELECT arm, count(*) AS n_users,
      |           CAST(sum(CAST(pre AS DECIMAL(28,6))) AS DOUBLE) AS asx,
      |           CAST(sum(CAST(post AS DECIMAL(28,6))) AS DOUBLE) AS asy
      |         FROM pu GROUP BY arm)
      |SELECT arm, n_users, asy / n_users AS mean_post,
      |  (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n)) AS theta,
      |  asy / n_users -
      |    ((sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n)))
      |      * (asx / n_users - sx / n) AS adj_mean
      |FROM arms, g ORDER BY arm""".stripMargin

  // ---------------------------------------------------------------- q300

  /** Sum-preserving percentage allocation (largest-remainder / Hamilton
    * method) — the reporting primitive behind every "shares must total
    * 100%" table: naive per-row rounding drifts the total by ±(rows/2);
    * here each group gets floor(share·10000 bp), and the leftover basis
    * points go one each to the largest fractional remainders
    * (deterministic tie-break on the group key). All-integer: shares live
    * in basis points, remainders are exact integer numerators
    * (n·10000 − floor·N ≡ n·10000 mod N), and the output provably sums
    * to 10000 per partition — asserted by construction, hash-proven by
    * the oracle.
    */
  def q300LargestRemainder(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("prio"))
    val wRank = Window.partitionBy(col("prio"))
      .orderBy(col("rem").desc, col("status"))
    counts
      .withColumn("tot", sum(col("n")).over(w))
      .withColumn("floor_bp", (col("n") * 10000L).divide(col("tot")).cast("long"))
      .withColumn("rem", col("n") * 10000L - col("floor_bp") * col("tot"))
      .withColumn("short", lit(10000L) - sum(col("floor_bp")).over(w))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("bp", col("floor_bp") + when(col("rk") <= col("short"), 1L).otherwise(0L))
      .select(col("prio"), col("status"), col("n"), col("bp"))
      .orderBy(col("prio"), col("status"))
  }

  val q300Oracle: String =
    """SELECT prio, status, n, floor_bp + CASE WHEN rk <= short THEN 1 ELSE 0 END AS bp
      |FROM (
      |  SELECT prio, status, n, floor_bp,
      |    10000 - sum(floor_bp) OVER (PARTITION BY prio) AS short,
      |    row_number() OVER (PARTITION BY prio
      |                       ORDER BY n * 10000 - floor_bp * tot DESC, status) AS rk
      |  FROM (
      |    SELECT prio, status, n, tot, CAST((n * 10000) // tot AS BIGINT) AS floor_bp
      |    FROM (
      |      SELECT o_orderpriority AS prio, o_orderstatus AS status, count(*) AS n,
      |        sum(count(*)) OVER (PARTITION BY o_orderpriority) AS tot
      |      FROM orders GROUP BY 1, 2)))
      |ORDER BY prio, status""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q299_cuped_adjust", q299CupedAdjust, q299Oracle),
    GraftQuery.sql("q300_largest_remainder", q300LargestRemainder, q300Oracle),
    GraftQuery.sql("q295_fd_audit", q295FdAudit, q295Oracle),
    GraftQuery.sql("q119_table_diff", q119TableDiff, q119Oracle),
    GraftQuery.sql("q120_fk_audit", q120FkAudit, q120Oracle),
    GraftQuery.sql("q121_column_profile", q121ColumnProfile, q121Oracle),
    GraftQuery.sql("q122_incremental_agg", q122IncrementalAgg, q122Oracle),
    GraftQuery.sql("q126_hll_merge", q126HllMerge, q126Oracle),
    GraftQuery.sql("q127_equidepth_histogram", q127EquidepthHistogram, q127Oracle),
    GraftQuery.sql("q130_nested_history", q130NestedHistory, q130Oracle),
    GraftQuery.sql("q131_topk_per_group", q131TopkPerGroup, q131Oracle),
    GraftQuery.sql("q133_weighted_median", q133WeightedMedian, q133Oracle),
    GraftQuery.sql("q134_benford_audit", q134BenfordAudit, q134Oracle),
    GraftQuery.sql("q147_edit_linkage", q147EditLinkage, q147Oracle),
    GraftQuery.sql("q150_skew_audit", q150SkewAudit, q150Oracle),
    GraftQuery.sql("q152_mad_outliers", q152MadOutliers, q152Oracle),
    GraftQuery.sql("q160_two_phase_median", q160TwoPhaseMedian, q160Oracle),
    GraftQuery.sql("q165_ab_z_test", q165AbZTest, q165Oracle),
    GraftQuery.sql("q167_skyline", q167Skyline, q167Oracle),
    GraftQuery.sql("q173_volume_monitor", q173VolumeMonitor, q173Oracle),
    GraftQuery.sql("q174_header_detail", q174HeaderDetail, q174Oracle),
    GraftQuery.sql("q180_drift_audit", q180DriftAudit, q180Oracle),
    GraftQuery.sql("q188_basket_histogram", q188BasketHistogram, q188Oracle),
    GraftQuery.sql("q189_ks_statistic", q189KsStatistic, q189Oracle),
    GraftQuery.sql("q190_spearman", q190Spearman, q190Oracle),
    GraftQuery.sql("q194_catalog_coverage", q194CatalogCoverage, q194Oracle),
    GraftQuery.sql("q205_distance_extras", q205DistanceExtras, q205Oracle),
    GraftQuery.sql("q243_zorder_layout", q243ZorderLayout, q243Oracle)
  )

  // ---------------------------------------------------------------- q243

  /** Morton/z-order bit-interleave of two `bits`-wide non-negative integer
    * expressions, as a SQL expression string. `shiftFn(c, i, j)` renders one
    * "(bit i of c) << j" term in the target dialect, so Spark (shiftleft/
    * shiftright functions) and DuckDB (<< / >> operators) build the SAME
    * integer — pure bit arithmetic, bit-identical across engines.
    */
  private def zInterleave(p: String, s: String, bits: Int,
      term: (String, Int, Int) => String): String =
    (0 until bits).map(i => term(p, i, 2 * i + 1) + " + " + term(s, i, 2 * i))
      .mkString("(", " + ", ")")

  /** Spark-dialect z-interleave of two column expressions (low `bits` bits).
    * Public so layout tests build the identical curve the query reports on.
    */
  def zInterleaveSpark(p: String, s: String, bits: Int): String =
    zInterleave(p, s, bits,
      (c, i, j) => s"shiftleft((shiftright($c, $i) & 1), $j)")

  private def zInterleaveDuck(p: String, s: String, bits: Int): String =
    zInterleave(p, s, bits, (c, i, j) => s"((($c >> $i) & 1) << $j)")

  /** Z-ORDER (Morton-curve) layout audit over lineitem's (partkey, suppkey)
    * plane: interleave the top 10 bits of partkey (>> 5 aligns its 15-bit
    * range) with suppkey's 10 bits into a 20-bit z-value, tile the curve by
    * its top bits (z >> 6), and report each tile's row count and 2-D bounding box.
    * The bounded per-tile (max−min) spans on BOTH dimensions are the whole
    * point of z-clustering a 100 TB table: rows contiguous on the curve are
    * contiguous in the plane, so file/row-group min-max stats prune
    * 2-D predicates that a linear sort can only prune on its leading column
    * (FsParitySpec proves the skip with scan metrics on both layouts).
    * All bit arithmetic — both engines agree exactly.
    */
  def q243ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val z = zInterleaveSpark("shiftright(l_partkey, 5)", "l_suppkey", 10)
    Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_suppkey", s"$z AS z")
      .selectExpr("shiftright(z, 6) AS tile", "l_partkey", "l_suppkey")
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_p"), max(col("l_partkey")).as("max_p"),
        min(col("l_suppkey")).as("min_s"), max(col("l_suppkey")).as("max_s"))
      .withColumn("span_p", col("max_p") - col("min_p"))
      .withColumn("span_s", col("max_s") - col("min_s"))
      .orderBy(col("tile"))
  }

  val q243Oracle: String = {
    val z = zInterleaveDuck("(l_partkey >> 5)", "l_suppkey", 10)
    s"""WITH zv AS (
       |  SELECT l_partkey, l_suppkey, $z AS z FROM lineitem),
       |t AS (SELECT z >> 6 AS tile, l_partkey, l_suppkey FROM zv)
       |SELECT tile, count(*) AS n,
       |  min(l_partkey) AS min_p, max(l_partkey) AS max_p,
       |  min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
       |  max(l_partkey) - min(l_partkey) AS span_p,
       |  max(l_suppkey) - min(l_suppkey) AS span_s
       |FROM t GROUP BY tile ORDER BY tile""".stripMargin
  }

  // ---------------------------------------------------------------- q205

  /** The transposition-and-set rungs of the linkage ladder (q147 covers plain
    * Levenshtein): consecutive-key customer name pairs scored with the three
    * custom codegen kernels — true Damerau-Levenshtein, distinct-character
    * Jaccard, and positional Hamming (graft.functions.StringDistances,
    * semantics probe-matched to DuckDB's builtins). The pairing is an
    * equi-join on the shifted key — the blocked-linkage shape, never
    * all-pairs — and every score is integers or one small-int IEEE division,
    * so the oracle compare is exact.
    */
  def q205DistanceExtras(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val a = c.select(col("c_custkey").as("k"), col("c_name").as("name_a"))
    val b = c.select((col("c_custkey") - 1).as("k"), col("c_name").as("name_b"))
    a.join(b, Seq("k"))
      .select(col("k").as("c_custkey"),
        expr("damerau_levenshtein(name_a, name_b)").as("dl"),
        expr("char_jaccard(name_a, name_b)").as("jac"),
        expr("hamming(name_a, name_b)").as("ham"))
      .orderBy(col("c_custkey"))
  }

  val q205Oracle: String =
    """SELECT a.c_custkey,
      |  damerau_levenshtein(a.c_name, b.c_name) AS dl,
      |  jaccard(a.c_name, b.c_name) AS jac,
      |  hamming(a.c_name, b.c_name) AS ham
      |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
      |ORDER BY a.c_custkey""".stripMargin
}
