package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Relational core operators (SURVEY.md §2b, Phase 0/1).
  *
  * Every query is a declarative DataFrame plan — Catalyst handles predicate
  * pushdown, column pruning, partial aggregation, and join-strategy selection;
  * nothing here hand-schedules. At 100 TB the scans shard on
  * `maxPartitionBytes` splits (the role of the reference's 32 MiB virtual
  * block size, `CephRgwFileSystem.java:112`), aggregations combine map-side,
  * and dim-table joins broadcast.
  */
object RelationalCore {

  /** Flagship: TPC-H-Q1-style pricing summary — scan → pushed filter →
    * partial+final hash agg → sort. The full read lifecycle of SURVEY.md §3.2.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.dsumSql("l_quantity")} AS sum_qty,
       |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Det.davgSql("l_quantity")} AS avg_qty,
       |  ${Det.davgSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate sweep: IN, BETWEEN, timestamp compare, null-safe
    * equality. All predicates push to the parquet scan (PushedFilters).
    */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_returnflag").isin("A", "R") &&
        col("l_quantity").between(10, 20) &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        (col("l_linenumber") <=> lit(1)))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  val q02Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_linenumber IS NOT DISTINCT FROM 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join: orders ⋈ customer ⋈ nation ⋈ region with explicit broadcast of
    * every dim side — at 100 TB only the fact table shuffles (it doesn't even
    * shuffle for the join; only for the final aggregation).
    */
  def q03BroadcastJoinStar(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("order_cnt"),
        countDistinct(col("c_custkey")).as("cust_cnt"),
        Det.dsum(col("o_totalprice")).as("sum_total"))
      .orderBy(col("r_name"), col("n_name"))

  val q03Oracle: String =
    s"""SELECT r_name, n_name, count(*) AS order_cnt,
       |  count(DISTINCT c_custkey) AS cust_cnt,
       |  ${Det.dsumSql("o_totalprice")} AS sum_total
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Fact⋈fact shuffle join (sort-merge / shuffle-hash at scale — AQE picks),
    * then aggregate. The join key partitioning is reused by the aggregation
    * only when keys align; here they don't, so two shuffles — the honest plan.
    */
  def q04ShuffleJoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("line_cnt"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("o_orderpriority"), col("l_linestatus"))

  val q04Oracle: String =
    s"""SELECT o_orderpriority, l_linestatus, count(*) AS line_cnt,
       |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority, l_linestatus
       |ORDER BY o_orderpriority, l_linestatus""".stripMargin

  /** Left-semi join (EXISTS): customers with at least one big order. */
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).where(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val q05Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no finalized ('F') order. */
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")

  val q06Oracle: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Equi + range join: lineitems shipped within 30 days of their order date.
    * The range predicate rides on the equi-join shuffle — no extra pass.
    */
  def q07RangeJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("line_cnt"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderstatus"))

  val q07Oracle: String =
    s"""SELECT o_orderstatus, count(*) AS line_cnt, ${Det.dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders
       |  ON l_orderkey = o_orderkey
       | AND l_shipdate >= o_orderdate
       | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Pure theta (band) self-join on the small supplier dim: suppliers with
    * account balances within ±50 of each other. Broadcast nested-loop on a
    * dim-sized input — never do this on a fact table without banding keys.
    */
  def q08ThetaBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("a_suppkey"), col("s_acctbal").as("a_bal"))
    val b = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("b_suppkey"), col("s_acctbal").as("b_bal"))
    a.join(broadcast(b),
        col("a_suppkey") =!= col("b_suppkey") &&
          col("b_bal") >= col("a_bal") - 50 && col("b_bal") <= col("a_bal") + 50)
      .groupBy(col("a_suppkey"))
      .agg(count(lit(1)).as("peer_cnt"), Det.dsum(col("b_bal")).as("peer_bal_sum"))
      .orderBy(col("a_suppkey"))
  }

  val q08Oracle: String =
    s"""SELECT a.s_suppkey AS a_suppkey, count(*) AS peer_cnt,
       |  ${Det.dsumSql("b.s_acctbal")} AS peer_bal_sum
       |FROM supplier a JOIN supplier b
       |  ON a.s_suppkey <> b.s_suppkey
       | AND b.s_acctbal >= a.s_acctbal - 50 AND b.s_acctbal <= a.s_acctbal + 50
       |GROUP BY a.s_suppkey ORDER BY a_suppkey""".stripMargin

  /** Multi-distinct aggregation (Spark plans expand + two-phase agg). */
  def q09AggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("supp_cnt"),
        countDistinct(col("l_partkey")).as("part_cnt"),
        count(lit(1)).as("line_cnt"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  val q09Oracle: String =
    s"""SELECT l_returnflag, count(DISTINCT l_suppkey) AS supp_cnt,
       |  count(DISTINCT l_partkey) AS part_cnt, count(*) AS line_cnt,
       |  ${Det.dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HLL sketch distinct-count — the 100 TB path where exact distinct is a
    * full shuffle. Spark's HLL++ value is engine-specific, so the oracle
    * checks it indirectly: output the exact distinct counts plus a boolean
    * asserting the sketch landed within its advertised error band (rsd=0.05
    * → check at a generous 3×rsd); DuckDB's twin emits the same exact counts
    * with literal TRUEs. A broken sketch flips a boolean and hash-fails.
    */
  def q10ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("a_ord"),
        approx_count_distinct(col("l_suppkey"), 0.05).as("a_sup"),
        approx_count_distinct(col("l_partkey"), 0.05).as("a_par"),
        count(lit(1)).as("exact_lines"))
      .select(
        col("exact_orders"), col("exact_supps"), col("exact_parts"), col("exact_lines"),
        (abs(col("a_ord") - col("exact_orders")) <= col("exact_orders") * 0.15).as("ok_orders"),
        (abs(col("a_sup") - col("exact_supps")) <= col("exact_supps") * 0.15).as("ok_supps"),
        (abs(col("a_par") - col("exact_parts")) <= col("exact_parts") * 0.15).as("ok_parts"))

  val q10Oracle: String =
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_suppkey) AS exact_supps,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(*) AS exact_lines,
      |  true AS ok_orders, true AS ok_supps, true AS ok_parts
      |FROM lineitem""".stripMargin

  /** ROLLUP with per-level grouping flags. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"),
        count(lit(1)).as("line_cnt"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val q11Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
       |  CAST(grouping(l_linestatus) AS TINYINT) AS g_status,
       |  count(*) AS line_cnt, ${Det.dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE over order status × priority. */
  def q12Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("order_cnt"), Det.dsum(col("o_totalprice")).as("sum_total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  val q12Oracle: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS order_cnt,
       |  ${Det.dsumSql("o_totalprice")} AS sum_total
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** GROUPING SETS via the SQL surface (spark.sql over a temp view). */
  def q13GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus, count(*) AS line_cnt,
         |  ${Det.dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem_gs
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  val q13Oracle: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS line_cnt,
       |  ${Det.dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition partial
    * top-k merged on the driver, no global sort. Unique tie-break key keeps
    * the row set deterministic.
    */
  def q14TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  val q14Oracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Pivot: order counts and exact sums reshaped to one column per priority
    * (explicit value list keeps the schema static — mandatory at scale, where
    * value discovery would be its own full scan).
    */
  def q49Pivot(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("urgent", "high", "medium", "notspec", "low")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +:
        prios.zip(names).map { case (p, n) => coalesce(col(s"`$p`"), lit(0L)).as(s"cnt_$n") }: _*)
      .orderBy(col("o_orderstatus"))
  }

  val q49Oracle: String =
    """SELECT o_orderstatus,
      |  count(*) FILTER (o_orderpriority = '1-URGENT') AS cnt_urgent,
      |  count(*) FILTER (o_orderpriority = '2-HIGH') AS cnt_high,
      |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS cnt_medium,
      |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS cnt_notspec,
      |  count(*) FILTER (o_orderpriority = '5-LOW') AS cnt_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q151

  /** Per-key top-k through the custom whole-operator extension
    * ([[graft.plans.TopKPerKey]]): the 3 highest-price lineitems per
    * returnflag, executed by `TopKPerKeyExec`'s bounded per-key heaps —
    * one pass, O(n log k), no sort of any group — instead of the
    * window-rank plan (full per-group sort) the same query would otherwise
    * produce. The DuckDB oracle IS the window-rank formulation, so the
    * hash-match doubles as an equivalence proof between the custom
    * operator and the relational definition. Tiebreaks (orderkey,
    * linenumber) make the order total, so top-3 is unique.
    */
  def q151TopkOperator(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    graft.plans.TopKPerKey.topK(li, Seq("l_returnflag"), "l_extendedprice",
        desc = true, tiebreaks = Seq("l_orderkey", "l_linenumber"), k = 3)
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  val q151Oracle: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q266

  /** Banded theta join at FACT scale — the equi-join rewrite q08's scaladoc
    * promises ("never do this on a fact table without banding keys"), now
    * delivered: pairs of lineitem rows (same returnflag) whose prices lie
    * within ±w of each other, found WITHOUT a nested-loop band join. Bin
    * each price to ⌊p/w⌋; |p_a − p_b| ≤ w implies |bin_a − bin_b| ≤ 1, so
    * exploding ONE side to its 3 adjacent bins and equi-joining on
    * (flag, bin) is a COMPLETE candidate generator (each true pair matches
    * exactly one exploded bin — the 3 bins are distinct), and the exact
    * band predicate filters after. Work is Σ per-bin occupancy products —
    * shuffle-partitioned, never n² (PlanSpec asserts no
    * BroadcastNestedLoopJoin / CartesianProduct). The oracle mirrors the
    * binning (DuckDB's own band join is >80× slower here), which the
    * completeness argument makes semantically identical to the raw theta
    * join.
    */
  def q266BinnedBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = 0.5
    val li = Tables.lineitem(spark, dir).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
      col("l_returnflag").as("flag"), col("l_extendedprice").as("p"))
    val a = li.select(col("rid").as("rid_a"), col("flag"), col("p").as("pa"),
      floor(col("p") / w).as("bin"))
    // r14 opt (guide §2.3 — shuffle fewer bytes): explode to TWO bins
    // (own, own+1) instead of three. An unordered band pair lands in the
    // SAME bin (matched in both orientations — rid_a < rid_b keeps one) or
    // in ADJACENT bins (matched exactly once, with the higher-bin row as
    // `a` via the lower row's bin0+1 entry — no rid dedup needed, and the
    // aggregates are symmetric in the pair). One third less exploded
    // shuffle and half the adjacent-bin join output, same exact result.
    val bx = li.select(col("rid").as("rid_b"), col("flag"), col("p").as("pb"),
        floor(col("p") / w).as("bin0"))
      .select(col("rid_b"), col("flag"), col("pb"), col("bin0"),
        explode(array(col("bin0"), col("bin0") + 1)).as("bin"))
    a.join(bx, Seq("flag", "bin"))
      .where(abs(col("pa") - col("pb")) <= w &&
        (col("bin") =!= col("bin0") || col("rid_a") < col("rid_b")))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_pairs"), Det.dsum(col("pa") + col("pb")).as("sum_pp"))
      .orderBy(col("flag"))
  }

  val q266Oracle: String =
    s"""WITH li AS (SELECT l_orderkey*10 + l_linenumber AS rid, l_returnflag AS flag,
       |                   l_extendedprice AS p FROM lineitem),
       |a AS (SELECT rid AS rid_a, flag, p AS pa, CAST(floor(p / 0.5) AS BIGINT) AS bin FROM li),
       |bx AS (SELECT rid AS rid_b, flag, p AS pb,
       |         unnest([CAST(floor(p / 0.5) AS BIGINT) - 1,
       |                 CAST(floor(p / 0.5) AS BIGINT),
       |                 CAST(floor(p / 0.5) AS BIGINT) + 1]) AS bin FROM li)
       |SELECT flag, count(*) AS n_pairs, ${Det.dsumSql("pa + pb")} AS sum_pp
       |FROM a JOIN bx USING (flag, bin)
       |WHERE rid_a < rid_b AND abs(pa - pb) <= 0.5
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q266_binned_band_join", q266BinnedBandJoin, q266Oracle),
    GraftQuery.sql("q01_pricing_summary", q01PricingSummary, q01Oracle),
    GraftQuery.sql("q02_filter_pushdown", q02FilterPushdown, q02Oracle),
    GraftQuery.sql("q03_broadcast_join_star", q03BroadcastJoinStar, q03Oracle),
    GraftQuery.sql("q04_shuffle_join_agg", q04ShuffleJoinAgg, q04Oracle),
    GraftQuery.sql("q05_semi_join", q05SemiJoin, q05Oracle),
    GraftQuery.sql("q06_anti_join", q06AntiJoin, q06Oracle),
    GraftQuery.sql("q07_range_join", q07RangeJoin, q07Oracle),
    GraftQuery.sql("q08_theta_band_join", q08ThetaBandJoin, q08Oracle),
    GraftQuery.sql("q09_agg_distinct", q09AggDistinct, q09Oracle),
    GraftQuery.sql("q10_approx_distinct", q10ApproxDistinct, q10Oracle),
    GraftQuery.sql("q11_rollup", q11Rollup, q11Oracle),
    GraftQuery.sql("q12_cube", q12Cube, q12Oracle),
    GraftQuery.sql("q13_grouping_sets", q13GroupingSets, q13Oracle),
    GraftQuery.sql("q14_topk", q14TopK, q14Oracle),
    GraftQuery.sql("q49_pivot", q49Pivot, q49Oracle),
    GraftQuery.sql("q151_topk_operator", q151TopkOperator, q151Oracle)
  )
}
