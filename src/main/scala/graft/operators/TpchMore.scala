package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Second batch of TPC-H-shaped composites (Q4/Q8/Q12/Q14/Q18/Q19/Q22),
  * adapted to the corpus schema (no partsupp/shipmode/commitdate columns —
  * each adaptation keeps the query's defining plan shape: the ratio
  * aggregate, the OR'd pushdown, the semi/anti join, the having-filtered
  * self-aggregation). All money sums go through [[Det.dsum]]; ratios divide
  * two exact-decimal doubles, which IEEE-754 specifies bit-exactly.
  */
object TpchMore {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  /** Q8-shaped national market share: NATION_3's share of ASIA-market
    * STANDARD-part revenue per order year. Every dim broadcasts (supplier
    * pre-joined to its nation); the one shuffle is lineitem⋈orders. The
    * share is a ratio of two exact sums computed in a single aggregation
    * pass — no second scan, no join of two aggregates.
    */
  def q85TpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custRegion = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).where(col("p_type") === "STANDARD")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        Det.dsum(when(col("supp_nation") === "NATION_3", revenue).otherwise(lit(0.0)))
          .as("nation_volume"),
        Det.dsum(revenue).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .select("o_year", "nation_volume", "total_volume", "mkt_share")
      .orderBy(col("o_year"))
  }

  val q85Oracle: String =
    s"""SELECT o_year, nation_volume, total_volume,
       |  nation_volume / total_volume AS mkt_share
       |FROM (
       |  SELECT year(o_orderdate) AS o_year,
       |    ${Det.dsumSql(s"CASE WHEN n2.n_name = 'NATION_3' THEN $revenueSql ELSE 0.0 END")} AS nation_volume,
       |    ${Det.dsumSql(revenueSql)} AS total_volume
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
       |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY o_year)
       |ORDER BY o_year""".stripMargin

  /** Q12-shaped late-shipment priority split: lineitems shipped more than 60
    * days after their order date, split per returnflag into high- vs
    * low-priority line counts (the corpus has no shipmode/commitdate; the
    * CASE-count-over-join shape is Q12's). One shuffle join on the order key.
    */
  def q86TpchQ12(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))

  val q86Oracle: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
      |    AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q14-shaped promo revenue share for one ship year: 100 · promo / total,
    * both sums from one pass over lineitem ⋈ broadcast(part). The year
    * filter pushes into the lineitem scan.
    */
  def q87TpchQ14(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        Det.dsum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0)))
          .as("promo_revenue"),
        Det.dsum(revenue).as("total_revenue"))
      .withColumn("promo_share", (lit(100.0) * col("promo_revenue")) / col("total_revenue"))
      .select("promo_revenue", "total_revenue", "promo_share")

  val q87Oracle: String =
    s"""SELECT promo_revenue, total_revenue,
       |  (100.0 * promo_revenue) / total_revenue AS promo_share
       |FROM (
       |  SELECT
       |    ${Det.dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE 0.0 END")} AS promo_revenue,
       |    ${Det.dsumSql(revenueSql)} AS total_revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00')""".stripMargin

  /** Q18-shaped large-quantity orders: the self-aggregation-with-HAVING
    * pattern — aggregate lineitem per order, keep orders above the quantity
    * threshold, then enrich with orders + broadcast customer and re-aggregate.
    * The big-order set is tiny after the HAVING, so AQE may broadcast it into
    * the orders join; at 100 TB both aggregations are plain hash shuffles on
    * the order key (the first one map-side-combined).
    */
  def q88TpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 300.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  val q88Oracle: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM (SELECT l_orderkey, ${Det.dsumSql("l_quantity")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey) big
       |JOIN orders ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE sum_qty > 300.0
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q19-shaped OR'd-predicate revenue: three (brand, size-range,
    * quantity-range) disjuncts over lineitem ⋈ broadcast(part). The
    * single-table implications of the disjunction are pre-derived and pushed
    * into each scan — the part side keeps only the three (brand, size)
    * branches before broadcasting, the lineitem side keeps the quantity
    * envelope [1, 50] — and the full mixed-table disjunction re-applies
    * post-join for exactness. At 100 TB the derived pushdowns are the
    * difference between broadcasting 3 brands and the whole part dim.
    */
  def q89TpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val partPre = Tables.part(spark, dir).where(
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)))
    Tables.lineitem(spark, dir)
      .where(col("l_quantity").between(1, 50))
      .join(broadcast(partPre), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50)))
      .agg(count(lit(1)).as("matched_lines"), Det.dsum(revenue).as("revenue"))
  }

  val q89Oracle: String =
    s"""SELECT count(*) AS matched_lines, ${Det.dsumSql(revenueSql)} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** Q22-shaped dormant high-balance customers: customers with
    * above-average balance and NO urgent order — the scalar-subquery +
    * anti-join pattern. The global average is a broadcast scalar (single-row
    * cross join, no collect); the anti join shuffles on custkey (or
    * broadcasts the urgent set when small). Grouped per nation like Q22's
    * cntrycode.
    */
  def q90TpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.agg(
      (Det.dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), Det.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q90Oracle: String =
    s"""SELECT n_name, count(*) AS numcust, ${Det.dsumSql("c_acctbal")} AS totacctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > (SELECT ${Det.dsumSql("c_acctbal")} / count(*) FROM customer)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q4-shaped order-priority check: orders having at least one lineitem
    * shipped more than 60 days after the order date, counted per priority —
    * the EXISTS-as-semi-join pattern with a non-equi component riding on the
    * equi key (orderkey), so it still plans as a keyed join, never a
    * cartesian product.
    */
  def q91TpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("lo_key"), col("l_shipdate"))
    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("lo_key") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q91Oracle: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q17-shaped small-quantity revenue: lineitems under 20% of their part's
    * average quantity, for one brand — the correlated-scalar-subquery-
    * per-group pattern. The per-part averages are computed only over the
    * brand's lineitems (the brand filter semi-restricts the subquery — same
    * values for the surviving parts, a fraction of the work), and the tiny
    * threshold table broadcasts back onto the fact scan.
    *
    * Numerics: avg = exact decimal sum / count (IEEE division), × a double
    * 0.2 literal (DuckDB side CASTs 0.2 to DOUBLE so both engines multiply
    * the identical binary values); the comparison is then bit-deterministic.
    */
  def q106TpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .where(col("p_brand") === "Brand#1").select(col("p_partkey"))
    val liBrand = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val thresholds = liBrand.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * (Det.dsum(col("l_quantity")) / count(lit(1)))).as("thr"))
    liBrand
      .join(broadcast(thresholds), col("l_partkey") === col("t_partkey"))
      .where(col("l_quantity") < col("thr"))
      .agg(count(lit(1)).as("small_lines"),
        (Det.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q106Oracle: String =
    s"""WITH thr AS (
       |  SELECT l_partkey,
       |    CAST(0.2 AS DOUBLE) * (${Det.dsumSql("l_quantity")} / count(*)) AS thr
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#1' GROUP BY l_partkey)
       |SELECT count(*) AS small_lines,
       |  ${Det.dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN thr t ON l.l_partkey = t.l_partkey
       |WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.thr""".stripMargin

  /** Q15-shaped top supplier: per-supplier revenue for one quarter, keep the
    * supplier(s) matching the global maximum — the view-plus-max pattern.
    * The maximum is a broadcast scalar (single-row cross join, no driver
    * collect); equality on the exact decimal-sum double is well-defined
    * because both sides come from the same deterministic aggregation.
    */
  def q107TpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(Det.dsum(revenue).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q107Oracle: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, ${Det.dsumSql(revenueSql)} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** Q21-shaped waiting-supplier count: suppliers with a late lineitem
    * (shipped > 60 days after the order date) on multi-supplier orders where
    * they are the ONLY late supplier. Q21's double EXISTS / NOT EXISTS
    * correlation collapses into one (order, supplier) aggregation plus one
    * order-level rollup — two keyed shuffles instead of two correlated
    * re-scans of lineitem, the shape that survives 100 TB. Top 10 by count
    * with the name as tiebreak.
    */
  def q108TpchQ21(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .cast("int").as("late"))
    // localCheckpoint (r14): perOrderSupp feeds the per-order rollup AND
    // the final join — without it the fact⋈orders join + aggregation runs
    // twice (exchange reuse only dedups the shuffles, not the join+agg).
    val perOrderSupp = lines.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("s_late"))
      .localCheckpoint()
    val perOrder = perOrderSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("s_late")).as("n_late_supp"))
    perOrderSupp.join(perOrder, "l_orderkey")
      .where(col("s_late") === 1 && col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(10)
  }

  val q108Oracle: String =
    """WITH pos AS (
      |  SELECT l_orderkey, l_suppkey,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |        THEN 1 ELSE 0 END) AS s_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_orderkey, l_suppkey),
      |po AS (
      |  SELECT l_orderkey, count(*) AS n_supp, sum(s_late) AS n_late_supp
      |  FROM pos GROUP BY l_orderkey)
      |SELECT s_name, count(*) AS numwait
      |FROM pos JOIN po USING (l_orderkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_late = 1 AND n_supp >= 2 AND n_late_supp = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** TPC-H Q6: the forecasting-revenue-change query — a pure scan-side
    * filter + single global aggregate, THE pushdown/vectorization
    * benchmark. All three predicates reach the parquet scan as
    * PushedFilters (asserted in PlanSpec); the aggregation is a one-row
    * partial+final with no shuffle of data rows at any scale.
    */
  def q123TpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 25.0)
      .agg(Det.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  val q123Oracle: String =
    s"""SELECT ${Det.dsumSql("l_extendedprice * l_discount")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.03 AND 0.07
       |  AND l_quantity < 25.0""".stripMargin

  /** TPC-H Q13: customer order-count distribution — the LEFT OUTER join
    * benchmark (customers with zero qualifying orders must survive into the
    * c_count = 0 bucket). Two aggregations chained: per-customer counts of
    * non-urgent orders, then the histogram over counts. Both group on
    * high-cardinality-then-small keys; the left join shuffles once on
    * custkey.
    */
  def q124TpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q124Oracle: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q9-shaped product-profit rollup: profit per (supplier nation,
    * order year) over parts whose name matches the pattern — the 5-way
    * join-order stress shape. No partsupp/supplycost in this corpus, so
    * cost stands in as 80% of retail price × quantity (per-row double
    * chain, deterministic; the sum goes through the exact-decimal path).
    * Plan contract at any scale: part (filtered by the LIKE), supplier, and
    * nation all BROADCAST; the only shuffle joins lineitem to orders; the
    * rollup is partial+final on a (nation, year) key.
    */
  def q129TpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val p = Tables.part(spark, dir).where(col("p_name").contains("bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = revenue - lit(0.8) * col("p_retailprice") * col("l_quantity")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(Det.dsum(amount).as("sum_profit"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), desc("o_year"))
  }

  val q129Oracle: String = {
    val amountSql = s"$revenueSql - 0.8 * p_retailprice * l_quantity"
    s"""SELECT n_name, o_year, ${Det.dsumSql(amountSql)} AS sum_profit,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN (SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year FROM orders) o
       |  ON l_orderkey = o.o_orderkey
       |GROUP BY n_name, o_year
       |ORDER BY n_name, o_year DESC""".stripMargin
  }

  // ---------------------------------------------------------------- q139
  // The corpus ships no partsupp table; the part↔supplier relation (and a
  // supply-cost surrogate, min observed unit price) is DERIVED from lineitem
  // once per query: ps(partkey, suppkey, supplycost = min(extprice/qty)).
  // min() over identically-computed doubles is order-independent, so the
  // surrogate is oracle-stable without decimal detours.

  /** TPC-H Q2 (min-cost supplier). Defining shape: the correlated scalar
    * subquery "cost = (SELECT min(cost) ... same part, same region)",
    * realized here as a window min over the part key — one shuffle by
    * partkey instead of Q2's textbook re-join of an aggregated subquery.
    * The part filter (size=15, STANDARD) commutes with the per-part window,
    * so it is applied BEFORE the window shuffle (broadcast part dim prunes
    * the derived ps early); supplier→nation→region is a broadcast chain.
    * Top-100 via TakeOrderedAndProject with a unique (partkey, s_name)
    * tie-break.
    */
  def q139TpchQ2(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val targetParts = Tables.part(spark, dir)
      .where(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
    val w = Window.partitionBy(col("ps_partkey"))
    ps.join(broadcast(targetParts), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("ps_supplycost")).over(w))
      .where(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("ps_supplycost").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q139Oracle: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    min(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2),
      |eps AS (
      |  SELECT ps.*, s_name, s_acctbal, n_name, p_partkey, p_name,
      |    min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
      |  FROM ps
      |  JOIN part ON ps_partkey = p_partkey
      |    AND p_size = 15 AND p_type = 'STANDARD'
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  ps_supplycost AS supplycost
      |FROM eps
      |WHERE ps_supplycost = min_cost
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q140

  /** TPC-H Q11 (important stock). Defining shape: GROUP BY ... HAVING
    * sum > fraction × (scalar subquery recomputing the global sum).
    * Single-pass variant: the per-part DECIMAL sums are aggregated once;
    * the global total is the exact decimal sum OF THE GROUP SUMS (a
    * 2000-row second aggregate, broadcast back) — no second lineitem scan,
    * exact because decimal addition is associative. Value = extprice×(1-disc)
    * for lineitems supplied by EUROPE-region suppliers (broadcast dim chain;
    * Q11's single GERMANY nation is empty at sf0.001, the region is not).
    */
  def q140TpchQ11(spark: SparkSession, dir: String): DataFrame = {
    val supp7 = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val grouped = Tables.lineitem(spark, dir)
      .join(broadcast(supp7), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("dv"))
    val total = grouped.agg(sum(col("dv")).cast("double").as("grand"))
    grouped.crossJoin(broadcast(total))
      .where(col("dv").cast("double") > col("grand") * 0.001)
      .select(col("l_partkey"), col("dv").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q140Oracle: String =
    """WITH grouped AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS dv
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(dv AS DOUBLE) AS part_value
      |FROM grouped
      |WHERE CAST(dv AS DOUBLE) >
      |  (SELECT CAST(sum(dv) AS DOUBLE) FROM grouped) * 0.001
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- q141

  /** TPC-H Q16 (supplier count by part attributes). Defining shape:
    * count(DISTINCT suppkey) grouped by (brand, type, size) over the
    * part↔supplier relation, minus a NOT IN supplier exclusion — planned
    * as a broadcast left-anti join (negative account balance stands in for
    * Q16's complaint filter). The derived pair set dedups (partkey,
    * suppkey) in one shuffle; part attributes arrive via broadcast.
    */
  def q141TpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val badSupp = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#5" && !col("p_type").startsWith("PROMO") &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    pairs
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q141Oracle: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- q142

  /** TPC-H Q20 (excess-availability suppliers). Defining shape: the nested
    * semi-join chain supplier ⋉ (per-(supp,part) aggregate HAVING qty-in-
    * window > 50% of total) ⋉ (name-prefix parts), then a nation filter.
    * Availability has no corpus analogue, so the "excess" predicate is
    * 1995 shipped quantity > half of all-years shipped quantity — same
    * conditional-aggregate-vs-total comparison, exact via decimal sums.
    * Prefix parts broadcast into the lineitem scan; the supplier probe is
    * a LEFT SEMI against the distinct qualifying suppkeys.
    */
  def q142TpchQ20(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .where(col("p_name").startsWith("small")).select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, dir)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        Det.dsum(when(year(col("l_shipdate")) === 1995, col("l_quantity"))
          .otherwise(lit(0.0))).as("q95"),
        Det.dsum(col("l_quantity")).as("qt"))
      .where(col("q95") > col("qt") * 0.5)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .where(col("n_name").isin("NATION_3", "NATION_8"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"), col("n_name"))
      .orderBy(col("s_name"))
  }

  val q142Oracle: String =
    s"""WITH qualifying AS (
       |  SELECT DISTINCT l_suppkey FROM (
       |    SELECT l_suppkey, l_partkey,
       |      ${Det.dsumSql("CASE WHEN year(l_shipdate) = 1995 THEN l_quantity ELSE 0.0 END")} AS q95,
       |      ${Det.dsumSql("l_quantity")} AS qt
       |    FROM lineitem
       |    JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
       |    GROUP BY 1, 2)
       |  WHERE q95 > qt * 0.5)
       |SELECT s_name, s_acctbal, n_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |  AND n_name IN ('NATION_3', 'NATION_8')
       |WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
       |ORDER BY s_name""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q85_tpch_q8", q85TpchQ8, q85Oracle),
    GraftQuery.sql("q86_tpch_q12", q86TpchQ12, q86Oracle),
    GraftQuery.sql("q87_tpch_q14", q87TpchQ14, q87Oracle),
    GraftQuery.sql("q88_tpch_q18", q88TpchQ18, q88Oracle),
    GraftQuery.sql("q89_tpch_q19", q89TpchQ19, q89Oracle),
    GraftQuery.sql("q90_tpch_q22", q90TpchQ22, q90Oracle),
    GraftQuery.sql("q91_tpch_q4", q91TpchQ4, q91Oracle),
    GraftQuery.sql("q106_tpch_q17", q106TpchQ17, q106Oracle),
    GraftQuery.sql("q107_tpch_q15", q107TpchQ15, q107Oracle),
    GraftQuery.sql("q108_tpch_q21", q108TpchQ21, q108Oracle),
    GraftQuery.sql("q123_tpch_q6", q123TpchQ6, q123Oracle),
    GraftQuery.sql("q124_tpch_q13", q124TpchQ13, q124Oracle),
    GraftQuery.sql("q129_tpch_q9", q129TpchQ9, q129Oracle),
    GraftQuery.sql("q139_tpch_q2", q139TpchQ2, q139Oracle),
    GraftQuery.sql("q140_tpch_q11", q140TpchQ11, q140Oracle),
    GraftQuery.sql("q141_tpch_q16", q141TpchQ16, q141Oracle),
    GraftQuery.sql("q142_tpch_q20", q142TpchQ20, q142Oracle)
  )
}
