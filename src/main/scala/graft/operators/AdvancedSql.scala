package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Advanced SQL surface: statistical moments, exact percentiles, correlated
  * scalar subqueries, IN/NOT IN subqueries, ordered string aggregation, map
  * functions, extended window analytics, and the array-function sweep.
  * (Engine-layer operators per SURVEY.md §2b — the reference connector has
  * no relational surface of its own; its capability is "any Spark workload
  * over the FileSystem API", which these queries exercise via parquet scans.)
  *
  * Determinism doctrine (SURVEY.md §5): every double that crosses the oracle
  * boundary is either (a) produced by the SAME sequence of IEEE ops on
  * identical inputs in both engines, or (b) an exact decimal sum cast back.
  * Variance/correlation use explicit decimal-sum moment formulas rather than
  * built-in `stddev`/`corr` because accumulation order differs between
  * engines; the formulas are bit-deterministic.
  */
object AdvancedSql {

  /** Variance / stddev / correlation per return flag from explicit moment
    * sums — shuffle-once and partial-aggregation-friendly at any scale.
    *
    * Numerics: the moments are EXACT scaled integers (quantities are
    * integral; prices have 2 decimals → cents), accumulated in 128-bit-wide
    * arithmetic (Spark DECIMAL(38,0), DuckDB HUGEINT). The covariance
    * numerator n·Σxy − Σx·Σy suffers catastrophic cancellation, so even a
    * 1-ulp difference in a double product would blow up the quotient — with
    * exact integer numerators/denominators both engines convert the same
    * integers and perform the same four IEEE ops. (A decimal-sum-of-doubles
    * variant mismatched DuckDB at the 1e-10 level for exactly this reason.)
    */
  def q51StatsMoments(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_mom")
    spark.sql(
      """SELECT l_returnflag, n,
        |  CAST(denx AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var_qty,
        |  sqrt(CAST(denx AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS std_qty,
        |  CAST(numxy AS DOUBLE) / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE))) AS corr_qty_price
        |FROM (SELECT l_returnflag, n,
        |        CAST(n AS DECIMAL(38,0)) * sqq - sq * sq AS denx,
        |        CAST(n AS DECIMAL(38,0)) * spp - sp * sp AS deny,
        |        CAST(n AS DECIMAL(38,0)) * sqp - sq * sp AS numxy
        |      FROM (SELECT l_returnflag, count(*) AS n,
        |              sum(CAST(qi AS DECIMAL(38,0))) AS sq,
        |              sum(CAST(qi * qi AS DECIMAL(38,0))) AS sqq,
        |              sum(CAST(pi AS DECIMAL(38,0))) AS sp,
        |              sum(CAST(pi * pi AS DECIMAL(38,0))) AS spp,
        |              sum(CAST(qi * pi AS DECIMAL(38,0))) AS sqp
        |            FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qi,
        |                    CAST(round(l_extendedprice * 100) AS BIGINT) AS pi
        |                  FROM lineitem_mom)
        |            GROUP BY l_returnflag))
        |ORDER BY l_returnflag""".stripMargin)
  }

  val q51Oracle: String =
    """SELECT l_returnflag, n,
      |  CAST(denx AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var_qty,
      |  sqrt(CAST(denx AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS std_qty,
      |  CAST(numxy AS DOUBLE) / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE))) AS corr_qty_price
      |FROM (SELECT l_returnflag, n,
      |        CAST(n AS HUGEINT) * sqq - sq * sq AS denx,
      |        CAST(n AS HUGEINT) * spp - sp * sp AS deny,
      |        CAST(n AS HUGEINT) * sqp - sq * sp AS numxy
      |      FROM (SELECT l_returnflag, count(*) AS n,
      |              CAST(sum(qi) AS HUGEINT) AS sq, CAST(sum(qi * qi) AS HUGEINT) AS sqq,
      |              CAST(sum(pi) AS HUGEINT) AS sp, CAST(sum(pi * pi) AS HUGEINT) AS spp,
      |              CAST(sum(qi * pi) AS HUGEINT) AS sqp
      |            FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qi,
      |                    CAST(round(l_extendedprice * 100) AS BIGINT) AS pi FROM lineitem)
      |            GROUP BY l_returnflag))
      |ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated percentiles (quartiles + median) of l_quantity per
    * return flag. Spark's `percentile` and DuckDB's `quantile_cont` share the
    * p·(n−1) linear-interpolation definition; quantities are integral doubles
    * and quartile fractions are exact binary, so interpolation is exact.
    */
  def q52Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        min(col("l_quantity")).as("p0"),
        max(col("l_quantity")).as("p100"))
      .orderBy(col("l_returnflag"))

  val q52Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  min(l_quantity) AS p0, max(l_quantity) AS p100
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated scalar subquery: orders priced above 1.2× their customer's
    * average. Catalyst decorrelates this into a join with an aggregated
    * subquery — one shuffle on o_custkey, no per-row subquery execution.
    */
  def q53ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_sq")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_sq o
        |WHERE o_totalprice > 1.2 * (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |  FROM orders_sq o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q53Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > 1.2 * (
      |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** IN / NOT IN subqueries on null-free keys (planned as semi/anti joins). */
  def q54SubqueryIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_sq")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_sq")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_sq2")
    spark.sql(
      """SELECT c_custkey, c_name, c_nationkey FROM customer_sq
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation_sq WHERE n_regionkey = 2)
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders_sq2 WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  val q54Oracle: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
      |  AND c_custkey NOT IN (
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Ordered string aggregation: sorted-distinct CSV of order statuses per
    * priority (collect_set → array_sort → concat_ws keeps the aggregation
    * order-independent and therefore deterministic under any partitioning).
    */
  def q55StringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses_csv"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("order_cnt"))
      .orderBy(col("o_orderpriority"))

  val q55Oracle: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses_csv,
      |  count(DISTINCT o_orderstatus) AS n_statuses, count(*) AS order_cnt
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Map functions over the JSON props payload: typed map extraction, key
    * enumeration, lookup with default for a missing key.
    */
  def q56MapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), lit("map<string,int>")))
      .select(
        col("event_id"),
        size(col("m")).as("n_keys"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
        element_at(col("m"), "k").as("k_val"),
        coalesce(element_at(col("m"), "missing"), lit(-1)).as("missing_val"))
      .orderBy(col("event_id"))

  val q56Oracle: String =
    """SELECT event_id,
      |  len(json_keys(props)) AS n_keys,
      |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
      |  coalesce(CAST(json_extract_string(props, '$.missing') AS INTEGER), -1) AS missing_val
      |FROM events ORDER BY event_id""".stripMargin

  /** Extended window analytics: percent_rank / cume_dist / ntile / nth_value
    * (explicit full-partition frame — default frames differ across engines).
    */
  def q57WindowExtras(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_orderstatus"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        percent_rank().over(ord).as("pct_rank"),
        cume_dist().over(ord).as("cume"),
        ntile(7).over(ord).as("bucket7"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"))
      .orderBy(col("o_orderkey"))
  }

  val q57Oracle: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  ntile(7) OVER w AS bucket7,
      |  nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice DESC, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Array-function sweep on synthesized integer arrays: union / intersect /
    * except / position / contains / slice / flatten / overlap — all reduced
    * to scalars so the output hash is representation-independent.
    */
  def q58ArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .selectExpr(
        "p_partkey",
        "sequence(p_partkey % 5, p_partkey % 5 + 6) AS a",
        "sequence(3, 9) AS b")
      .selectExpr(
        "p_partkey",
        "size(array_union(a, b)) AS union_sz",
        "size(array_intersect(a, b)) AS inter_sz",
        "size(array_except(a, b)) AS except_sz",
        "array_position(a, 3) AS pos3",
        "array_contains(a, 5) AS has5",
        "concat_ws(',', slice(a, 2, 3)) AS slice_csv",
        "size(flatten(array(a, b))) AS flat_sz",
        "arrays_overlap(a, b) AS overlaps")
      .orderBy(col("p_partkey"))

  val q58Oracle: String =
    """SELECT p_partkey,
      |  len(list_distinct(a || b)) AS union_sz,
      |  len(list_intersect(a, b)) AS inter_sz,
      |  len(list_filter(list_distinct(a), x -> NOT list_contains(b, x))) AS except_sz,
      |  CAST(coalesce(list_position(a, 3), 0) AS BIGINT) AS pos3,
      |  list_contains(a, 5) AS has5,
      |  array_to_string(a[2:4], ',') AS slice_csv,
      |  len(flatten([a, b])) AS flat_sz,
      |  list_has_any(a, b) AS overlaps
      |FROM (SELECT p_partkey,
      |        [i for i in range(p_partkey % 5, p_partkey % 5 + 7)] AS a,
      |        [i for i in range(3, 10)] AS b
      |      FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** Latest/earliest record per key via max_by/min_by (arg_max/arg_min) —
    * the CDC-compaction shape: collapse an event log to each key's current
    * state in ONE aggregation pass (no window, no self-join). event_id is
    * the unique order key, so ties cannot occur.
    */
  def q75LatestPerKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_type"), col("event_id")).as("last_type"),
        max_by(col("value"), col("event_id")).as("last_value"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max(col("event_id")).as("last_event_id"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  val q75Oracle: String =
    s"""SELECT user_id, arg_max(event_type, event_id) AS last_type,
       |  arg_max(value, event_id) AS last_value,
       |  arg_min(event_type, event_id) AS first_type,
       |  max(event_id) AS last_event_id, count(*) AS n_events
       |FROM (${Det.EventsSql})
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Approximate-quantile sketch validated against the exact quantile inside
    * Spark (the sketch value itself is engine-specific, so the oracle checks
    * booleans — same pattern as q10's HLL check). At 100 TB the sketch is
    * the only affordable path: mergeable, single-pass, bounded memory.
    */
  def q76ApproxQuantile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        expr("percentile(l_extendedprice, 0.5)").as("ep50"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("ap99"),
        expr("percentile(l_extendedprice, 0.99)").as("ep99"))
      .select(
        col("n"),
        (abs(col("ap50") - col("ep50")) <= col("ep50") * 0.02).as("ok_p50"),
        (abs(col("ap99") - col("ep99")) <= col("ep99") * 0.02).as("ok_p99"))

  val q76Oracle: String =
    """SELECT count(*) AS n, true AS ok_p50, true AS ok_p99 FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q148

  /** Share-of-parent (contribution) analysis: each event type's share of its
    * day's total value. Both levels are EXACT-DECIMAL sums — the per-(day,
    * type) aggregate keeps its decimal sum un-cast, and the day total is a
    * window sum OVER THE DECIMAL column (decimal addition is associative, so
    * the window's evaluation order can't change the result); the share is
    * then one IEEE-exact division of two identically-derived doubles. The
    * shape is one shuffle (groupBy day+type) plus a same-key window — the
    * window re-uses the aggregation's partitioning at scale.
    */
  def q148ShareOfDay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val byDay = Window.partitionBy(col("day"))
    ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("dv"))
      .withColumn("dtot", sum(col("dv")).over(byDay))
      .select(col("day"), col("event_type"),
        col("dv").cast("double").as("type_value"),
        col("dtot").cast("double").as("day_value"),
        (col("dv").cast("double") / col("dtot").cast("double")).as("share"))
      .orderBy(col("day"), col("event_type"))
  }

  val q148Oracle: String =
    s"""WITH ev AS (${Det.EventsSql}),
       |g AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type,
       |    sum(CAST(value AS DECIMAL(18,4))) AS dv
       |  FROM ev GROUP BY 1, 2),
       |w AS (SELECT day, event_type, dv,
       |        sum(dv) OVER (PARTITION BY day) AS dtot FROM g)
       |SELECT day, event_type,
       |  CAST(dv AS DOUBLE) AS type_value,
       |  CAST(dtot AS DOUBLE) AS day_value,
       |  CAST(dv AS DOUBLE) / CAST(dtot AS DOUBLE) AS share
       |FROM w ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------- q162

  /** MODE aggregate (most frequent value) per group — count per (group,
    * value), then the winner by (count DESC, value) — a deterministic
    * alphabetical tiebreak, because an unordered mode is a shuffle lottery.
    * Two shuffles: the (group, value) count and the per-group argmax; the
    * argmax runs on the aggregated counts, so the heavy key space never
    * sorts. The categorical summary statistic Spark has no built-in for.
    */
  def q162ModePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.part(spark, dir)
      .groupBy(col("p_brand"), col("p_type")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("n").desc, col("p_type"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("n_total", sum(col("n")).over(Window.partitionBy(col("p_brand"))))
      .where(col("rn") === 1)
      .select(col("p_brand"), col("p_type").as("mode_type"),
        col("n").as("n_mode"), col("n_total"))
      .orderBy(col("p_brand"))
  }

  val q162Oracle: String =
    """WITH c AS (SELECT p_brand, p_type, count(*) AS n FROM part GROUP BY 1, 2),
      |r AS (SELECT p_brand, p_type, n,
      |        row_number() OVER (PARTITION BY p_brand ORDER BY n DESC, p_type) AS rn,
      |        CAST(sum(n) OVER (PARTITION BY p_brand) AS BIGINT) AS n_total
      |      FROM c)
      |SELECT p_brand, p_type AS mode_type, n AS n_mode, n_total
      |FROM r WHERE rn = 1 ORDER BY p_brand""".stripMargin

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): each customer's referral
    * chain walks `custkey → custkey div 2` up to the root, and the output
    * histograms customers by chain depth. The recursion is the engine's
    * iterative-fixpoint operator — each step is one self-union the optimizer
    * plans as a loop of distributed batches, never a driver-side walk. Depth
    * is logarithmic in the key space (~17 levels at SF1), far under the
    * recursion-level limit; all outputs are integers.
    */
  def q222RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_rc")
    spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS k, CAST(c_custkey AS BIGINT) AS cur, 0 AS depth
        |  FROM customer_rc
        |  UNION ALL
        |  SELECT k, cur DIV 2, depth + 1 FROM chain WHERE cur > 1
        |)
        |SELECT depth AS root_depth, count(*) AS n_customers,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM (SELECT k, max(depth) AS depth FROM chain GROUP BY k)
        |GROUP BY root_depth ORDER BY root_depth""".stripMargin)
  }

  val q222Oracle: String =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS k, CAST(c_custkey AS BIGINT) AS cur, 0 AS depth
      |  FROM customer
      |  UNION ALL
      |  SELECT k, cur // 2, depth + 1 FROM chain WHERE cur > 1
      |)
      |SELECT depth AS root_depth, CAST(count(*) AS BIGINT) AS n_customers,
      |  min(k) AS min_key, max(k) AS max_key
      |FROM (SELECT k, max(depth) AS depth FROM chain GROUP BY k)
      |GROUP BY root_depth ORDER BY root_depth""".stripMargin

  /** SQL pipe syntax (Spark 4 `|>` operators): the same filter→aggregate→sort
    * written as a left-to-right pipeline. Pipe stages compile to the
    * identical logical plan as the nested form — this query pins that parity
    * against the classic-SQL oracle (same scan pushdown, same partial
    * aggregation).
    */
  def q223PipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_ps")
    spark.sql(
      """FROM lineitem_ps
        ||> WHERE l_shipdate <= DATE '1998-09-02'
        ||> AGGREGATE count(*) AS line_cnt,
        |     sum(CAST(l_quantity AS BIGINT)) AS sum_qty GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  val q223Oracle: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS line_cnt,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Re-aggregatable distinct-count sketches (DataSketches HLL): per-quarter
    * partial sketches of the customer key, merged with `hll_union_agg` and
    * estimated — the 100 TB pattern where daily/partition sketches are tiny,
    * mergeable, and never rescan history (vs q10's one-shot
    * approx_count_distinct). The sketch estimate is deterministic for a
    * given input multiset, and the oracle is q10's tolerance-boolean shape:
    * exact counts plus a literal-true twin of the ±5% check.
    */
  def q224HllMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), date_trunc("quarter", col("o_orderdate")).as("q"))
    val merged = o.groupBy(col("q"))
      .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_quarters"))
    val exact = o.agg(countDistinct(col("o_custkey")).as("exact_custs"))
    exact.crossJoin(broadcast(merged))
      .select(col("exact_custs"), col("n_quarters"),
        (abs(col("est") - col("exact_custs")) <= col("exact_custs") * 0.05).as("ok"))
  }

  val q224Oracle: String =
    """SELECT count(DISTINCT o_custkey) AS exact_custs,
      |  CAST(count(DISTINCT date_trunc('quarter', o_orderdate)) AS BIGINT) AS n_quarters,
      |  true AS ok
      |FROM orders""".stripMargin

  /** VARIANT ingestion (Spark 4 semi-structured type): event props parsed
    * once into VARIANT, a typed field extracted with `variant_get`, then
    * aggregated per event type. VARIANT keeps the parsed binary form
    * columnar (parse once, extract many) — the schema-on-read path for
    * ragged JSON at scale, vs q24's per-field `get_json_object` reparse.
    * All outputs are integer sums/counts.
    */
  def q225VariantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q225Oracle: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Count-min-sketch heavy hitters: a mergeable CMS of `l_partkey`
    * (`df.stat.countMinSketch`, fixed seed) probed for the top-20 true
    * keys. The sketch is the 100 TB shape for frequency estimation — each
    * partition folds into a constant-size counter grid, merges are
    * element-wise adds (order-independent, so the result is deterministic
    * for a fixed seed and corpus), and the driver holds kilobytes instead
    * of a key-cardinality hash map. Output follows q10/q224's
    * tolerance-boolean oracle shape: exact top-20 counts (DuckDB-matched)
    * plus two deterministic sketch guarantees — est ≥ true (CMS never
    * undercounts) and est ≤ true + ⌈eps·N⌉ (the width bound) — emitted as
    * booleans the oracle pins to TRUE. The estimates themselves are
    * engine-specific and stay out of the hashed columns.
    */
  def q234CountMinHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.lineitem(spark, dir).select(col("l_partkey"))
    val cms = keys.stat.countMinSketch(col("l_partkey"),
      eps = 0.001, confidence = 0.999, seed = 42)
    val n = cms.totalCount() // N from the sketch itself: no second scan
    val slack = math.ceil(0.001 * n).toLong
    val top = keys.groupBy(col("l_partkey")).agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("l_partkey")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.toSeq.map { case (k, t) =>
      val est = cms.estimateCount(java.lang.Long.valueOf(k))
      (k, t, est >= t, est <= t + slack)
    }.toDF("l_partkey", "true_n", "ge_true", "within_eps")
  }

  val q234Oracle: String =
    """SELECT l_partkey, CAST(count(*) AS BIGINT) AS true_n,
      |  TRUE AS ge_true, TRUE AS within_eps
      |FROM lineitem GROUP BY 1
      |ORDER BY true_n DESC, l_partkey LIMIT 20""".stripMargin

  /** Parameterized SQL (Spark 4 named parameter markers): the query text
    * carries `:lo` / `:hi` / `:status` placeholders and the values arrive
    * through `spark.sql(text, args)` — bound as literals by the PARSER, not
    * string-spliced, so the text is injection-safe and plan-cacheable while
    * the bound literals still drive predicate pushdown and partition
    * pruning exactly like inline constants (the prepared-statement surface
    * a reusable 100 TB report query wants). The oracle inlines the same
    * constants.
    */
  def q233ParamSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_pq")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders_pq
        |WHERE o_orderdate >= CAST(:lo AS DATE)
        |  AND o_orderdate < CAST(:hi AS DATE)
        |  AND o_orderstatus = :status
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("lo" -> "1996-01-01", "hi" -> "1997-01-01", "status" -> "O"))
  }

  val q233Oracle: String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       |  ${Det.dsumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderdate >= DATE '1996-01-01'
       |  AND o_orderdate < DATE '1997-01-01'
       |  AND o_orderstatus = 'O'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Spark 4 string collations: `COLLATE UTF8_LCASE` makes comparison,
    * `contains`, and DISTINCT case-insensitive at the TYPE level — the
    * engine-native form of the `lower()`-wrapping that ad-hoc SQL smears
    * over every predicate (and which blocks dictionary-encoded pushdown).
    * Facets per language: collated substring containment, collated equality
    * against a re-cased twin, and COUNT(DISTINCT) that collapses case
    * variants. The re-cased twin upper-cases only even doc_ids, so the same
    * source value circulates in BOTH cases and the ci/cs distinct counts
    * genuinely diverge — an engine that silently ignored UTF8_LCASE would
    * fail every facet, not just the containment one. The oracle lowers
    * explicitly — semantically identical for this ASCII corpus. Output
    * ordering stays on the binary-collated `lang` column so cross-engine
    * sort semantics never enter the hash.
    */
  def q236Collation(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_coll")
    spark.sql(
      """SELECT lang, count(*) AS n_docs,
        |  count_if(contains(text COLLATE UTF8_LCASE, 'ThE')) AS n_contains_the,
        |  count_if((CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
        |            COLLATE UTF8_LCASE) = source) AS n_src_ci_eq,
        |  count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
        |        COLLATE UTF8_LCASE) AS n_src_ci,
        |  count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
        |    AS n_src_cs
        |FROM docs_coll
        |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val q236Oracle: String =
    """WITH d AS (SELECT lang, text, source,
      |  CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src2
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN contains(lower(text), 'the') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contains_the,
      |  CAST(sum(CASE WHEN lower(src2) = lower(source) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_src_ci_eq,
      |  count(DISTINCT lower(src2)) AS n_src_ci,
      |  count(DISTINCT src2) AS n_src_cs
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** Spark 4 SQL UDFs (`CREATE FUNCTION … RETURN <expr>`): business logic
    * named once in the catalog and INLINED by the analyzer into the calling
    * plan — so unlike a Scala/Python UDF the body stays inside whole-stage
    * codegen and its predicates/projections keep pushing down (a black-box
    * UDF would fence both off). `graft_net_price` is the classic
    * discounted-price measure; `graft_qty_band` a CASE banding. The oracle
    * inlines the same bodies — which is exactly what Catalyst does.
    */
  def q238SqlUdf(spark: SparkSession, dir: String): DataFrame = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_price(p DOUBLE, d DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0d - d)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_qty_band(q DOUBLE)
        |RETURNS STRING RETURN CASE WHEN q < 10 THEN 'low'
        |  WHEN q < 30 THEN 'mid' ELSE 'high' END""".stripMargin)
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_udf")
    spark.sql(
      """SELECT graft_qty_band(l_quantity) AS band, count(*) AS n,
        |  CAST(sum(CAST(graft_net_price(l_extendedprice, l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS net_revenue
        |FROM lineitem_udf
        |WHERE graft_net_price(l_extendedprice, l_discount) > 1000.0d
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q238Oracle: String =
    s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
       |  WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
       |  count(*) AS n,
       |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS net_revenue
       |FROM lineitem
       |WHERE l_extendedprice * (1.0 - l_discount) > 1000.0
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q244

  /** Spark 4 SQL SCRIPTING (`BEGIN … END`, session variables, `WHILE`):
    * a data-dependent iterative search written entirely in SQL — find the
    * smallest quantity cutoff (stepping by 5) whose tail holds under 10% of
    * lineitem, then report the tail's count and decimal-exact revenue.
    *
    * Scale shape: lineitem is scanned ONCE, into a per-5-quantity-band
    * histogram cumulated from the top band down (row k holds the count and
    * decimal revenue of `l_quantity >= k` — cutoffs step by 5 from 1, and
    * band m covers quantities [1+5m, 5+5m], so every reachable cutoff is a
    * band edge). The ~10-row aggregate is localCheckpointed and the WHILE
    * iterates over THAT — k loop steps cost k tiny local lookups instead of
    * k full rescans of the fact table (the r5 shape), while the scripting
    * surface (DECLARE / SET with scalar subqueries / WHILE) is exercised
    * unchanged. Cumulative decimal sums are exact and associative, so the
    * banded revenue equals the direct filtered sum bit-for-bit. The oracle
    * replays the same search declaratively over a step series — identical
    * integers, identical Det-style sum.
    */
  def q244SqlScripting(spark: SparkSession, dir: String): DataFrame = {
    // Session-conf hygiene: scripting is only needed to PARSE the script
    // (the returned DataFrame re-executes plain queries), so restore the
    // previous value rather than leaking `enabled` into every later query
    // run on this shared session.
    val prev = spark.conf.getOption("spark.sql.scripting.enabled")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try {
      Tables.lineitem(spark, dir).createOrReplaceTempView("li_script")
      spark.sql(
        """SELECT CAST(1 + 5 * band AS INT) AS k,
          |  CAST(sum(c) OVER (ORDER BY band DESC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_ge,
          |  sum(rev) OVER (ORDER BY band DESC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_ge
          |FROM (SELECT floor((l_quantity - 1) / 5) AS band, count(*) AS c,
          |        sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
          |      FROM li_script GROUP BY 1)""".stripMargin)
        .localCheckpoint()
        .createOrReplaceTempView("li_cum")
      spark.sql(
        """BEGIN
          |  DECLARE n BIGINT DEFAULT 0;
          |  DECLARE c BIGINT DEFAULT 0;
          |  DECLARE cutoff INT DEFAULT 1;
          |  SET n = (SELECT c_ge FROM li_cum WHERE k = 1);
          |  SET c = (SELECT c_ge FROM li_cum WHERE k = cutoff);
          |  WHILE c * 10 >= n DO
          |    SET cutoff = cutoff + 5;
          |    SET c = (SELECT coalesce(
          |      (SELECT c_ge FROM li_cum WHERE k = cutoff), CAST(0 AS BIGINT)));
          |  END WHILE;
          |  SELECT cutoff AS cutoff,
          |    coalesce((SELECT c_ge FROM li_cum WHERE k = cutoff),
          |             CAST(0 AS BIGINT)) AS n_above,
          |    CAST(coalesce((SELECT rev_ge FROM li_cum WHERE k = cutoff),
          |                  CAST(0 AS DECIMAL(18,4))) AS DOUBLE) AS rev_above;
          |END""".stripMargin)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.scripting.enabled", v)
        case None    => spark.conf.unset("spark.sql.scripting.enabled")
      }
    }
  }

  val q244Oracle: String =
    s"""WITH n AS (SELECT count(*) AS n FROM lineitem),
       |steps AS (SELECT CAST(1 + 5 * range AS INT) AS k FROM range(0, 30)),
       |cnt AS (SELECT k,
       |  (SELECT count(*) FROM lineitem WHERE l_quantity >= k) AS c FROM steps),
       |sel AS (SELECT min(k) AS cutoff FROM cnt, n WHERE c * 10 < n.n)
       |SELECT cutoff,
       |  (SELECT count(*) FROM lineitem WHERE l_quantity >= cutoff) AS n_above,
       |  (SELECT ${Det.dsumSql("l_extendedprice")}
       |   FROM lineitem WHERE l_quantity >= cutoff) AS rev_above
       |FROM sel""".stripMargin

  // ---------------------------------------------------------------- q267

  /** Spark 4 datasketches frequent-items surface, driven through its full
    * DISTRIBUTED protocol: per-language partial sketches
    * (`approx_top_k_accumulate`), a combine stage (`approx_top_k_combine`),
    * and a final estimate — the shape a 1000-executor heavy-hitters job
    * actually runs (tiny mergeable partials, no re-scan), vs calling
    * `approx_top_k` once. The sketch is EXACT whenever distinct items fit
    * its tracking budget (vocab ≈45 ≪ 1024 here), so the oracle is the
    * exact count ranking; the result re-sorts by (count DESC, token) since
    * the sketch's own tie order within the top-k is unspecified, and k = 9
    * sits on a strict count gap at the verified scales (k = 10 would tie
    * across the boundary).
    */
  def q267ApproxTopK(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    toks.groupBy(col("lang"))
      .agg(expr("approx_top_k_accumulate(tok, 1024)").as("st"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(st), 9)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("tok"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  val q267Oracle: String =
    """SELECT tok, count(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 9""".stripMargin

  // ---------------------------------------------------------------- q268

  /** Theta-sketch set algebra (Spark 4 datasketches): distinct-supplier
    * SETS — not just counts — combined with union, intersection, and
    * difference entirely in sketch space. Two filtered sketches build in
    * ONE scan (conditional agg inputs); the set operators then run on the
    * tiny sketch blobs — the mergeable-summary pattern that answers
    * "how many suppliers serve both light and heavy lines?" at 100 TB
    * without a self-join. Exact while distinct keys fit the sketch's
    * nominal entries (suppliers ≤1000 ≪ 4096 across all tested scales), so
    * the oracle is exact set arithmetic.
    */
  def q268ThetaSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        expr("theta_sketch_agg(CASE WHEN l_quantity <= 25 THEN l_suppkey END)").as("sa"),
        expr("theta_sketch_agg(CASE WHEN l_quantity > 25 THEN l_suppkey END)").as("sb"))
      .select(
        expr("CAST(theta_sketch_estimate(sa) AS BIGINT)").as("n_light"),
        expr("CAST(theta_sketch_estimate(sb) AS BIGINT)").as("n_heavy"),
        expr("CAST(theta_sketch_estimate(theta_union(sa, sb)) AS BIGINT)").as("n_union"),
        expr("CAST(theta_sketch_estimate(theta_intersection(sa, sb)) AS BIGINT)").as("n_both"),
        expr("CAST(theta_sketch_estimate(theta_difference(sa, sb)) AS BIGINT)").as("n_light_only"))

  val q268Oracle: String =
    """SELECT
      |  count(DISTINCT CASE WHEN l_quantity <= 25 THEN l_suppkey END) AS n_light,
      |  count(DISTINCT CASE WHEN l_quantity > 25 THEN l_suppkey END) AS n_heavy,
      |  count(DISTINCT l_suppkey) AS n_union,
      |  CAST(count(DISTINCT CASE WHEN l_quantity <= 25 THEN l_suppkey END)
      |    + count(DISTINCT CASE WHEN l_quantity > 25 THEN l_suppkey END)
      |    - count(DISTINCT l_suppkey) AS BIGINT) AS n_both,
      |  CAST(count(DISTINCT l_suppkey)
      |    - count(DISTINCT CASE WHEN l_quantity > 25 THEN l_suppkey END) AS BIGINT)
      |    AS n_light_only
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q269

  /** Spark 4 dynamic SQL: `EXECUTE IMMEDIATE` runs a statement held in a
    * string with `USING` parameter binding, and `IDENTIFIER(:param)` turns a
    * bound VALUE into a table identifier safely (no string splicing — the
    * injection-proof way a metadata-driven pipeline dispatches one audited
    * query template across many tables). The template aggregates whichever
    * table the parameter names; the oracle runs the resolved query
    * directly, so the hash match proves the dynamic path binds and
    * resolves exactly.
    */
  def q269ExecuteImmediate(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_ei_src")
    spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT o_orderstatus AS status, count(*) AS n,
        |     min(o_orderkey) AS min_key,
        |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |   FROM IDENTIFIER(:tbl) WHERE o_orderkey % :m = 0
        |   GROUP BY o_orderstatus ORDER BY status'
        |  USING 'orders_ei_src' AS tbl, 4 AS m""".stripMargin)
  }

  val q269Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n, min(o_orderkey) AS min_key,
       |  ${Det.dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderkey % 4 = 0
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q274

  /** Custom table-valued function through the extensions API
    * ([[graft.functions.GraftBins]], injectTableFunction): the
    * `graft_bins(lo, hi, width)` spine LEFT-JOINs the price distribution so
    * EMPTY bins surface as zero rows — the property a groupBy(floor(p/w))
    * histogram can never give and the reason bin spines exist (the numeric
    * twin of q62's calendar spine). The TVF plans as Project-over-Range, so
    * it parallelizes like `range()`; the 7-row spine side broadcasts. The
    * oracle rebuilds the spine from DuckDB's range() generator.
    */
  def q274BinSpineTvf(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_bins_src")
    spark.sql(
      """SELECT b.bin_id, b.bin_lo, count(o_orderkey) AS n,
        |  CAST(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_bins(0, 700000, 100000) b
        |LEFT JOIN orders_bins_src
        |  ON o_totalprice >= b.bin_lo AND o_totalprice < b.bin_hi
        |GROUP BY b.bin_id, b.bin_lo
        |ORDER BY b.bin_id""".stripMargin)
  }

  val q274Oracle: String =
    s"""SELECT bin_id, bin_lo, count(o_orderkey) AS n,
       |  ${Det.dsumSql("coalesce(o_totalprice, 0.0)")} AS total
       |FROM (SELECT range AS bin_id, range * 100000 AS bin_lo,
       |        (range + 1) * 100000 AS bin_hi FROM range(0, 7)) b
       |LEFT JOIN orders ON o_totalprice >= bin_lo AND o_totalprice < bin_hi
       |GROUP BY bin_id, bin_lo ORDER BY bin_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q274_bin_spine_tvf", q274BinSpineTvf, q274Oracle),
    GraftQuery.sql("q294_sql_pivot", q294SqlPivot, q294Oracle),
    GraftQuery.sql("q269_execute_immediate", q269ExecuteImmediate, q269Oracle),
    GraftQuery.sql("q267_approx_topk", q267ApproxTopK, q267Oracle),
    GraftQuery.sql("q268_theta_sets", q268ThetaSets, q268Oracle),
    GraftQuery.sql("q51_stats_moments", q51StatsMoments, q51Oracle),
    GraftQuery.sql("q52_percentiles", q52Percentiles, q52Oracle),
    GraftQuery.sql("q53_scalar_subquery", q53ScalarSubquery, q53Oracle),
    GraftQuery.sql("q54_subquery_in", q54SubqueryIn, q54Oracle),
    GraftQuery.sql("q55_string_agg", q55StringAgg, q55Oracle),
    GraftQuery.sql("q56_map_funcs", q56MapFuncs, q56Oracle),
    GraftQuery.sql("q57_window_extras", q57WindowExtras, q57Oracle),
    GraftQuery.sql("q58_array_funcs", q58ArrayFuncs, q58Oracle),
    GraftQuery.sql("q75_latest_per_key", q75LatestPerKey, q75Oracle),
    GraftQuery.sql("q76_approx_quantile", q76ApproxQuantile, q76Oracle),
    GraftQuery.sql("q78_time_range_frame", q78TimeRangeFrame, q78Oracle),
    GraftQuery.sql("q79_unpivot", q79Unpivot, q79Oracle),
    GraftQuery.sql("q104_merge_upsert", q104MergeUpsert, q104Oracle),
    GraftQuery.sql("q105_winsorized_stats", q105WinsorizedStats, q105Oracle),
    GraftQuery.sql("q148_share_of_day", q148ShareOfDay, q148Oracle),
    GraftQuery.sql("q162_mode_per_group", q162ModePerGroup, q162Oracle),
    GraftQuery.sql("q222_recursive_cte", q222RecursiveCte, q222Oracle),
    GraftQuery.sql("q223_pipe_syntax", q223PipeSyntax, q223Oracle),
    GraftQuery.sql("q224_hll_merge", q224HllMerge, q224Oracle),
    GraftQuery.sql("q225_variant_extract", q225VariantExtract, q225Oracle),
    GraftQuery.sql("q233_param_sql", q233ParamSql, q233Oracle),
    GraftQuery.sql("q234_count_min", q234CountMinHeavyHitters, q234Oracle),
    GraftQuery.sql("q236_collation", q236Collation, q236Oracle),
    GraftQuery.sql("q238_sql_udf", q238SqlUdf, q238Oracle),
    GraftQuery.sql("q244_sql_scripting", q244SqlScripting, q244Oracle)
  )

  /** Event-time RANGE frame: per-user rolling 1-hour event count and sum —
    * the time-series "sliding aggregate" where the frame is defined by a
    * time interval, not a row count. RANGE frames are tie-insensitive
    * (peers share a frame), so the output is deterministic without a unique
    * order key.
    */
  def q78TimeRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_trf")
    spark.sql(
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS cnt_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM events_trf
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  val q78Oracle: String =
    s"""SELECT event_id, user_id, ts,
       |  count(*) OVER w AS cnt_1h,
       |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
       |FROM (${Det.EventsSql})
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts
       |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** SQL `PIVOT` clause (the parser surface — q49 covers the Dataset
    * `.pivot()` API): order counts and exact decimal revenue rotated into
    * one column pair per order status, keyed by priority. Spark plans the
    * clause as the same two-phase pivot aggregation as the API (partial
    * per-status maps, final merge — one shuffle on the groupBy key, the
    * static IN list keeps the schema fixed at plan time, which is what
    * makes pivot scale: no second pass to discover columns). The oracle
    * spells the rotation as CASE aggregates — DuckDB's PIVOT is a
    * different dialect, and CASE is the portable core both reduce to.
    */
  def q294SqlPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_pv_src")
    spark.sql(
      """SELECT prio, F_n, F_total, O_n, O_total, P_n, P_total
        |FROM (SELECT o_orderpriority AS prio, o_orderstatus AS status,
        |        CAST(o_totalprice AS DECIMAL(18,4)) AS price
        |      FROM orders_pv_src)
        |PIVOT (count(price) AS n, CAST(sum(price) AS DOUBLE) AS total
        |       FOR status IN ('F' AS F, 'O' AS O, 'P' AS P))
        |ORDER BY prio""".stripMargin)
  }

  val q294Oracle: String =
    """SELECT o_orderpriority AS prio,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F_total,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O_total,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P_total
      |FROM orders
      |GROUP BY o_orderpriority ORDER BY prio""".stripMargin

  /** UNPIVOT (wide → long): part attributes melted into (attr, val) rows via
    * the Dataset unpivot API; the oracle is the dialect-neutral UNION ALL
    * formulation.
    */
  def q79Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retail"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")), "attr", "val")
      .orderBy(col("p_partkey"), col("attr"))

  val q79Oracle: String =
    """SELECT p_partkey, attr, val FROM (
      |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'retail' AS attr, p_retailprice AS val FROM part)
      |ORDER BY p_partkey, attr""".stripMargin

  /** MERGE-style upsert apply (the row-level semantics of Delta/Iceberg
    * `MERGE INTO`): a change batch (per-customer 1995 order totals) applies
    * onto the customer base — matched keys UPDATE (balance += delta),
    * unmatched change keys INSERT (synthetic new accounts), untouched base
    * rows pass through. Emits per-action counts + an exact-decimal balance
    * checksum so every row's routing is verified.
    *
    * Scale shape: one shuffle join base⋈batch on the merge key (broadcast
    * when the batch is small — here AQE decides), inserts are map-only, and
    * the apply is a unionByName — the same row-level plan a table format's
    * MERGE produces after file pruning. The `+` on matched balances is a
    * single IEEE add; the checksum re-sums in decimal (order-independent).
    */
  def q104MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val deltas = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_custkey")).agg(Det.dsum(col("o_totalprice")).as("delta"))
    val merged = Tables.customer(spark, dir)
      .join(deltas, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        (col("c_acctbal") + coalesce(col("delta"), lit(0.0))).as("new_bal"),
        when(col("delta").isNotNull, lit("update")).otherwise(lit("keep")).as("action"))
    val inserts = deltas.where(col("o_custkey") % 10 === 3)
      .select((col("o_custkey") + 1000000L).as("c_custkey"),
        col("delta").as("new_bal"), lit("insert").as("action"))
    merged.unionByName(inserts)
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_rows"), Det.dsum(col("new_bal")).as("bal_sum"))
      .orderBy(col("action"))
  }

  val q104Oracle: String =
    s"""WITH deltas AS (
       |  SELECT o_custkey, ${Det.dsumSql("o_totalprice")} AS delta
       |  FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY o_custkey),
       |merged AS (
       |  SELECT c_custkey, c_acctbal + coalesce(delta, 0.0) AS new_bal,
       |    CASE WHEN delta IS NOT NULL THEN 'update' ELSE 'keep' END AS action
       |  FROM customer LEFT JOIN deltas ON c_custkey = o_custkey
       |  UNION ALL
       |  SELECT o_custkey + 1000000, delta, 'insert' FROM deltas
       |  WHERE o_custkey % 10 = 3)
       |SELECT action, count(*) AS n_rows, ${Det.dsumSql("new_bal")} AS bal_sum
       |FROM merged GROUP BY action ORDER BY action""".stripMargin

  /** Winsorized (clamped-tail) robust stats per stratum: per-language p05/p95
    * bounds on document length by DISCRETE percentile — the value at rank
    * ceil(q·n) in (n_chars, doc_id) order, so both engines pick the identical
    * element with no interpolation arithmetic — then clamp every doc into the
    * bounds and report clamp counts + the winsorized sum (exact integers).
    *
    * Scale shape: one shuffle on the stratum key feeds both window passes;
    * the per-stratum bounds table is tiny and broadcasts back onto the scan.
    * Exact rank-k per stratum serializes each stratum through one reducer —
    * at 100 TB swap in approx_percentile (q76's sketch) for the bounds and
    * keep the clamp/aggregate unchanged.
    */
  def q105WinsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_wz")
    spark.sql(
      """WITH ranked AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM docs_wz),
        |bounds AS (
        |  SELECT lang,
        |    max(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
        |        THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |        THEN n_chars END) AS hi,
        |    max(n) AS n
        |  FROM ranked GROUP BY lang)
        |SELECT r.lang, b.n, b.lo, b.hi,
        |  sum(CASE WHEN r.n_chars < b.lo THEN 1 ELSE 0 END) AS n_clamped_low,
        |  sum(CASE WHEN r.n_chars > b.hi THEN 1 ELSE 0 END) AS n_clamped_high,
        |  sum(least(greatest(r.n_chars, b.lo), b.hi)) AS winsorized_sum
        |FROM ranked r JOIN bounds b ON r.lang = b.lang
        |GROUP BY r.lang, b.n, b.lo, b.hi
        |ORDER BY r.lang""".stripMargin)
  }

  val q105Oracle: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |bounds AS (
      |  SELECT lang,
      |    max(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
      |        THEN n_chars END) AS lo,
      |    max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
      |        THEN n_chars END) AS hi,
      |    max(n) AS n
      |  FROM ranked GROUP BY lang)
      |SELECT r.lang, b.n, b.lo, b.hi,
      |  CAST(sum(CASE WHEN r.n_chars < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
      |  CAST(sum(CASE WHEN r.n_chars > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
      |  CAST(sum(least(greatest(r.n_chars, b.lo), b.hi)) AS BIGINT) AS winsorized_sum
      |FROM ranked r JOIN bounds b ON r.lang = b.lang
      |GROUP BY r.lang, b.n, b.lo, b.hi
      |ORDER BY r.lang""".stripMargin
}
