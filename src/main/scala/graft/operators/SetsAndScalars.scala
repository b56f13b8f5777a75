package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Set operators and the scalar-function sweep (string / date / math /
  * conditional / array HOF / JSON). All built-ins — codegen'd, pushdown-safe.
  */
object SetsAndScalars {

  /** Distinct set algebra: (A ∪ B) ∩ C − D over customer keys. */
  def q18SetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val a = orders.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
    val b = orders.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val c = orders.where(col("o_totalprice") > 50000).select(col("o_custkey").as("custkey"))
    val d = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    a.union(b).distinct().intersect(c).except(d).orderBy(col("custkey"))
  }

  val q18Oracle: String =
    """SELECT custkey FROM (
      |  SELECT custkey FROM (
      |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |    UNION
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY custkey""".stripMargin

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL), multiplicities
    * surfaced as grouped counts; branches combined with unionByName.
    */
  def q19SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val a = li.where(col("l_quantity") < 10).select(col("l_linenumber").as("v"))
    val b = li.where(col("l_discount") >= 0.05).select(col("l_linenumber").as("v"))
    val inter = a.intersectAll(b).groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("op", lit("intersect_all"))
    val exc = a.exceptAll(b).groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("op", lit("except_all"))
    inter.unionByName(exc).select("op", "v", "cnt").orderBy("op", "v")
  }

  val q19Oracle: String =
    """SELECT 'intersect_all' AS op, v, count(*) AS cnt FROM (
      |  SELECT l_linenumber AS v FROM lineitem WHERE l_quantity < 10
      |  INTERSECT ALL
      |  SELECT l_linenumber FROM lineitem WHERE l_discount >= 0.05) GROUP BY v
      |UNION ALL
      |SELECT 'except_all' AS op, v, count(*) AS cnt FROM (
      |  SELECT l_linenumber AS v FROM lineitem WHERE l_quantity < 10
      |  EXCEPT ALL
      |  SELECT l_linenumber FROM lineitem WHERE l_discount >= 0.05) GROUP BY v
      |ORDER BY op, v""".stripMargin

  /** String-function sweep on part. */
  def q20StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("brand_dist"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
        size(split(col("p_type"), " ")).as("type_words"))
      .orderBy(col("p_partkey"))

  val q20Oracle: String =
    """SELECT p_partkey, upper(p_name) AS name_upper, substr(p_name, 1, 10) AS name_prefix,
      |  length(p_name) AS name_len, replace(p_type, ' ', '_') AS type_snake,
      |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      |  levenshtein(p_brand, 'Brand#13') AS brand_dist,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
      |  len(string_split(p_type, ' ')) AS type_words
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time-function sweep on orders (UTC everywhere). */
  def q21DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-06-17").cast("timestamp")).as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy(col("o_orderkey"))

  val q21Oracle: String =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
      |  dayofweek(o_orderdate) + 1 AS dow,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  datediff('day', TIMESTAMP '1995-06-17 00:00:00', o_orderdate) AS days_since,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(o_orderdate) AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math + conditional sweep on lineitem (IEEE-exact ops only: abs, ceil,
    * floor, sqrt, mod; no libm-dependent pow/exp).
    */
  def q22MathCase(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("qty_band"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q22Oracle: String =
    """SELECT l_orderkey, l_linenumber, abs(l_quantity - 25) AS qty_dev,
      |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
      |  sqrt(l_quantity) AS qty_sqrt, l_linenumber % 3 AS ln_mod3,
      |  greatest(l_tax, l_discount) AS max_rate, least(l_tax, l_discount) AS min_rate,
      |  CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid'
      |       ELSE 'high' END AS qty_band
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Array higher-order functions over embeddings: size, filter-count,
    * order-independent element sum, max element.
    */
  def q23ArrayHof(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .selectExpr(
        "vec_id",
        "size(embedding) AS dim",
        "size(filter(embedding, x -> x > 0)) AS pos_cnt",
        s"${Det.arrSumExpr("embedding")} AS elem_sum",
        "array_max(embedding) AS elem_max")
      .orderBy(col("vec_id"))

  val q23Oracle: String =
    s"""SELECT vec_id, len(embedding) AS dim,
       |  len(list_filter(embedding, x -> x > 0)) AS pos_cnt,
       |  ${Det.arrSumSql("embedding")} AS elem_sum,
       |  list_max(embedding) AS elem_max
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** JSON extraction from events.props via both get_json_object and a typed
    * from_json map, aggregated per event type.
    */
  def q24JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k2", from_json(col("props"), lit("map<string,int>")).getItem("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"),
        sum(col("k2")).as("sum_k2"))
      .orderBy(col("event_type"))

  val q24Oracle: String =
    """SELECT event_type, count(*) AS cnt,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k2
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** explode/unnest: per-label element stats over flattened embeddings. */
  def q25ExplodeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), explode(col("embedding")).as("u"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("elem_cnt"),
        min(col("u")).as("min_val"),
        max(col("u")).as("max_val"))
      .orderBy(col("label"))

  val q25Oracle: String =
    """SELECT label, count(*) AS elem_cnt, min(u) AS min_val, max(u) AS max_val
      |FROM (SELECT label, unnest(embedding) AS u FROM embeddings)
      |GROUP BY label ORDER BY label""".stripMargin

  /** Generator (UDTF-surface) sweep: `stack` (wide→long literal pivot),
    * `posexplode_outer` (position-preserving unnest that emits a NULL row
    * for an empty array instead of dropping the parent — exercised here
    * with genuinely empty arrays), and `inline` (explode of an array of
    * structs), unified under one (src, pos, k, v) long schema. These cover
    * the generator rung of the UDF ladder (SURVEY §2b): every lateral-view
    * shape a user would otherwise reach for a custom Generator to get.
    * All three are map-side row expansions — no shuffle at any scale.
    */
  def q117GeneratorSweep(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).where(col("p_partkey") < 100)
    val stacked = part.selectExpr("p_partkey",
        "stack(2, 'brand', p_brand, 'type', p_type) AS (k, v)")
      .select(col("p_partkey"), lit("stack").as("src"),
        lit(null).cast("long").as("pos"), col("k"), col("v"))
    // First (p_size % 3) name words: empty for p_size % 3 == 0 → the OUTER row.
    val posed = part
      .withColumn("words", expr("slice(split(p_name, ' '), 1, p_size % 3)"))
      .select(col("p_partkey"), posexplode_outer(col("words")).as(Seq("pos", "w")))
      .select(col("p_partkey"), lit("words").as("src"),
        col("pos").cast("long").as("pos"), lit(null).cast("string").as("k"),
        col("w").as("v"))
    val inlined = part
      .selectExpr("p_partkey",
        "inline(transform(sequence(1, 2), i -> " +
          "named_struct('k', concat('s', i), 'v', substring(p_type, i, 3))))")
      .select(col("p_partkey"), lit("inline").as("src"),
        lit(null).cast("long").as("pos"), col("k"), col("v"))
    stacked.unionByName(posed).unionByName(inlined)
      .orderBy(col("p_partkey"), col("src"),
        coalesce(col("pos"), lit(-1L)), coalesce(col("k"), lit("")),
        coalesce(col("v"), lit("")))
  }

  val q117Oracle: String =
    """WITH p AS (SELECT * FROM part WHERE p_partkey < 100),
      |stacked AS (
      |  SELECT p_partkey, 'stack' AS src, CAST(NULL AS BIGINT) AS pos, 'brand' AS k, p_brand AS v FROM p
      |  UNION ALL
      |  SELECT p_partkey, 'stack', NULL, 'type', p_type FROM p),
      |posed AS (
      |  SELECT p_partkey, 'words' AS src, s.pos, CAST(NULL AS VARCHAR) AS k, s.w AS v
      |  FROM (
      |    SELECT p_partkey,
      |      unnest(CASE WHEN len(words) = 0
      |                  THEN [{'pos': CAST(NULL AS BIGINT), 'w': CAST(NULL AS VARCHAR)}]
      |                  ELSE [{'pos': CAST(i - 1 AS BIGINT), 'w': words[i]}
      |                        for i in range(1, len(words) + 1)] END) AS s
      |    FROM (SELECT p_partkey, string_split(p_name, ' ')[1:(p_size % 3)] AS words FROM p))),
      |inlined AS (
      |  SELECT p_partkey, 'inline' AS src, CAST(NULL AS BIGINT) AS pos,
      |    concat('s', i) AS k, substr(p_type, i, 3) AS v
      |  FROM p, (SELECT unnest(generate_series(1, 2)) AS i) gi)
      |SELECT p_partkey, src, pos, k, v
      |FROM (SELECT * FROM stacked UNION ALL SELECT * FROM posed
      |      UNION ALL SELECT * FROM inlined)
      |ORDER BY p_partkey, src, coalesce(pos, -1), coalesce(k, ''), coalesce(v, '')""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q18_set_ops", q18SetOps, q18Oracle),
    GraftQuery.sql("q19_set_ops_all", q19SetOpsAll, q19Oracle),
    GraftQuery.sql("q20_string_funcs", q20StringFuncs, q20Oracle),
    GraftQuery.sql("q21_date_funcs", q21DateFuncs, q21Oracle),
    GraftQuery.sql("q22_math_case", q22MathCase, q22Oracle),
    GraftQuery.sql("q23_array_hof", q23ArrayHof, q23Oracle),
    GraftQuery.sql("q24_json_extract", q24JsonExtract, q24Oracle),
    GraftQuery.sql("q25_explode_stats", q25ExplodeStats, q25Oracle),
    GraftQuery.sql("q117_generator_sweep", q117GeneratorSweep, q117Oracle)
  )
}
