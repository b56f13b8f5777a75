package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Feature-preparation operators for ML training pipelines: quantile banding
  * (ntile), per-group top-n via SQL LATERAL join, leave-one-out target
  * encoding, and deterministic weighted sampling.
  *
  * Scale shapes: every operator here is one shuffle on a grouping key plus
  * window evaluation (ntile/row_number stream through `WindowExec` without
  * materializing a group), or a broadcast of a tiny dim (q197's nation side).
  * No collect, no cartesian products, no RNG state — sampling keys are pure
  * per-row integer arithmetic, so executors decide membership independently,
  * which is exactly what a 1000-executor cluster needs.
  */
object FeaturePrep {

  // ---------------------------------------------------------------- q196

  /** Quantile banding (the classic feature-binning step): ntile(4) over each
    * market segment ordered by (acctbal, custkey) — the unique tie-break makes
    * band assignment deterministic — then per-band row count and exact decimal
    * balance mass. One shuffle on the segment key; ntile streams per
    * partition.
    */
  def q196NtileBands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("band", ntile(4).over(w))
      .groupBy(col("c_mktsegment").as("seg"), col("band"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("c_acctbal")).as("bal_sum"))
      .orderBy(col("seg"), col("band"))
  }

  val q196Oracle: String =
    s"""WITH b AS (
       |  SELECT c_mktsegment AS seg, c_acctbal,
       |         ntile(4) OVER (PARTITION BY c_mktsegment
       |                        ORDER BY c_acctbal, c_custkey) AS band
       |  FROM customer)
       |SELECT seg, band, count(*) AS n, ${Det.dsumSql("c_acctbal")} AS bal_sum
       |FROM b GROUP BY seg, band ORDER BY seg, band""".stripMargin

  // ---------------------------------------------------------------- q197

  /** Per-group top-n through the SQL LATERAL correlated-subquery surface:
    * for every nation, its two highest-balance customers. Catalyst
    * decorrelates the LIMIT-ed lateral subquery into a ranked window join —
    * the same physical plan a hand-written row_number() query gets — so the
    * declarative form costs nothing at scale (one shuffle on the correlation
    * key; nation is broadcast).
    */
  def q197LateralTopn(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_lat")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lat")
    spark.sql(
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation_lat JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer_lat
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
  }

  val q197Oracle: String =
    """SELECT n_name, t.c_custkey, t.c_acctbal
      |FROM nation JOIN LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t ON true
      |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q198

  /** Leave-one-out target encoding (the standard leakage-free categorical
    * encoder): each customer's segment is encoded as the mean balance of all
    * OTHER customers in that segment. Exact decimal window sum minus the row's
    * own decimal value, then one IEEE division by (n-1) — bit-identical in
    * both engines. One shuffle on the category key; the window aggregate is a
    * single-pass partial sum, nothing is materialized per group.
    */
  def q198LooEncode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
    Tables.customer(spark, dir)
      .withColumn("bal_dec", col("c_acctbal").cast("decimal(18,4)"))
      .withColumn("loo_mean",
        (sum(col("bal_dec")).over(w) - col("bal_dec")).cast("double") /
          nullif(count(lit(1)).over(w) - lit(1), lit(0)))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"), col("loo_mean"))
      .orderBy(col("c_custkey"))
  }

  val q198Oracle: String =
    """SELECT c_custkey, c_mktsegment AS seg,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) OVER (PARTITION BY c_mktsegment)
      |       - CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE)
      |    / nullif(count(*) OVER (PARTITION BY c_mktsegment) - 1, 0) AS loo_mean
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q199

  /** Deterministic weighted sampling: five documents per source, selection
    * pressure proportional to document length. Each row's sort key is
    * multiplicative-hash(doc_id) / n_chars — pure integer arithmetic widened
    * to an exact IEEE division (hash < 2^32 and n_chars < 2^53 are both
    * double-exact) — so longer documents draw systematically smaller keys and
    * the per-source row_number top-5 is a weighted sample both engines agree
    * on bit-for-bit. The scale substitute for RNG reservoir sampling: no
    * state, no coordination, rerun-stable.
    */
  def q199WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("skey",
        expr("CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / CAST(n_chars AS DOUBLE)"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("source"), col("doc_id"), col("n_chars"), col("skey"))
      .orderBy(col("source"), col("skey"), col("doc_id"))
  }

  val q199Oracle: String =
    """WITH k AS (
      |  SELECT source, doc_id, n_chars,
      |         CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
      |           / CAST(n_chars AS DOUBLE) AS skey
      |  FROM documents)
      |SELECT source, doc_id, n_chars, skey FROM (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
      |  FROM k) WHERE rn <= 5
      |ORDER BY source, skey, doc_id""".stripMargin

  // ---------------------------------------------------------------- q201

  /** Pairwise audience overlap (segment co-occurrence): Jaccard similarity
    * between the high-value user audiences of every event-type pair. The
    * audience table is first deduplicated to distinct (type, user), so the
    * pair join is per-user over a handful of types — candidate volume is
    * Σ_u |types(u)|², bounded by the type-universe size, never |users|².
    * Intersection over union is one exact integer division.
    */
  def q201AudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val aud = Tables.events(spark, dir)
      .where(col("value") > 180)
      .select(col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val pairs = aud.as("x").join(aud.as("y"),
        col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("ta"), col("y.t").as("tb"))
      .agg(count(lit(1)).as("inter"))
    val sizes = aud.groupBy(col("t")).agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.as("ca"), col("ta") === col("ca.t"))
      .join(sizes.as("cb"), col("tb") === col("cb.t"))
      .select(col("ta"), col("tb"), col("inter"),
        col("ca.n").as("na"), col("cb.n").as("nb"),
        (col("inter").cast("double") / (col("ca.n") + col("cb.n") - col("inter"))).as("jac"))
      .orderBy(col("ta"), col("tb"))
  }

  val q201Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |a AS (SELECT DISTINCT event_type AS t, user_id AS u FROM e WHERE value > 180),
       |p AS (SELECT x.t AS ta, y.t AS tb, count(*) AS inter
       |      FROM a x JOIN a y ON x.u = y.u AND x.t < y.t GROUP BY 1, 2),
       |c AS (SELECT t, count(*) AS n FROM a GROUP BY 1)
       |SELECT ta, tb, inter, ca.n AS na, cb.n AS nb,
       |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jac
       |FROM p JOIN c ca ON ta = ca.t JOIN c cb ON tb = cb.t
       |ORDER BY ta, tb""".stripMargin

  // ---------------------------------------------------------------- q202

  /** Quantile normalization (the bioinformatics/feature-scaling classic):
    * each value is replaced by the global-distribution value at the same
    * quantile position within its group. Ranks are integers, the target
    * global rank is one exact integer division (nearest-integer of
    * (r-1)·(N-1)/(n-1)), and the mapping is an equi-join on rank — two
    * window shuffles plus one join, no floats until the copied output value.
    * The global-rank window is single-partition here (exact, oracle-matched);
    * at 100 TB the q160 two-phase pattern (per-partition histograms, then
    * offset-corrected local ranks) computes the same grank with one extra
    * map-side pass instead of a global sort partition.
    */
  def q202QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("event_type"), col("value"))
    val wg = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val wn = Window.partitionBy(col("event_type"))
    val wall = Window.orderBy(col("value"), col("event_id"))
    val ranked = e
      .withColumn("r", row_number().over(wg).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("big_n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("tgt",
        expr("(2*(r-1)*(big_n-1) + (n-1)) div (2*(n-1)) + 1"))
    val global = e
      .withColumn("grank", row_number().over(wall).cast("long"))
      .select(col("grank"), col("value").as("norm_value"))
    ranked.join(global, col("tgt") === col("grank"))
      .select(col("event_id"), col("event_type"), col("value"), col("norm_value"))
      .orderBy(col("event_id"))
  }

  val q202Oracle: String =
    s"""WITH e AS (SELECT event_id, event_type, value FROM events),
       |g AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
       |                     ORDER BY value, event_id) AS BIGINT) AS r,
       |             count(*) OVER (PARTITION BY event_type) AS n,
       |             count(*) OVER () AS big_n
       |      FROM e),
       |gl AS (SELECT value AS norm_value,
       |              CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS grank
       |       FROM e),
       |m AS (SELECT event_id, event_type, value,
       |        (2*(r-1)*(big_n-1) + (n-1)) // (2*(n-1)) + 1 AS tgt FROM g)
       |SELECT m.event_id, m.event_type, m.value, gl.norm_value
       |FROM m JOIN gl ON m.tgt = gl.grank ORDER BY m.event_id""".stripMargin

  // ---------------------------------------------------------------- q203

  /** Deterministic negative sampling for training pairs: for every user, up
    * to two event types they did NOT engage with at high value, drawn by a
    * per-(user, i) multiplicative hash over the type universe and anti-joined
    * against the positives. Every stage is hash arithmetic + equi-joins —
    * executors sample independently with no RNG state, rerun-stable, and the
    * positives anti-join is the same shape at any scale.
    */
  def q203NegativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val pos = events.where(col("value") > 150)
      .select(col("user_id"), col("event_type")).distinct()
    val types = events.select(col("event_type")).distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy(col("event_type"))).cast("long") - 1)
    val users = events.select(col("user_id")).distinct()
    val cand = users
      .select(col("user_id"), explode(expr("sequence(0L, 5L)")).as("i"))
      .withColumn("tidx", expr("((user_id * 2654435761 + i * 40503) % 4294967296) % 5"))
      .join(broadcast(types), col("tidx") === col("idx"))
      .select(col("user_id"), col("i"), col("event_type").as("neg_type"))
    val negs = cand.join(pos,
        cand("user_id") === pos("user_id") && cand("neg_type") === pos("event_type"),
        "left_anti")
    negs
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("user_id")).orderBy(col("i"))))
      .where(col("rn") <= 2)
      .select(col("user_id"), col("neg_type"), col("i"))
      .orderBy(col("user_id"), col("i"))
  }

  val q203Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |pos AS (SELECT DISTINCT user_id, event_type FROM e WHERE value > 150),
       |t AS (SELECT event_type, CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
       |      FROM (SELECT DISTINCT event_type FROM e)),
       |u AS (SELECT DISTINCT user_id FROM e),
       |cand AS (SELECT u.user_id, i.i,
       |           ((u.user_id * 2654435761 + i.i * 40503) % 4294967296) % 5 AS tidx
       |         FROM u, (SELECT unnest(generate_series(0, 5)) AS i) i),
       |c2 AS (SELECT cand.user_id, cand.i, t.event_type AS neg_type
       |       FROM cand JOIN t ON cand.tidx = t.idx),
       |filt AS (SELECT c2.* FROM c2
       |         ANTI JOIN pos ON c2.user_id = pos.user_id AND c2.neg_type = pos.event_type),
       |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY i) AS rn FROM filt)
       |SELECT user_id, neg_type, i FROM r WHERE rn <= 2
       |ORDER BY user_id, i""".stripMargin

  // ---------------------------------------------------------------- q217

  /** Feature assembly — the feature-store join that fans three sources into
    * one wide training row per customer: account balance (dim), lifetime
    * spend (kilo-dollar units — finer quantizations push (Σx)² and n·Σx² past int64 as the corpus grows) and order count (orders agg), and event count (behavioral agg,
    * user_id ≡ custkey in this corpus), each z-standardized against the
    * population. Every moment is an exact 64-bit integer sum over cent-
    * quantized values (⌊x·100⌋ — IEEE multiply+floor, bit-identical), so
    * μ and σ are IEEE expressions over exact inputs and the z-scores match
    * across engines bit for bit. Shape: two aggregations, three left joins
    * on the entity key, one broadcast 1-row stats frame — the canonical
    * entity-centric assembly at any scale.
    */
  def q217FeatureAssembly(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), floor(col("c_acctbal") * 100).cast("long").as("bal"))
    val ords = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") / 1000).cast("long")).as("spend"))
    val evs = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val base = cust
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .join(evs, col("c_custkey") === col("user_id"), "left")
      .select(col("c_custkey"), col("bal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0L)).as("spend"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
    def moments(c: String) = Seq(
      sum(col(c)).as(s"s_$c"), sum(col(c) * col(c)).as(s"q_$c"))
    val stats = base.agg(count(lit(1)).as("n"),
      moments("bal") ++ moments("n_orders") ++ moments("spend") ++ moments("n_events"): _*)
    def z(c: String) =
      ((col(c) * col("n") - col(s"s_$c")).cast("double") / col("n") /
        sqrt((col("n") * col(s"q_$c") - col(s"s_$c") * col(s"s_$c")).cast("double") /
          (col("n") * (col("n") - 1)))).as(s"z_$c")
    base.crossJoin(broadcast(stats))
      .select(col("c_custkey"), z("bal"), z("n_orders"), z("spend"), z("n_events"))
      .orderBy(col("c_custkey"))
  }

  val q217Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |cust AS (SELECT c_custkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
       |ords AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       |           CAST(sum(CAST(floor(o_totalprice / 1000) AS BIGINT)) AS BIGINT) AS spend
       |         FROM orders GROUP BY 1),
       |evs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY 1),
       |base AS (
       |  SELECT c_custkey, bal,
       |    coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0) AS spend,
       |    coalesce(n_events, 0) AS n_events
       |  FROM cust LEFT JOIN ords ON c_custkey = o_custkey
       |            LEFT JOIN evs ON c_custkey = user_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(bal) AS BIGINT) AS s_bal, CAST(sum(bal*bal) AS BIGINT) AS q_bal,
       |    CAST(sum(n_orders) AS BIGINT) AS s_n_orders, CAST(sum(n_orders*n_orders) AS BIGINT) AS q_n_orders,
       |    CAST(sum(spend) AS BIGINT) AS s_spend, CAST(sum(spend*spend) AS BIGINT) AS q_spend,
       |    CAST(sum(n_events) AS BIGINT) AS s_n_events, CAST(sum(n_events*n_events) AS BIGINT) AS q_n_events
       |  FROM base)
       |SELECT c_custkey,
       |  CAST(bal * n - s_bal AS DOUBLE) / n / sqrt(CAST(n * q_bal - s_bal * s_bal AS DOUBLE) / (n * (n - 1))) AS z_bal,
       |  CAST(n_orders * n - s_n_orders AS DOUBLE) / n / sqrt(CAST(n * q_n_orders - s_n_orders * s_n_orders AS DOUBLE) / (n * (n - 1))) AS z_n_orders,
       |  CAST(spend * n - s_spend AS DOUBLE) / n / sqrt(CAST(n * q_spend - s_spend * s_spend AS DOUBLE) / (n * (n - 1))) AS z_spend,
       |  CAST(n_events * n - s_n_events AS DOUBLE) / n / sqrt(CAST(n * q_n_events - s_n_events * s_n_events AS DOUBLE) / (n * (n - 1))) AS z_n_events
       |FROM base CROSS JOIN stats ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q229

  /** Calibration curve (reliability diagram): events ntile'd into score
    * deciles by `value`, each decile reporting observed positive rate
    * (purchase share) — the model-eval primitive that answers "does the
    * score mean what it claims". The ntile order carries the event_id
    * tiebreak so equal scores land deterministically; positives and cent
    * sums are exact integers; the rate is one IEEE division. One global
    * sort for the decile split (at 100 TB: pre-bucket by approx quantile
    * boundaries, q127's equidepth shape) and one tiny aggregation.
    */
  def q229Calibration(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir).select(
      ntile(10).over(Window.orderBy(col("value"), col("event_id"))).as("decile"),
      round(col("value") * 100).cast("long").as("vc"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("positives"),
        (sum(col("y")).cast("double") / count(lit(1))).as("rate"),
        sum(col("vc")).as("sum_cents"))
      .orderBy(col("decile"))
  }

  val q229Oracle: String =
    s"""WITH d AS (
       |  SELECT ntile(10) OVER (ORDER BY value, event_id) AS decile,
       |    CAST(round(value*100) AS BIGINT) AS vc,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM (${graft.operators.Det.EventsSql}))
       |SELECT decile, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS positives,
       |  CAST(sum(y) AS DOUBLE)/count(*) AS rate,
       |  CAST(sum(vc) AS BIGINT) AS sum_cents
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q229_calibration", q229Calibration, q229Oracle),
    GraftQuery.sql("q196_ntile_bands", q196NtileBands, q196Oracle),
    GraftQuery.sql("q197_lateral_topn", q197LateralTopn, q197Oracle),
    GraftQuery.sql("q198_loo_encode", q198LooEncode, q198Oracle),
    GraftQuery.sql("q199_weighted_sample", q199WeightedSample, q199Oracle),
    GraftQuery.sql("q201_audience_overlap", q201AudienceOverlap, q201Oracle),
    GraftQuery.sql("q202_quantile_normalize", q202QuantileNormalize, q202Oracle),
    GraftQuery.sql("q203_negative_sampling", q203NegativeSampling, q203Oracle),
    GraftQuery.sql("q217_feature_assembly", q217FeatureAssembly, q217Oracle))
}
