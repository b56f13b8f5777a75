package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Event-time operators — batch-emulated Structured Streaming semantics over
  * the events table (tumbling / sliding / session windows, watermark late-data
  * drop, windowed dedup) plus an as-of join. The true streaming forms live in
  * [[graft.streaming.StreamingOps]]; these batch twins are the
  * oracle-checkable surface.
  *
  * All event-time arithmetic happens on µs-truncated timestamps (see
  * Tables.events); every oracle uses `CAST(ts AS TIMESTAMP)` so both engines
  * bucket the identical value. Window starts are epoch-aligned on both sides.
  */
object EventOps {

  /** As-of join: for each purchase event, the latest click by the same user
    * at or before it. LINEAR in events: clicks and purchases flow through ONE
    * per-user event-time window and each purchase picks up the running
    * `last(click, ignoreNulls)` — no click×purchase join, so a hot user with
    * 10k clicks and 1k purchases costs 11k window rows, not 10M join pairs.
    * At 100 TB this is a single hash-partition-by-user shuffle + sort, the
    * same shape Structured Streaming's mapGroupsWithState as-of would take.
    *
    * Ordering encodes the as-of tie rules: at equal ts a click sorts BEFORE
    * any purchase (so `c_ts <= p_ts` includes it), and among equal-ts clicks
    * the highest event_id wins (the last one the running window sees).
    */
  /** The as-of core over any events-shaped frame (event_id, ts, user_id,
    * event_type, value) — exposed so the property spec can drive it with
    * adversarial synthetic streams (equal-ts ties, clickless purchases).
    */
  private[graft] def asofJoin(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col("event_type").isin("click", "purchase"))
      .withColumn("kind", when(col("event_type") === "click", lit(0)).otherwise(lit(1)))
      .withColumn("click_marker", when(col("kind") === 0, col("event_id")))
      .withColumn("asof_click_id", last(col("click_marker"), ignoreNulls = true).over(w))
      .where(col("kind") === 1 && col("asof_click_id").isNotNull)
      .select(col("event_id").as("p_id"), col("user_id"),
        col("value").as("p_value"), col("asof_click_id"))
  }

  def q26AsofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoin(Tables.events(spark, dir)).orderBy(col("p_id"))

  val q26Oracle: String =
    s"""SELECT p_id, user_id, p_value, asof_click_id FROM (
       |  SELECT p.event_id AS p_id, p.user_id, p.value AS p_value,
       |    c.event_id AS asof_click_id,
       |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
       |  FROM (${Det.EventsSql}) p JOIN (${Det.EventsSql}) c
       |    ON p.event_type = 'purchase' AND c.event_type = 'click'
       |   AND c.user_id = p.user_id AND c.ts <= p.ts)
       |WHERE rn = 1 ORDER BY p_id""".stripMargin

  /** Tumbling 10-minute windows per event type. */
  def q27TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  val q27Oracle: String =
    s"""SELECT w_start, w_start + INTERVAL 10 MINUTE AS w_end, event_type,
       |  count(*) AS cnt, ${Det.dsumSql("value")} AS sum_value
       |FROM (SELECT time_bucket(INTERVAL '10 minutes', ts, TIMESTAMP '1970-01-01') AS w_start,
       |             event_type, value
       |      FROM (${Det.EventsSql}))
       |GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows (10-minute size, 5-minute slide): each event lands in
    * exactly two windows.
    */
  def q28SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("cnt"), col("sum_value"))
      .orderBy(col("w_start"))

  val q28Oracle: String =
    s"""SELECT w_start, w_start + INTERVAL 10 MINUTE AS w_end,
       |  count(*) AS cnt, ${Det.dsumSql("value")} AS sum_value
       |FROM (SELECT unnest([b5, b5 - INTERVAL 5 MINUTE]) AS w_start, value
       |      FROM (SELECT time_bucket(INTERVAL '5 minutes', ts, TIMESTAMP '1970-01-01') AS b5,
       |                   value
       |            FROM (${Det.EventsSql})))
       |GROUP BY w_start ORDER BY w_start""".stripMargin

  /** Session windows: 30-minute inactivity gap per user. Spark's
    * session_window ends at last_ts + gap; the oracle reproduces that with
    * gaps-and-islands (a new session starts when the gap is ≥ 30 minutes,
    * matching Spark's end-exclusive session extent).
    */
  def q29SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("cnt"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start"))

  val q29Oracle: String =
    s"""SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
       |  count(*) AS cnt, ${Det.dsumSql("value")} AS sum_value
       |FROM (
       |  SELECT user_id, ts, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM (
       |    SELECT user_id, ts, event_id, value,
       |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |                >= INTERVAL 30 MINUTE
       |           THEN 1 ELSE 0 END AS new_s
       |    FROM (${Det.EventsSql})))
       |GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin

  /** Watermark late-data drop, batch-emulated: keep only events within 6
    * hours of the global max event time. The global max is a broadcast scalar
    * (single-row cross join), not a collect() — scales to any input.
    */
  def q30LateDataFilter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mx = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(mx))
      .where(col("ts") >= col("max_ts") - expr("INTERVAL 6 HOURS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q30Oracle: String =
    s"""SELECT event_type, count(*) AS cnt, ${Det.dsumSql("value")} AS sum_value
       |FROM (${Det.EventsSql})
       |WHERE ts >= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 6 HOUR
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Stateful dedup, batch-emulated: first event per (user, type) within each
    * 10-minute window survives (dropDuplicates-within-watermark semantics).
    */
  def q31WindowedDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("w_start"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("w_start", window(col("ts"), "10 minutes").getField("start"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("kept_cnt"), Det.dsum(col("value")).as("kept_sum"))
      .orderBy(col("event_type"))
  }

  val q31Oracle: String =
    s"""SELECT event_type, count(*) AS kept_cnt, ${Det.dsumSql("value")} AS kept_sum
       |FROM (
       |  SELECT event_type, value,
       |    row_number() OVER (
       |      PARTITION BY user_id, event_type,
       |                   time_bucket(INTERVAL '10 minutes', ts, TIMESTAMP '1970-01-01')
       |      ORDER BY ts, event_id) AS rn
       |  FROM (${Det.EventsSql}))
       |WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Event funnel view → click → purchase: each stage keeps users whose
    * stage event STRICTLY follows their previous stage's first event.
    * Three per-user min-aggregations chained by co-partitioned joins on
    * user_id — no window over the full event stream, no cross product.
    */
  def q70EventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicks = ev.where(col("event_type") === "click")
      .join(views, "user_id").where(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchases = ev.where(col("event_type") === "purchase")
      .join(clicks, "user_id").where(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    views.select(count(lit(1)).as("viewed_users"))
      .crossJoin(clicks.select(count(lit(1)).as("clicked_after_view")))
      .crossJoin(purchases.select(count(lit(1)).as("purchased_after_click")))
  }

  val q70Oracle: String =
    s"""WITH ev AS (${Det.EventsSql}),
       |v AS (SELECT user_id, min(ts) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT ev.user_id, min(ev.ts) AS t_click FROM ev JOIN v ON ev.user_id = v.user_id
       |      WHERE ev.event_type = 'click' AND ev.ts > v.t_view GROUP BY ev.user_id),
       |p AS (SELECT ev.user_id, min(ev.ts) AS t_purchase FROM ev JOIN c ON ev.user_id = c.user_id
       |      WHERE ev.event_type = 'purchase' AND ev.ts > c.t_click GROUP BY ev.user_id)
       |SELECT (SELECT count(*) FROM v) AS viewed_users,
       |       (SELECT count(*) FROM c) AS clicked_after_view,
       |       (SELECT count(*) FROM p) AS purchased_after_click""".stripMargin

  /** Cohort retention: users grouped by first-activity month; for each
    * (cohort, month-offset) the count of still-active users. Month offsets
    * are exact integer arithmetic (year·12+month), not float date math.
    */
  def q72CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("month", min(col("ts"))).as("cohort_month"))
    val active = ev.select(col("user_id"),
      date_trunc("month", col("ts")).as("active_month")).distinct()
    cohort.join(active, "user_id")
      .withColumn("month_offset",
        (year(col("active_month")) * 12 + month(col("active_month"))) -
          (year(col("cohort_month")) * 12 + month(col("cohort_month"))))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  val q72Oracle: String =
    s"""WITH ev AS (${Det.EventsSql}),
       |cohort AS (SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
       |           FROM ev GROUP BY user_id),
       |active AS (SELECT DISTINCT user_id, date_trunc('month', ts) AS active_month FROM ev)
       |SELECT cohort_month,
       |  (year(active_month) * 12 + month(active_month)) -
       |  (year(cohort_month) * 12 + month(cohort_month)) AS month_offset,
       |  count(DISTINCT user_id) AS active_users
       |FROM cohort JOIN active USING (user_id)
       |GROUP BY cohort_month, month_offset ORDER BY cohort_month, month_offset""".stripMargin

  // ---------------------------------------------------------------- q144

  /** Trailing 7-day distinct active users per day. The scalable shape is
    * contribution-explode, NOT a per-day range join: each event emits the
    * ≤ 7 window-end days it contributes to (a map-side `sequence`/`explode`,
    * 7× row amplification bounded by the window length), then one
    * distinct-aggregation by (day, user). A range join events⋈days would
    * re-scan the event set once per day; this form scans it once total.
    * Window-end days are restricted (semi join on the broadcast distinct-day
    * set) to days that actually have events, so the output matches the
    * oracle's "days" anchor exactly.
    */
  def q144TrailingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("eday"), col("user_id"))
    val days = ev.select(col("eday").as("window_end")).distinct()
    ev.select(explode(sequence(lit(0), lit(6))).as("i"), col("eday"), col("user_id"))
      .select(date_add(col("eday"), col("i")).as("window_end"), col("user_id"))
      .join(broadcast(days), Seq("window_end"), "left_semi")
      .groupBy(col("window_end"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"))
      .orderBy(col("window_end"))
  }

  val q144Oracle: String =
    s"""WITH ev AS (SELECT CAST(ts AS DATE) AS eday, user_id FROM events),
       |days AS (SELECT DISTINCT eday AS window_end FROM ev)
       |SELECT window_end, count(DISTINCT user_id) AS active_users_7d
       |FROM days JOIN ev ON ev.eday BETWEEN window_end - 6 AND window_end
       |GROUP BY window_end ORDER BY window_end""".stripMargin

  // ---------------------------------------------------------------- q145

  /** Linear multi-touch attribution: each purchase's value is split equally
    * across the same user's clicks in the 72 h up to the purchase, and the
    * credited value rolls up by click day. One equi-join on user_id with the
    * time-band predicate applied inside it (per-user pair counts are bounded
    * by per-user activity; AQE skew-split handles hot users), a window count
    * per purchase for the 1/n split (exact IEEE division), and a decimal-sum
    * rollup. Purchases with no preceding click drop out (inner semantics).
    */
  def q145LinearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts").as("pts"), col("value").as("pv"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val paired = purchases.join(clicks,
      col("pu") === col("cu") && col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 72 HOURS"))
    val perPurchase = Window.partitionBy(col("pid"))
    paired
      .withColumn("n_touch", count(lit(1)).over(perPurchase))
      .withColumn("credit", col("pv") / col("n_touch"))
      .groupBy(to_date(col("cts")).as("click_day"))
      .agg(count(lit(1)).as("n_credits"), Det.dsum(col("credit")).as("credited_value"))
      .orderBy(col("click_day"))
  }

  val q145Oracle: String =
    s"""WITH ev AS (${Det.EventsSql}),
       |paired AS (
       |  SELECT p.event_id AS pid, p.value AS pv, c.ts AS cts
       |  FROM ev p JOIN ev c ON p.user_id = c.user_id
       |    AND p.event_type = 'purchase' AND c.event_type = 'click'
       |    AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 72 HOUR),
       |credits AS (
       |  SELECT CAST(cts AS DATE) AS click_day,
       |    pv / count(*) OVER (PARTITION BY pid) AS credit
       |  FROM paired)
       |SELECT click_day, count(*) AS n_credits,
       |  ${Det.dsumSql("credit")} AS credited_value
       |FROM credits GROUP BY click_day ORDER BY click_day""".stripMargin

  // ---------------------------------------------------------------- q153

  /** Time-to-convert: nearest-rank (discrete) p50/p90 of the click→purchase
    * delay, per purchase day-of-week. The preceding click comes from the
    * SAME linear window trick as q26 (no click×purchase join); delays are
    * integer seconds (µs difference, integer division), and the percentiles
    * are rank-picked integers — no interpolation, no float quantile
    * boundary. Ranking runs per day-of-week on the PURCHASE-delay set only
    * (purchases ≪ events); a corpus where even that is too large for a
    * group's window would bin delays first (q66's histogram shape).
    * Day-of-week convention: 0 = Sunday in both engines (Spark
    * dayofweek()−1 ≡ DuckDB dayofweek()).
    */
  def q153TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delays = ev
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("click_ts").isNotNull &&
        col("ts") <= col("click_ts") + expr("INTERVAL 72 HOURS"))
      .select((dayofweek(col("ts")) - 1).as("dow"),
        expr("(unix_micros(ts) - unix_micros(click_ts)) div 1000000").as("delay_sec"),
        col("event_id").as("k"))
    val byDow = Window.partitionBy(col("dow"))
    delays
      .withColumn("rn", row_number().over(byDow.orderBy(col("delay_sec"), col("k"))))
      .withColumn("n", count(lit(1)).over(byDow))
      .groupBy(col("dow"), col("n"))
      .agg(
        max(when(col("rn") === expr("(n + 1) div 2"), col("delay_sec"))).as("p50_sec"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("delay_sec"))).as("p90_sec"))
      .orderBy(col("dow"))
  }

  val q153Oracle: String =
    s"""WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
       |           FROM events WHERE event_type IN ('click', 'purchase')),
       |w AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
       |        OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS UNBOUNDED PRECEDING) AS click_ts FROM ev),
       |delays AS (
       |  SELECT dayofweek(ts) AS dow,
       |    (epoch_us(ts) - epoch_us(click_ts)) // 1000000 AS delay_sec,
       |    event_id AS k
       |  FROM w WHERE event_type = 'purchase' AND click_ts IS NOT NULL
       |    AND ts <= click_ts + INTERVAL 72 HOUR),
       |r AS (SELECT dow, delay_sec,
       |        row_number() OVER (PARTITION BY dow ORDER BY delay_sec, k) AS rn,
       |        count(*) OVER (PARTITION BY dow) AS n FROM delays)
       |SELECT dow, n,
       |  max(CASE WHEN rn = (n + 1) // 2 THEN delay_sec END) AS p50_sec,
       |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN delay_sec END) AS p90_sec
       |FROM r GROUP BY dow, n ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------- q154

  /** Activity-presence bitmask features: one 64-bit mask per user encoding
    * which (day-of-week × event-type) slots the user was ever active in —
    * 35 slots, bit_or-aggregated (commutative, order-independent), plus the
    * popcount as a breadth feature. The compact bitmap-feature encoding a
    * training pipeline ships to a feature store: one integer column instead
    * of 35 booleans, mergeable across shards by OR.
    */
  def q154PresenceBitmask(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("slot",
        (dayofweek(col("ts")) - 1) * 5 + expr(
          """CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
            |WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END""".stripMargin))
      .groupBy(col("user_id"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(slot AS INT))")).as("mask"))
      .select(col("user_id"), col("mask"), bit_count(col("mask")).as("n_slots"))
      .orderBy(col("user_id"))

  val q154Oracle: String =
    """SELECT user_id, mask, bit_count(mask) AS n_slots FROM (
      |  SELECT user_id,
      |    bit_or(CAST(1 AS BIGINT) << (dayofweek(CAST(ts AS TIMESTAMP)) * 5 +
      |      CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
      |        WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END)) AS mask
      |  FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q164

  /** Decile lift (gains) table — the targeting-model evaluation report:
    * users ranked by total spend, split into 10 deciles (ntile over a TOTAL
    * order — spend then user_id, so bucket boundaries are deterministic),
    * and each decile's share of all purchases. Integer counts throughout;
    * the capture rate is one IEEE division by a broadcast scalar total.
    * Shape: one per-user aggregation, then ntile over the aggregated user
    * table (users ≪ events), then a 10-group rollup.
    */
  def q164DecileLift(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("spend_cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))
    val d = u.withColumn("decile",
      ntile(10).over(Window.orderBy(col("spend_cents").desc, col("user_id"))))
    val total = d.agg(sum(col("purchases")).as("tot"))
    d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("purchases")).as("purchases"))
      .crossJoin(broadcast(total))
      .select(col("decile"), col("n_users"), col("purchases"),
        (col("purchases").cast("double") / col("tot").cast("double")).as("capture_rate"))
      .orderBy(col("decile"))
  }

  val q164Oracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS purchases
      |  FROM events GROUP BY 1),
      |d AS (SELECT *, ntile(10) OVER (ORDER BY spend_cents DESC, user_id) AS decile
      |      FROM u),
      |t AS (SELECT CAST(sum(purchases) AS BIGINT) AS tot FROM d)
      |SELECT decile, count(*) AS n_users, CAST(sum(purchases) AS BIGINT) AS purchases,
      |  CAST(sum(purchases) AS DOUBLE) / (SELECT CAST(tot AS DOUBLE) FROM t)
      |    AS capture_rate
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q166

  /** Growth accounting: per day, active users split into NEW (first-ever
    * activity that day) vs RETURNING, plus the cumulative acquired-user
    * curve — the standard product-growth decomposition. First-seen days
    * come from one per-user min; the daily split is a broadcast join of
    * that user-level table into the distinct (day, user) activity set; the
    * cumulative is a window sum over the 30-row daily table. All integers.
    */
  def q166GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("d")).as("first_day"))
    val daily = ev.distinct()
      .join(broadcast(firstDay), "user_id")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("first_day") === col("d"), 1L).otherwise(0L)).as("n_new"))
    daily
      .select(col("d"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"))
      .withColumn("cumulative_users", sum(col("n_new")).over(
        Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("d"))
  }

  val q166Oracle: String =
    """WITH fa AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      |            FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |daily AS (
      |  SELECT d, count(*) AS n_active,
      |    CAST(sum(CASE WHEN first_day = d THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM act JOIN fa USING (user_id) GROUP BY d)
      |SELECT d, n_active, n_new, n_active - n_new AS n_returning,
      |  CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cumulative_users
      |FROM daily ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q168

  /** Behavioral trigram mining: the most common 3-step event-type paths in
    * each user's ordered stream (two leads over the per-user window, then
    * one count) — the sequence-pattern summary funnels and next-action
    * models start from. Top 10 by count with a path tiebreak; at scale the
    * trigram space is tiny (|types|³), so the count aggregation collapses
    * map-side.
    */
  def q168PathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  val q168Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |tri AS (
       |  SELECT event_type AS e1,
       |    lead(event_type, 1) OVER w AS e2,
       |    lead(event_type, 2) OVER w AS e3
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
       |FROM tri WHERE e3 IS NOT NULL
       |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q169

  /** Bidirectional nearest-event join: each purchase matched to its NEAREST
    * click — before or after — with the same linear two-window formulation
    * as q26 (running last-click backward, running first-click forward; no
    * click×purchase join, so hot users stay O(events)). The tie rule
    * (before wins at equal distance) is explicit, deltas are integer
    * microsecond differences divided to seconds, and the rollup reports
    * per-side counts and exact delta bounds. The general
    * nearest-neighbor-in-time join sensor/feature pipelines need when
    * causality can run either way.
    */
  def q169NearestEvent(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
    val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val back = base.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = base.rowsBetween(0, Window.unboundedFollowing)
    val clickTs = when(col("event_type") === "click", col("ts"))
    ev
      .withColumn("prev_click", last(clickTs, ignoreNulls = true).over(back))
      .withColumn("next_click", first(clickTs, ignoreNulls = true).over(fwd))
      .where(col("event_type") === "purchase")
      .withColumn("d_prev", expr("unix_micros(ts) - unix_micros(prev_click)"))
      .withColumn("d_next", expr("unix_micros(next_click) - unix_micros(ts)"))
      .withColumn("nearest",
        when(col("prev_click").isNull && col("next_click").isNull, lit("none"))
          .when(col("next_click").isNull, lit("before"))
          .when(col("prev_click").isNull, lit("after"))
          .when(col("d_prev") <= col("d_next"), lit("before"))
          .otherwise(lit("after")))
      .withColumn("delta_sec", expr(
        "CASE WHEN nearest = 'before' THEN d_prev div 1000000 " +
          "WHEN nearest = 'after' THEN d_next div 1000000 END"))
      .groupBy(col("nearest"))
      .agg(count(lit(1)).as("n"), min(col("delta_sec")).as("min_sec"),
        max(col("delta_sec")).as("max_sec"), sum(col("delta_sec")).as("sum_sec"))
      .orderBy(col("nearest"))
  }

  val q169Oracle: String =
    s"""WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
       |           FROM events WHERE event_type IN ('click', 'purchase')),
       |w AS (SELECT *,
       |  last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS UNBOUNDED PRECEDING) AS prev_click,
       |  first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_click
       |  FROM ev),
       |p AS (
       |  SELECT epoch_us(ts) - epoch_us(prev_click) AS d_prev,
       |    epoch_us(next_click) - epoch_us(ts) AS d_next,
       |    CASE WHEN prev_click IS NULL AND next_click IS NULL THEN 'none'
       |         WHEN next_click IS NULL THEN 'before'
       |         WHEN prev_click IS NULL THEN 'after'
       |         WHEN epoch_us(ts) - epoch_us(prev_click) <=
       |              epoch_us(next_click) - epoch_us(ts) THEN 'before'
       |         ELSE 'after' END AS nearest
       |  FROM w WHERE event_type = 'purchase'),
       |d AS (SELECT nearest,
       |        CASE WHEN nearest = 'before' THEN d_prev // 1000000
       |             WHEN nearest = 'after' THEN d_next // 1000000 END AS delta_sec
       |      FROM p)
       |SELECT nearest, count(*) AS n, min(delta_sec) AS min_sec,
       |  max(delta_sec) AS max_sec, CAST(sum(delta_sec) AS BIGINT) AS sum_sec
       |FROM d GROUP BY nearest ORDER BY nearest""".stripMargin

  // ---------------------------------------------------------------- q175

  /** Temporal co-visitation: user pairs active in the same 10-minute
    * bucket, ranked by shared-bucket count — the proximity-graph
    * construction (collaboration, fraud-ring, co-session signals) built
    * from time alone. Candidates come from an equi-join ON THE BUCKET
    * (distinct (bucket, user) first, so a chatty user counts once per
    * bucket), never an all-pairs scan; per-bucket occupancy bounds the
    * quadratic exactly as q33's shingle df does, and a hot bucket would be
    * df-capped the same way. Top 20 by count with a (ua, ub) tiebreak.
    */
  def q175CoVisitation(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (r14, the q110 discipline): w feeds both self-join
    // sides with alias-renamed subtrees that defeat ReuseExchange —
    // bucket + distinct once.
    val w = Tables.events(spark, dir)
      .select(window(col("ts"), "10 minutes").getField("start").as("wb"), col("user_id"))
      .distinct()
      .localCheckpoint()
    w.select(col("wb"), col("user_id").as("ua"))
      .join(w.select(col("wb"), col("user_id").as("ub")), Seq("wb"))
      .where(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy(col("n_windows").desc, col("ua"), col("ub"))
      .limit(20)
  }

  val q175Oracle: String =
    s"""WITH w AS (SELECT DISTINCT
       |    time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP),
       |                TIMESTAMP '1970-01-01') AS wb, user_id
       |  FROM events)
       |SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS n_windows
       |FROM w a JOIN w b ON a.wb = b.wb AND a.user_id < b.user_id
       |GROUP BY 1, 2
       |ORDER BY n_windows DESC, ua, ub
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q186

  /** Churn-risk cohort: users who clicked in the trailing 3 days but made
    * NO purchase in the same window — recent-intent-without-conversion,
    * the retention-campaign targeting set. The window anchors on the
    * broadcast max event time (watermark-style scalar, no collect); the
    * exclusion is a left-anti join against the recent-purchaser key set.
    * Output: the cohort with click counts and last-click recency, ordered
    * for the downstream campaign writer.
    */
  def q186ChurnRisk(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mx = ev.agg(max(col("ts")).as("m"))
    val recent = ev.crossJoin(broadcast(mx))
      .where(col("ts") >= col("m") - expr("INTERVAL 3 DAYS"))
    val purchasers = recent.where(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    recent.where(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        max(col("ts")).as("last_click"))
      .join(purchasers.withColumnRenamed("user_id", "pu"),
        col("user_id") === col("pu"), "left_anti")
      .orderBy(col("user_id"))
  }

  val q186Oracle: String =
    s"""WITH ev AS (${Det.EventsSql}),
       |mx AS (SELECT max(ts) AS m FROM ev),
       |recent AS (SELECT ev.* FROM ev, mx WHERE ts >= m - INTERVAL 3 DAY),
       |purchasers AS (SELECT DISTINCT user_id FROM recent
       |               WHERE event_type = 'purchase')
       |SELECT user_id, count(*) AS n_clicks, max(ts) AS last_click
       |FROM recent WHERE event_type = 'click'
       |  AND user_id NOT IN (SELECT user_id FROM purchasers)
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q26_asof_join", q26AsofJoin, q26Oracle),
    GraftQuery.sql("q27_tumbling_window", q27TumblingWindow, q27Oracle),
    GraftQuery.sql("q28_sliding_window", q28SlidingWindow, q28Oracle),
    GraftQuery.sql("q29_session_window", q29SessionWindow, q29Oracle),
    GraftQuery.sql("q30_late_data_filter", q30LateDataFilter, q30Oracle),
    GraftQuery.sql("q31_windowed_dedup", q31WindowedDedup, q31Oracle),
    GraftQuery.sql("q70_event_funnel", q70EventFunnel, q70Oracle),
    GraftQuery.sql("q72_cohort_retention", q72CohortRetention, q72Oracle),
    GraftQuery.sql("q144_trailing_distinct", q144TrailingDistinct, q144Oracle),
    GraftQuery.sql("q145_linear_attribution", q145LinearAttribution, q145Oracle),
    GraftQuery.sql("q153_time_to_convert", q153TimeToConvert, q153Oracle),
    GraftQuery.sql("q154_presence_bitmask", q154PresenceBitmask, q154Oracle),
    GraftQuery.sql("q164_decile_lift", q164DecileLift, q164Oracle),
    GraftQuery.sql("q166_growth_accounting", q166GrowthAccounting, q166Oracle),
    GraftQuery.sql("q168_path_trigrams", q168PathTrigrams, q168Oracle),
    GraftQuery.sql("q169_nearest_event", q169NearestEvent, q169Oracle),
    GraftQuery.sql("q175_co_visitation", q175CoVisitation, q175Oracle),
    GraftQuery.sql("q186_churn_risk", q186ChurnRisk, q186Oracle)
  )
}
