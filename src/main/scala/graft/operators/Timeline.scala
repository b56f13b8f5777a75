package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Per-entity timeline operators over the event stream: SCD2 interval
  * construction, Markov transition statistics, rolling-window anomaly
  * detection, and forward-fill imputation.
  *
  * All four share one physical shape — a single shuffle partitioning by
  * `user_id`, then per-partition window evaluation ordered by
  * (ts, event_id) — so at 100 TB each is exactly one exchange keyed on a
  * high-cardinality column, and the per-user frames stream through the
  * window operator without materializing a user's history in memory
  * (ROWS frames evaluate incrementally).
  *
  * Determinism: (ts, event_id) is a unique total order per user;
  * anomaly math is pure 64-bit integer arithmetic (value quantized by
  * floor(value·1000), identical IEEE multiply+floor in both engines);
  * forward-fill copies values rather than computing them.
  */
object Timeline {

  private def byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  // ---------------------------------------------------------------- q111

  /** Core: SCD2 (type-2 slowly-changing-dimension) state intervals from an
    * event log. Each user's event_type plays the tracked attribute: runs of
    * equal consecutive state collapse, each state change opens an interval
    * valid from its first event until the next change (NULL = current).
    * Expects (user_id, ts, event_id, state); returns
    * (user_id, state, valid_from, valid_to, version).
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val changed = events
      .withColumn("prev", lag(col("state"), 1).over(byUser))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    changed
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .withColumn("version", row_number().over(byUser))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("version"))
  }

  def q111Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2Intervals(Tables.events(spark, dir).withColumn("state", col("event_type")))
      .orderBy(col("user_id"), col("version"))

  val q111Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |chg AS (
       |  SELECT user_id, ts, event_id, event_type AS state
       |  FROM (SELECT user_id, ts, event_id, event_type,
       |          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |        FROM e)
       |  WHERE prev IS NULL OR prev <> state)
       |SELECT user_id, state, ts AS valid_from,
       |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
       |FROM chg ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- q112

  /** Markov transition matrix of the event stream: for each consecutive
    * (state → next state) pair per user, the corpus-wide pair count, the
    * out-degree of the source state, and the transition probability (one
    * exact integer division — deterministic).
    */
  def q112Transitions(spark: SparkSession, dir: String): DataFrame = {
    val wFrom = Window.partitionBy(col("from_state"))
    Tables.events(spark, dir)
      .withColumn("next_state", lead(col("event_type"), 1).over(byUser))
      .where(col("next_state").isNotNull)
      .groupBy(col("event_type").as("from_state"), col("next_state").as("to_state"))
      .agg(count(lit(1)).as("n_pair"))
      .withColumn("n_from", sum(col("n_pair")).over(wFrom))
      .withColumn("p", col("n_pair").cast("double") / col("n_from"))
      .orderBy(col("from_state"), col("to_state"))
  }

  val q112Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |pairs AS (
       |  SELECT event_type AS from_state,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
       |  FROM e)
       |SELECT from_state, to_state, count(*) AS n_pair,
       |  CAST(sum(count(*)) OVER (PARTITION BY from_state) AS BIGINT) AS n_from,
       |  CAST(count(*) AS DOUBLE) /
       |    CAST(sum(count(*)) OVER (PARTITION BY from_state) AS BIGINT) AS p
       |FROM pairs WHERE to_state IS NOT NULL
       |GROUP BY from_state, to_state ORDER BY from_state, to_state""".stripMargin

  // ---------------------------------------------------------------- q113

  /** Core: rolling z-score anomaly flags in EXACT integer arithmetic.
    * Values quantize to milli-units v = floor(value·1000); over the
    * trailing `lookback`-event frame (excluding the current row) with
    * n ≥ `minPrior` observations, sum S and sum-of-squares Q make the
    * anomaly test |v − S/n| > 2σ equivalent to the integer inequality
    * (n·v − S)² > 4·(n·Q − S²) — no float variance, no sqrt, no
    * cross-engine rounding surface. Magnitudes: v ≤ 5·10⁵ here, so every
    * intermediate fits a 64-bit long with ~10³ headroom.
    * Expects (user_id, ts, event_id, value); adds (v_milli, n_prior,
    * is_scored, is_anomaly).
    */
  def rollingAnomaly(events: DataFrame, lookback: Int, minPrior: Int): DataFrame = {
    val frame = byUser.rowsBetween(-lookback, -1)
    events
      .withColumn("v_milli", floor(col("value") * 1000.0).cast("long"))
      .withColumn("n_prior", count(col("v_milli")).over(frame))
      .withColumn("s_prior", sum(col("v_milli")).over(frame))
      .withColumn("q_prior", sum(col("v_milli") * col("v_milli")).over(frame))
      .withColumn("is_scored", col("n_prior") >= minPrior)
      .withColumn("is_anomaly", col("is_scored") &&
        (col("n_prior") * col("v_milli") - col("s_prior")) *
          (col("n_prior") * col("v_milli") - col("s_prior")) >
          lit(4L) * (col("n_prior") * col("q_prior") - col("s_prior") * col("s_prior")))
  }

  /** Per-user anomaly summary of the rolling 10-event z-score detector. */
  def q113Anomaly(spark: SparkSession, dir: String): DataFrame =
    rollingAnomaly(Tables.events(spark, dir), 10, 5)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_scored"), 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy(col("user_id"))

  val q113Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |base AS (
       |  SELECT user_id,
       |    CAST(floor(value * 1000.0) AS BIGINT) AS v,
       |    count(*) OVER w AS n,
       |    CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) OVER w AS BIGINT) AS s,
       |    CAST(sum(CAST(floor(value * 1000.0) AS BIGINT) *
       |             CAST(floor(value * 1000.0) AS BIGINT)) OVER w AS BIGINT) AS q
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
       |SELECT user_id, count(*) AS n_events,
       |  CAST(sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       |  CAST(sum(CASE WHEN n >= 5 AND
       |             (n * v - s) * (n * v - s) > 4 * (n * q - s * s)
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
       |FROM base GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q114

  /** Forward-fill (last-observation-carried-forward) imputation: the
    * purchase amount is treated as a sparse signal observed only on
    * purchase events; every event carries the latest prior observation
    * within its user timeline (NULL before the first). Copies values —
    * no arithmetic — so cross-engine equality is structural.
    */
  def forwardFill(events: DataFrame, observed: DataFrame => DataFrame): DataFrame =
    events
      .transform(observed)
      .withColumn("filled",
        last(col("signal"), ignoreNulls = true)
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  def q114ForwardFill(spark: SparkSession, dir: String): DataFrame =
    forwardFill(Tables.events(spark, dir),
      _.withColumn("signal", when(col("event_type") === "purchase", col("value"))))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("filled").as("last_purchase_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  val q114Oracle: String =
    s"""WITH e AS (${Det.EventsSql})
       |SELECT user_id, event_id, ts, event_type,
       |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS last_purchase_value
       |FROM e ORDER BY user_id, ts, event_id""".stripMargin

  // ---------------------------------------------------------------- q125

  /** Gaps-and-islands sessionization — the pure-window formulation of
    * session building (vs q29's `session_window` operator): a session break
    * is a ≥ 30-minute event-time gap (millisecond-integer compare, matching
    * session_window's "next start < previous end + gap merges" rule), the
    * session id is the running count of breaks, and per-session aggregates
    * follow from an ordinary groupBy. Two window passes + one aggregation,
    * all partitioned by user — the same single-exchange shape as the rest
    * of this module, and the form that generalizes when session rules stop
    * fitting `session_window` (e.g. type-dependent gaps).
    */
  def gapsIslands(events: DataFrame, gapMs: Long): DataFrame =
    events
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") >= gapMs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  def q125GapsIslands(spark: SparkSession, dir: String): DataFrame =
    gapsIslands(Tables.events(spark, dir), 30L * 60 * 1000)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_last"),
        count(lit(1)).as("cnt"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))

  val q125Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |marked AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
       |         THEN 1 ELSE 0 END AS brk
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM marked)
       |SELECT user_id, session_idx, min(ts) AS s_start, max(ts) AS s_last,
       |  count(*) AS cnt, ${Det.dsumSql("value")} AS sum_value
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------- q132

  /** Per-user linear trend of event values over time — closed-form
    * least-squares slope from the normal equations, computed entirely in
    * exact 64-bit integer sums: x = minutes since the user's first event
    * (integer), y = milli-quantized value, slope numerator n·Σxy − Σx·Σy
    * and denominator n·Σx² − (Σx)², both exact; the slope itself is the
    * single IEEE division num/den. The "is activity trending up" signal a
    * feature pipeline derives per entity.
    *
    * Magnitudes: x ≤ ~10⁶ minutes, y ≤ 5·10⁵, n ≤ 10³ per user → Σxy ≤
    * 5·10¹⁴ and n·Σxy ≤ 5·10¹⁷ — inside the 9.2·10¹⁸ long range. One
    * shuffle on user_id; window for the per-user epoch, then a plain
    * partial+final aggregation.
    */
  def q132TrendRegression(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("t0", min(unix_millis(col("ts"))).over(Window.partitionBy(col("user_id"))))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, whose
      // truncation can land one below the exact integer quotient.
      .withColumn("x", expr("(unix_millis(ts) - t0) div 60000L"))
      .withColumn("y", floor(col("value") * 1000.0).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("user_id"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")))
          .as("slope_milli_per_min"))
      .orderBy(col("user_id"))

  val q132Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |base AS (
       |  SELECT user_id,
       |    (epoch_ms(ts) - min(epoch_ms(ts)) OVER (PARTITION BY user_id)) // 60000 AS x,
       |    CAST(floor(value * 1000.0) AS BIGINT) AS y
       |  FROM e),
       |agg AS (
       |  SELECT user_id, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM base GROUP BY user_id)
       |SELECT user_id, n,
       |  n * sxy - sx * sy AS slope_num,
       |  n * sxx - sx * sx AS slope_den,
       |  CASE WHEN n * sxx - sx * sx <> 0
       |       THEN CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END
       |    AS slope_milli_per_min
       |FROM agg ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q286

  /** Day-of-week seasonality index per event type: mean value on each
    * weekday relative to the type's overall mean — the classical seasonal
    * index (ratio-to-overall-average method) a monitoring/forecasting
    * pipeline computes before de-seasonalizing. Determinism: both means
    * come from exact decimal sums (Det.dsum) over int64 counts; the index
    * is the SAME parenthesized double expression — (s/n)/(S/N) — in both
    * engines, two IEEE divisions on exactly-representable inputs. Weekday
    * numbering is pinned Monday=0 (Spark `weekday` ≡ DuckDB `isodow - 1`);
    * never `dayofweek`, whose origin differs across engines.
    *
    * Scale shape: two hash aggregations over one scan lineage — per
    * (type, dow) and per type — joined on the tiny type key; everything
    * partial-aggregates map-side. No windows, no sorts until the final
    * 7·|types|-row ORDER BY.
    */
  def q286DowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("weekday(ts)").as("dow"),
        col("value"))
    val perDow = ev.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("s"))
    val overall = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_all"), Det.dsum(col("value")).as("s_all"))
    perDow.join(overall, "event_type")
      .withColumn("season_idx",
        (col("s") / col("n")) / (col("s_all") / col("n_all")))
      .select(col("event_type"), col("dow"), col("n"), col("season_idx"))
      .orderBy(col("event_type"), col("dow"))
  }

  val q286Oracle: String =
    s"""WITH ev AS (SELECT event_type, isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow, value
       |            FROM events),
       |per AS (SELECT event_type, dow, count(*) AS n,
       |          ${graft.operators.Det.dsumSql("value")} AS s
       |        FROM ev GROUP BY 1, 2),
       |org AS (SELECT event_type, count(*) AS n_all,
       |          ${graft.operators.Det.dsumSql("value")} AS s_all
       |        FROM ev GROUP BY 1)
       |SELECT per.event_type AS event_type, dow, n, (s / n) / (s_all / n_all) AS season_idx
       |FROM per JOIN org ON per.event_type = org.event_type
       |ORDER BY per.event_type, dow""".stripMargin

  // ---------------------------------------------------------------- q287

  /** ts carried as epoch MICROSECONDS so the per-user sort is exactly the
    * µs-precision (ts, event_id) order the oracle's pair condition uses
    * (q206's lesson — a java.sql.Timestamp sort would collapse to millis).
    */
  final case class MkEvent(user_id: Long, tsu: Long, event_id: Long, v: Double)

  /** Mann–Kendall trend statistic per user: S = Σ_{i<j} sign(v_j − v_i)
    * over the user's time-ordered activity — the standard nonparametric
    * monotonic-trend test (no distributional assumption; the
    * z-normalization that needs variance ties is the tiny model-side
    * step). Emitted per user with the pair count and the trend class, so a
    * pipeline can flag drifting segments.
    *
    * Scale shape (r8 — replaces the all-pairs self-join the round-7
    * verdict flagged): S is computable WITHOUT enumerating pairs. Walking
    * the user's events in (ts, event_id) order with a Fenwick tree over
    * rank-compressed values, each step j adds (#prior values < v_j) −
    * (#prior values > v_j) — concordant minus discordant — so per-user
    * work is O(k log k), not O(k²): a 10⁶-event power user costs ~2·10⁷
    * tree ops instead of 10¹² joined pairs in one shuffle partition. One
    * shuffle on user_id (groupByKey), then the linear-memory walk per user
    * (the q135/q206 typed per-group escape hatch; a user's history is the
    * documented per-group bound). Rank equality is exact double equality —
    * the same ties sign(v_b − v_a) = 0 sees (IEEE subtraction is zero iff
    * the operands are equal). Users with a single event produce no pairs
    * and are dropped, matching the join form's semantics; the oracle keeps
    * the pair formulation — the hash match proves the inversion-count walk
    * and the O(k²) definition agree.
    */
  def q287MannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"),
        col("value").as("v"))
      .as[MkEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[MkEvent]) =>
        val evs = it.toArray.sortBy(e => (e.tsu, e.event_id))
        val k = evs.length
        if (k < 2) Iterator.empty
        else {
          // rank-compress values; Fenwick tree counts prior ranks ≤ r
          val sortedVals = evs.map(_.v).distinct.sorted
          val rank = sortedVals.zipWithIndex.toMap
          val bit = new Array[Long](sortedVals.length + 1)
          def add(r0: Int): Unit = {
            var i = r0 + 1
            while (i < bit.length) { bit(i) += 1L; i += i & (-i) }
          }
          def countLe(r0: Int): Long = {
            var i = r0 + 1
            var s = 0L
            while (i > 0) { s += bit(i); i -= i & (-i) }
            s
          }
          var s = 0L
          var seen = 0L
          evs.foreach { e =>
            val r = rank(e.v)
            val le = countLe(r)
            val lt = if (r == 0) 0L else countLe(r - 1)
            s += lt - (seen - le) // concordant − discordant vs all priors
            add(r)
            seen += 1L
          }
          val trend = if (s > 0) "up" else if (s < 0) "down" else "flat"
          Iterator((uid, k.toLong * (k - 1L) / 2L, s, trend))
        }
      }
      .toDF("user_id", "n_pairs", "s_stat", "trend")
      .orderBy(col("user_id"))
  }

  val q287Oracle: String =
    """SELECT user_id, count(*) AS n_pairs,
      |  CAST(sum(CAST(sign(b.v_b - a.v_a) AS BIGINT)) AS BIGINT) AS s_stat,
      |  CASE WHEN sum(CAST(sign(b.v_b - a.v_a) AS BIGINT)) > 0 THEN 'up'
      |       WHEN sum(CAST(sign(b.v_b - a.v_a) AS BIGINT)) < 0 THEN 'down'
      |       ELSE 'flat' END AS trend
      |FROM (SELECT user_id, event_id AS id_a, CAST(ts AS TIMESTAMP) AS ts_a, value AS v_a
      |      FROM events) a
      |JOIN (SELECT user_id, event_id AS id_b, CAST(ts AS TIMESTAMP) AS ts_b, value AS v_b
      |      FROM events) b USING (user_id)
      |WHERE a.ts_a < b.ts_b OR (a.ts_a = b.ts_b AND a.id_a < b.id_b)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q312

  /** Per-user EWMA (α = 1/2) of event values over the trailing 16 events —
    * the classic streaming smoother, realized batch-side as a window
    * computation and made BIT-EXACT by construction: weights 2⁻¹…2⁻¹⁶ are
    * exact powers of two, values are floor-scaled to integer cents (floor
    * is deterministic where round() is a half-way-rule lottery), so the
    * weighted numerator and the present-weight denominator are pure int64
    * arithmetic — order-independent, overflow-safe (|v|·2¹⁵·16 ≪ 2⁶³) —
    * and the EWMA is two IEEE divisions at the very end. Truncating the
    * exponential tail at 16 lags loses < 2⁻¹⁶ of the weight mass and is
    * what makes the state FINITE (the same watermark-bounded-state rule
    * the streaming twins follow); the denominator renormalizes short
    * prefixes, so early events get a proper partial-window mean. One
    * output row per user: its event count and the smoothed level after its
    * final event. The SQL is engine-portable (lag/CASE/WINDOW only) and
    * serves as its own oracle modulo the table name.
    *
    * Scale shape: ONE shuffle on user_id serves both named windows; the 16
    * lags are O(1) per row inside WholeStageCodegen — no self-joins, no
    * per-user quadratic anything (the q287 lesson, applied from day one).
    */
  private def ewmaSql(table: String): String = {
    val num = (0 until 16).map(j => s"COALESCE(v$j * ${1L << (15 - j)}, 0)").mkString(" + ")
    val den = (0 until 16)
      .map(j => s"CASE WHEN v$j IS NULL THEN 0 ELSE ${1L << (15 - j)} END").mkString(" + ")
    val lags = (1 until 16).map(j => s"lag(vc, $j) OVER w AS v$j").mkString(", ")
    s"""WITH base AS (
       |  SELECT user_id, ts, event_id, CAST(floor(value * 100.0) AS BIGINT) AS vc
       |  FROM $table),
       |lagged AS (
       |  SELECT user_id, vc AS v0, $lags,
       |    row_number() OVER w2 AS rn_desc,
       |    count(*) OVER (PARTITION BY user_id) AS n_events
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       |         w2 AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
       |SELECT user_id, n_events,
       |  (CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) / 100.0 AS ewma_last
       |FROM lagged WHERE rn_desc = 1 ORDER BY user_id""".stripMargin
  }

  def q312EwmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_ewma_src")
    spark.sql(ewmaSql("events_ewma_src"))
  }

  val q312Oracle: String = ewmaSql("events")

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q312_ewma_smooth", q312EwmaSmooth, q312Oracle),
    GraftQuery.sql("q286_dow_seasonality", q286DowSeasonality, q286Oracle),
    GraftQuery.sql("q287_mann_kendall", q287MannKendall, q287Oracle),
    GraftQuery.sql("q111_scd2_intervals", q111Scd2, q111Oracle),
    GraftQuery.sql("q112_transition_matrix", q112Transitions, q112Oracle),
    GraftQuery.sql("q113_rolling_anomaly", q113Anomaly, q113Oracle),
    GraftQuery.sql("q114_forward_fill", q114ForwardFill, q114Oracle),
    GraftQuery.sql("q125_gaps_islands", q125GapsIslands, q125Oracle),
    GraftQuery.sql("q132_trend_regression", q132TrendRegression, q132Oracle),
    GraftQuery.sql("q138_decayed_revenue", q138DecayedRevenue, q138Oracle),
    GraftQuery.sql("q159_bounce_rate", q159BounceRate, q159Oracle),
    GraftQuery.sql("q163_run_length", q163RunLength, q163Oracle),
    GraftQuery.sql("q171_rfm_segments", q171RfmSegments, q171Oracle),
    GraftQuery.sql("q172_autocorrelation", q172Autocorrelation, q172Oracle),
    GraftQuery.sql("q176_linear_interp", q176LinearInterp, q176Oracle),
    GraftQuery.sql("q181_max_concurrency", q181MaxConcurrency, q181Oracle),
    GraftQuery.sql("q182_weighted_ma", q182WeightedMa, q182Oracle),
    GraftQuery.sql("q183_week_over_week", q183WeekOverWeek, q183Oracle),
    GraftQuery.sql("q184_inter_arrival", q184InterArrival, q184Oracle),
    GraftQuery.sql("q191_session_bookends", q191SessionBookends, q191Oracle),
    GraftQuery.sql("q192_sla_attainment", q192SlaAttainment, q192Oracle),
    GraftQuery.sql("q209_behavior_profile", q209BehaviorProfile, q209Oracle),
    GraftQuery.sql("q210_rolling_median", q210RollingMedian, q210Oracle),
    GraftQuery.sql("q212_behavior_gini", q212BehaviorGini, q212Oracle),
    GraftQuery.sql("q219_new_returning", q219NewReturning, q219Oracle),
    GraftQuery.sql("q220_survival_curve", q220SurvivalCurve, q220Oracle),
    GraftQuery.sql("q228_downsample", q228Downsample, q228Oracle)
  )

  // ---------------------------------------------------------------- q228

  /** Time-series downsampling for dashboards: one representative event per
    * 6-hour bucket, chosen as the point farthest from the bucket mean (the
    * LTTB idea with a fixed anchor). The deviation compare is INTEGER-exact:
    * instead of |v − Σv/n| (a float division both engines might round
    * differently), rank on |n·v − Σv| — the same ordering scaled by the
    * bucket count, computed from cent-quantized int64 values. Window counts
    * and sums partition on the bucket key, so the whole operator is two
    * shuffles on a pre-aggregatable key at any scale.
    */
  def q228Downsample(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(spark, dir).select(col("event_id"),
      window(col("ts"), "6 hours").getField("start").as("bucket"),
      round(col("value") * 100).cast("long").as("vc"))
    val wB = Window.partitionBy(col("bucket"))
    val r = b
      .withColumn("n", count(lit(1)).over(wB).cast("long"))
      .withColumn("s", sum(col("vc")).over(wB))
      .withColumn("dev", abs(col("n") * col("vc") - col("s")))
    r.withColumn("rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("dev").desc, col("event_id"))))
      .where(col("rn") === 1)
      .select(col("bucket"), col("event_id").as("rep_id"),
        (col("vc").cast("double") / 100).as("rep_value"),
        col("n").as("n_in_bucket"), col("dev"))
      .orderBy(col("bucket"))
  }

  val q228Oracle: String =
    s"""WITH b AS (
       |  SELECT event_id, time_bucket(INTERVAL 6 HOUR, ts) AS bucket,
       |    CAST(round(value * 100) AS BIGINT) AS vc
       |  FROM (${graft.operators.Det.EventsSql})),
       |w AS (
       |  SELECT event_id, bucket, vc,
       |    CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS n,
       |    CAST(sum(vc) OVER (PARTITION BY bucket) AS BIGINT) AS s
       |  FROM b),
       |r AS (
       |  SELECT bucket, event_id, vc, n, abs(n * vc - s) AS dev,
       |    row_number() OVER (PARTITION BY bucket
       |                       ORDER BY abs(n * vc - s) DESC, event_id) AS rn
       |  FROM w)
       |SELECT bucket, event_id AS rep_id, CAST(vc AS DOUBLE)/100 AS rep_value,
       |  n AS n_in_bucket, dev
       |FROM r WHERE rn = 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q219

  /** New-vs-returning order split per month — the acquisition/retention
    * decomposition every growth dashboard leads with. Each customer's first
    * month comes from one aggregation; the classification is a month-equality
    * test joined back on the customer key (broadcastable per-customer frame);
    * outputs are integer counts. Two shuffles at any scale.
    */
  def q219NewReturning(spark: SparkSession, dir: String): DataFrame = {
    val first = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("first_dt"))
    Tables.orders(spark, dir)
      .join(first, "o_custkey")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(
        sum(when(date_trunc("month", col("first_dt")) ===
          date_trunc("month", col("o_orderdate")), 1L).otherwise(0L)).as("new_orders"),
        sum(when(date_trunc("month", col("first_dt")) =!=
          date_trunc("month", col("o_orderdate")), 1L).otherwise(0L)).as("ret_orders"))
      .orderBy(col("m"))
  }

  val q219Oracle: String =
    """WITH f AS (SELECT o_custkey, min(o_orderdate) AS first_dt FROM orders GROUP BY 1)
      |SELECT date_trunc('month', o_orderdate) AS m,
      |  CAST(sum(CASE WHEN date_trunc('month', first_dt) = date_trunc('month', o_orderdate)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS new_orders,
      |  CAST(sum(CASE WHEN date_trunc('month', first_dt) <> date_trunc('month', o_orderdate)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS ret_orders
      |FROM orders JOIN f USING (o_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q220

  /** Inter-order survival curve: for each horizon (30/60/90/180/365 days),
    * the fraction of order gaps that exceed it — the repurchase-cycle
    * distribution behind churn-window policy (complements q184's moments and
    * q186's churn cohort). Gaps are exact integer day counts (µs difference,
    * integer division); horizons come from a generated 5-row frame that
    * cross-joins as a broadcast; every output is integer counts plus one
    * exact division.
    */
  def q220SurvivalCurve(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ts"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ts"), col("o_orderkey"))
      .withColumn("du", expr("unix_micros(ts) - unix_micros(lag(ts, 1) OVER " +
        "(PARTITION BY o_custkey ORDER BY ts, o_orderkey))"))
      .where(col("du").isNotNull)
      .select(expr("du div 86400000000").as("gap_days"))
    val horizons = gaps.sparkSession.range(1)
      .select(explode(expr("array(30L, 60L, 90L, 180L, 365L)")).as("horizon_days"))
    gaps.crossJoin(broadcast(horizons))
      .groupBy(col("horizon_days"))
      .agg(
        sum(when(col("gap_days") > col("horizon_days"), 1L).otherwise(0L)).as("n_surviving"),
        count(lit(1)).as("n_gaps"))
      .select(col("horizon_days"), col("n_surviving"), col("n_gaps"),
        (col("n_surviving").cast("double") / col("n_gaps")).as("survival"))
      .orderBy(col("horizon_days"))
  }

  val q220Oracle: String =
    """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts, o_orderkey
      |           FROM orders),
      |l AS (SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY o_custkey
      |        ORDER BY ts, o_orderkey)) AS du FROM o),
      |g AS (SELECT du // 86400000000 AS gap_days FROM l WHERE du IS NOT NULL),
      |t AS (SELECT unnest([30, 60, 90, 180, 365]) AS horizon_days)
      |SELECT CAST(horizon_days AS BIGINT) AS horizon_days,
      |  CAST(sum(CASE WHEN gap_days > horizon_days THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
      |  CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(sum(CASE WHEN gap_days > horizon_days THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS survival
      |FROM g, t GROUP BY horizon_days ORDER BY horizon_days""".stripMargin

  // ---------------------------------------------------------------- q209

  /** Per-user behavioral profile serialized as a canonical JSON object —
    * the feature-store export shape (one row per entity, one packed document
    * column). The object is BUILT deterministically — keys sorted, string
    * concatenation, integer values — rather than through a JSON library, so
    * both engines produce byte-identical documents. One aggregation to
    * per-(user, type) counts, one sorted-array pack per user.
    */
  def q209BehaviorProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(concat(lit("{"),
        concat_ws(",", expr(
          "transform(sort_array(collect_list(struct(event_type, n))), " +
            "e -> concat('\"', e.event_type, '\":', e.n))")),
        lit("}")).as("mix"))
      .orderBy(col("user_id"))

  val q209Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |c AS (SELECT user_id, event_type, count(*) AS n FROM e GROUP BY 1, 2)
       |SELECT user_id,
       |  '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type) || '}' AS mix
       |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q210

  /** Rolling exact median (trailing 7 events) per user — the robust
    * smoother dashboards use where moving averages chase outliers. The
    * frame's values are collected per row (bounded: ≤ 7 elements), sorted,
    * and the nearest-rank element picked — a VALUE COPY, never arithmetic,
    * so determinism is free. One shuffle on user_id; the ROWS frame
    * evaluates incrementally in WindowExec.
    */
  def q210RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = byUser.rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .withColumn("win", collect_list(col("value")).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        expr("sort_array(win)[CAST((size(win) + 1) / 2 AS INT) - 1]").as("roll_med"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q210Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |w AS (SELECT user_id, event_id, value,
       |        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
       |      FROM e)
       |SELECT user_id, event_id, value,
       |  list_sort(win)[(len(win) + 1) // 2] AS roll_med
       |FROM w ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q212

  /** Behavioral diversity via Gini impurity of each user's event-type mix:
    * 1 − Σpᵢ² = (n² − Σcᵢ²)/n² — exact integer sums finished by one IEEE
    * division, the log-free diversity feature (vs entropy, whose log is not
    * bit-reproducible across engines). Two aggregations, both keyed on the
    * user — one shuffle chain at any scale.
    */
  def q212BehaviorGini(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("tot"), sum(col("n") * col("n")).as("ss"))
      .select(col("user_id"), col("tot"),
        ((col("tot") * col("tot") - col("ss")).cast("double") /
          (col("tot") * col("tot"))).as("gini"))
      .orderBy(col("user_id"))

  val q212Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
       |      FROM e GROUP BY 1, 2),
       |u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot,
       |             CAST(sum(n*n) AS BIGINT) AS ss
       |      FROM c GROUP BY 1)
       |SELECT user_id, tot,
       |  CAST(tot*tot - ss AS DOUBLE) / (tot*tot) AS gini
       |FROM u ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q159

  /** Per-day session bounce rate: share of sessions (30-min gap rule, the
    * q125 machinery) that contain exactly one event, keyed by the session's
    * start day. Both numerator and denominator are integer session counts
    * from one aggregation over the sessionized rows; the rate is a single
    * IEEE division. The engagement-quality metric every funnel dashboard
    * leads with.
    */
  def q159BounceRate(spark: SparkSession, dir: String): DataFrame =
    gapsIslands(Tables.events(spark, dir), 30L * 60 * 1000)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("s_start"), count(lit(1)).as("cnt"))
      .groupBy(to_date(col("s_start")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        (col("n_bounce").cast("double") / col("n_sessions").cast("double"))
          .as("bounce_rate"))
      .orderBy(col("day"))

  val q159Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |marked AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
       |         THEN 1 ELSE 0 END AS brk
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM marked),
       |s AS (SELECT user_id, session_idx, min(ts) AS s_start, count(*) AS cnt
       |      FROM sess GROUP BY 1, 2)
       |SELECT CAST(s_start AS DATE) AS day, count(*) AS n_sessions,
       |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS bounce_rate
       |FROM s GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q163

  /** Run-length encoding of per-user event-type sequences: islands defined
    * by VALUE CHANGE (lag ≠ current) rather than time gaps — the other half
    * of the gaps-and-islands family (q125 breaks on time, this breaks on
    * state transition). Per event type: run count, total events, longest
    * run, and mean run length (ratio of two exact integers — one IEEE
    * division). The state-sequence compression a behavioral-features
    * pipeline uses for streak/habit signals.
    */
  def q163RunLength(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(spark, dir)
      .withColumn("brk",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("event_type"), col("run_id"))
      .agg(count(lit(1)).as("len"))
    runs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_runs"), sum(col("len")).as("total_events"),
        max(col("len")).as("max_len"))
      .select(col("event_type"), col("n_runs"), col("total_events"), col("max_len"),
        (col("total_events").cast("double") / col("n_runs").cast("double"))
          .as("avg_run_len"))
      .orderBy(col("event_type"))
  }

  val q163Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |m AS (SELECT user_id, event_type, ts, event_id,
       |        CASE WHEN lag(event_type) OVER w IS NULL
       |               OR lag(event_type) OVER w <> event_type
       |             THEN 1 ELSE 0 END AS brk
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |runs AS (SELECT user_id, event_type,
       |           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
       |         FROM m),
       |agg AS (SELECT user_id, event_type, run_id, count(*) AS len
       |        FROM runs GROUP BY 1, 2, 3)
       |SELECT event_type, count(*) AS n_runs, CAST(sum(len) AS BIGINT) AS total_events,
       |  max(len) AS max_len,
       |  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_run_len
       |FROM agg GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q171

  /** RFM segmentation: per customer recency (days since last order, against
    * the corpus max date — a broadcast scalar), frequency, and monetary
    * (integer cents), each scored 1–5 by ntile over a deterministic total
    * order, rolled up to segment sizes. The standard customer-value
    * segmentation; all integers, bucket boundaries fixed by the
    * (metric, custkey) tiebreak. Scale shape: one per-customer aggregation,
    * then three windows over the customer-level table (customers ≪ orders).
    */
  def q171RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ref = o.agg(max(to_date(col("o_orderdate"))).as("ref_day"))
    val rfm = o.crossJoin(broadcast(ref))
      .groupBy(col("o_custkey"), col("ref_day"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
      .withColumn("recency_days", datediff(col("ref_day"), col("last_day")).cast("long"))
    rfm
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(col("recency_days"), col("o_custkey"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("frequency").desc, col("o_custkey"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("monetary_cents").desc, col("o_custkey"))))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q171Oracle: String =
    """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
      |rfm AS (
      |  SELECT o_custkey, ref_day,
      |    CAST(ref_day - max(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM orders, mx GROUP BY o_custkey, ref_day),
      |s AS (SELECT *,
      |        ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
      |        ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
      |        ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
      |      FROM rfm)
      |SELECT r_score, f_score, m_score, count(*) AS n_customers,
      |  CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
      |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q172

  /** Lag-1 autocorrelation of the daily revenue series — the "is today
    * predictive of tomorrow" time-series diagnostic. Daily revenue is an
    * exact integer (whole dollars); the Pearson moments over (xₜ, xₜ₋₁)
    * pairs are computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both
    * exact integer arithmetic — and revenue is quantized to THOUSANDS of
    * dollars so every derived moment stays under 2⁵³: integers that small
    * are exactly representable as doubles, so the final casts agree
    * bit-for-bit no matter which rounding mode each engine's
    * bigint→double cast uses (measured: a full-magnitude variant differed
    * by 1 ulp exactly there). Holds through sf≈1; a larger corpus
    * re-quantizes coarser. Shape: one shuffle to the ~30-row daily table,
    * one window lag, one aggregate.
    */
  def q172Autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice) AS BIGINT)) div 1000").as("rev"))
    val lagged = daily
      .withColumn("y", lag(col("rev"), 1).over(Window.orderBy(col("day"))))
      .where(col("y").isNotNull)
      .select(col("rev").cast("decimal(38,0)").as("x"), col("y").cast("decimal(38,0)").as("y"))
    lagged.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("r1"))
  }

  val q172Oracle: String =
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) // 1000 AS BIGINT) AS rev
      |           FROM orders GROUP BY 1),
      |l AS (SELECT rev AS x, lag(rev) OVER (ORDER BY day) AS y FROM d),
      |s AS (SELECT count(*) AS n,
      |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |        sum(CAST(x AS HUGEINT) * y) AS sxy,
      |        sum(CAST(x AS HUGEINT) * x) AS sxx,
      |        sum(CAST(y AS HUGEINT) * y) AS syy
      |      FROM l WHERE y IS NOT NULL)
      |SELECT n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |    AS r1
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q176

  /** Linear interpolation between observations — the two-sided companion
    * to q114's forward fill: each non-purchase event gets a value
    * interpolated between the user's surrounding purchase observations,
    * v = v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev), from
    * one backward and one forward window pass (no self-join). Inputs are
    * integer milli-values and integer microsecond timestamps, so the
    * per-row interpolation is a fixed IEEE expression (deterministic);
    * the rollup uses the corpus decimal-sum convention (q145's shape).
    */
  def q176LinearInterp(spark: SparkSession, dir: String): DataFrame = {
    val bk = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val fw = byUser.rowsBetween(0, Window.unboundedFollowing)
    val pv = when(col("event_type") === "purchase", floor(col("value") * 1000).cast("long"))
    val pt = when(col("event_type") === "purchase", col("ts"))
    Tables.events(spark, dir)
      .withColumn("prev_v", last(pv, ignoreNulls = true).over(bk))
      .withColumn("prev_t", last(pt, ignoreNulls = true).over(bk))
      .withColumn("next_v", first(pv, ignoreNulls = true).over(fw))
      .withColumn("next_t", first(pt, ignoreNulls = true).over(fw))
      .where(col("event_type") =!= "purchase" &&
        col("prev_v").isNotNull && col("next_v").isNotNull &&
        col("prev_t") =!= col("next_t"))
      .withColumn("interp_milli",
        col("prev_v").cast("double") +
          (col("next_v") - col("prev_v")).cast("double") *
          (expr("unix_micros(ts) - unix_micros(prev_t)").cast("double") /
            expr("unix_micros(next_t) - unix_micros(prev_t)").cast("double")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_interp"),
        Det.dsum(col("interp_milli")).as("sum_milli"),
        Det.davg(col("interp_milli")).as("avg_milli"))
      .orderBy(col("event_type"))
  }

  val q176Oracle: String =
    s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
       |             CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
       |m AS (SELECT *,
       |  last_value(CASE WHEN event_type = 'purchase' THEN vm END IGNORE NULLS)
       |    OVER bk AS prev_v,
       |  last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
       |    OVER bk AS prev_t,
       |  first_value(CASE WHEN event_type = 'purchase' THEN vm END IGNORE NULLS)
       |    OVER fw AS next_v,
       |  first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
       |    OVER fw AS next_t
       |  FROM e
       |  WINDOW bk AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS UNBOUNDED PRECEDING),
       |         fw AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |interp AS (
       |  SELECT event_type,
       |    CAST(prev_v AS DOUBLE) +
       |      CAST(next_v - prev_v AS DOUBLE) *
       |      (CAST(epoch_us(ts) - epoch_us(prev_t) AS DOUBLE) /
       |       CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE)) AS interp_milli
       |  FROM m
       |  WHERE event_type <> 'purchase' AND prev_v IS NOT NULL
       |    AND next_v IS NOT NULL AND prev_t <> next_t)
       |SELECT event_type, count(*) AS n_interp,
       |  ${Det.dsumSql("interp_milli")} AS sum_milli,
       |  ${Det.davgSql("interp_milli")} AS avg_milli
       |FROM interp GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q181

  /** Max concurrent sessions per day — the SWEEP-LINE family: session
    * intervals (q125's gaps-and-islands, Spark session_window extents)
    * explode to +1/−1 boundary events, a running sum over the global
    * boundary order gives instantaneous concurrency, and the per-day max
    * is the capacity-planning gauge. Tie order is explicit (ends sort
    * before starts at the same instant, then user/session ids), so the
    * gauge is deterministic. The ordered prefix sum runs on the boundary
    * set (2 rows per session, ≪ events); at extreme scale it becomes the
    * classic two-phase parallel prefix (per-partition sums + offsets).
    */
  def q181MaxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val iv = gapsIslands(Tables.events(spark, dir), 30L * 60 * 1000)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("st"),
        (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("en"))
    val bounds = iv.select(col("st").as("t"), lit(1L).as("delta"), lit(1).as("ord"),
        col("user_id"), col("session_idx"))
      .union(iv.select(col("en").as("t"), lit(-1L).as("delta"), lit(0).as("ord"),
        col("user_id"), col("session_idx")))
    val sweep = Window.orderBy(col("t"), col("ord"), col("user_id"), col("session_idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bounds
      .withColumn("conc", sum(col("delta")).over(sweep))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("conc")).as("max_concurrent"))
      .orderBy(col("day"))
  }

  val q181Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |m AS (SELECT user_id, ts, event_id,
       |        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |               OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
       |             THEN 1 ELSE 0 END AS brk
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (SELECT user_id, ts,
       |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS UNBOUNDED PRECEDING) AS sid
       |      FROM m),
       |iv AS (SELECT user_id, sid, min(ts) AS st,
       |         max(ts) + INTERVAL 30 MINUTE AS en
       |       FROM s GROUP BY 1, 2),
       |b AS (SELECT st AS t, 1 AS delta, 1 AS ord, user_id, sid FROM iv
       |      UNION ALL SELECT en, -1, 0, user_id, sid FROM iv),
       |r AS (SELECT t, CAST(sum(delta) OVER (ORDER BY t, ord, user_id, sid
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM b)
       |SELECT CAST(t AS DATE) AS day, max(conc) AS max_concurrent
       |FROM r GROUP BY 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q182

  /** Triangular weighted moving average: per user, WMA-5 over the event
    * values with integer weights 5..1 — numerator and denominator are
    * EXACT integers (milli-quantized values × small weights via explicit
    * lag terms), the smoothed value one IEEE division. Rows without 4
    * priors stay unsmoothed (NULL den) and are counted separately. The
    * recency-weighted smoother feature pipelines prefer over plain moving
    * averages.
    */
  def q182WeightedMa(spark: SparkSession, dir: String): DataFrame = {
    val w = byUser
    val vm = floor(col("value") * 1000).cast("long")
    val smoothed = Tables.events(spark, dir)
      .withColumn("vm", vm)
      .withColumn("num",
        lit(5) * col("vm") + lit(4) * lag(col("vm"), 1).over(w) +
          lit(3) * lag(col("vm"), 2).over(w) + lit(2) * lag(col("vm"), 3).over(w) +
          lag(col("vm"), 4).over(w))
      .withColumn("wma_milli",
        when(col("num").isNotNull, col("num").cast("double") / 15.0))
    smoothed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("wma_milli").isNotNull, 1L).otherwise(0L)).as("n_smoothed"),
        sum(col("num")).as("sum_num_exact"))
      .orderBy(col("event_type"))
  }

  val q182Oracle: String =
    s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
       |             CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
       |w AS (SELECT event_type,
       |        5*vm + 4*lag(vm, 1) OVER win + 3*lag(vm, 2) OVER win +
       |          2*lag(vm, 3) OVER win + lag(vm, 4) OVER win AS num
       |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_type, count(*) AS n_events,
       |  CAST(sum(CASE WHEN num IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_smoothed,
       |  CAST(sum(num) AS BIGINT) AS sum_num_exact
       |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q183

  /** Week-over-week comparator: each day's order count and revenue against
    * the same weekday one week earlier (lag 7 over the daily series) —
    * integer deltas plus an exact-IEEE ratio, NULL-ratio-safe for the
    * first week. The seasonality-aware reporting twin of q173's anomaly
    * monitor.
    */
  def q183WeekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice")).cast("long")).as("rev"))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("n_prev", lag(col("n"), 7).over(w))
      .withColumn("rev_prev", lag(col("rev"), 7).over(w))
      .where(col("n_prev").isNotNull)
      .select(col("day"), col("n"), col("n_prev"),
        (col("n") - col("n_prev")).as("n_delta"),
        (col("rev") - col("rev_prev")).as("rev_delta"),
        (col("rev").cast("double") / col("rev_prev").cast("double")).as("rev_ratio"))
      .orderBy(col("day"))
  }

  val q183Oracle: String =
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
      |             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
      |           FROM orders GROUP BY 1),
      |l AS (SELECT day, n, rev, lag(n, 7) OVER (ORDER BY day) AS n_prev,
      |        lag(rev, 7) OVER (ORDER BY day) AS rev_prev FROM d)
      |SELECT day, n, n_prev, n - n_prev AS n_delta, rev - rev_prev AS rev_delta,
      |  CAST(rev AS DOUBLE) / CAST(rev_prev AS DOUBLE) AS rev_ratio
      |FROM l WHERE n_prev IS NOT NULL ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q184

  /** Order inter-arrival statistics per customer — the renewal-process
    * features (how often does this entity come back) behind churn and LTV
    * models: per-customer gap count, min/max gap in whole days, and total
    * gap seconds, all from integer microsecond differences over one lag
    * window. Summary rolls up the per-customer stats to a corpus-level
    * distribution (exact integer sums).
    */
  def q184InterArrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ts"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ts"), col("o_orderkey"))
      .withColumn("du", expr("unix_micros(ts) - unix_micros(lag(ts, 1) OVER " +
        "(PARTITION BY o_custkey ORDER BY ts, o_orderkey))"))
      .where(col("du").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("CAST(min(du) div 86400000000 AS BIGINT)").as("min_gap_days"),
        expr("CAST(max(du) div 86400000000 AS BIGINT)").as("max_gap_days"),
        expr("CAST(sum(du) div 1000000 AS BIGINT)").as("total_gap_sec"))
    gaps.agg(count(lit(1)).as("n_customers"), sum(col("n_gaps")).as("total_gaps"),
        min(col("min_gap_days")).as("min_gap_days"),
        max(col("max_gap_days")).as("max_gap_days"),
        sum(col("total_gap_sec")).as("sum_gap_sec"))
  }

  val q184Oracle: String =
    """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts, o_orderkey
      |           FROM orders),
      |l AS (SELECT o_custkey,
      |        epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY o_custkey
      |          ORDER BY ts, o_orderkey)) AS du
      |      FROM o),
      |g AS (SELECT o_custkey, count(*) AS n_gaps,
      |        CAST(min(du) // 86400000000 AS BIGINT) AS min_gap_days,
      |        CAST(max(du) // 86400000000 AS BIGINT) AS max_gap_days,
      |        CAST(sum(du) // 1000000 AS BIGINT) AS total_gap_sec
      |      FROM l WHERE du IS NOT NULL GROUP BY 1)
      |SELECT count(*) AS n_customers, CAST(sum(n_gaps) AS BIGINT) AS total_gaps,
      |  min(min_gap_days) AS min_gap_days, max(max_gap_days) AS max_gap_days,
      |  CAST(sum(total_gap_sec) AS BIGINT) AS sum_gap_sec
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q191

  /** Session bookends: how sessions open and close — the (first event type
    * → last event type) transition matrix over multi-event sessions, the
    * entry/exit-page analysis of product analytics. First/last come from
    * two frame-pinned windows over the sessionized rows (q125 machinery);
    * single-event sessions are excluded (their bookends are trivially
    * equal).
    */
  def q191SessionBookends(spark: SparkSession, dir: String): DataFrame = {
    val sess = gapsIslands(Tables.events(spark, dir), 30L * 60 * 1000)
    val w = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sess
      .withColumn("first_t", first(col("event_type")).over(full))
      .withColumn("last_t", last(col("event_type")).over(full))
      .withColumn("len", count(lit(1)).over(full))
      .where(col("len") >= 2)
      .groupBy(col("user_id"), col("session_idx"), col("first_t"), col("last_t"))
      .agg(count(lit(1)).as("dummy"))
      .groupBy(col("first_t"), col("last_t"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("first_t"), col("last_t"))
  }

  val q191Oracle: String =
    s"""WITH e AS (${Det.EventsSql}),
       |m AS (SELECT user_id, event_type, ts, event_id,
       |        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
       |               OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
       |             THEN 1 ELSE 0 END AS brk
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (SELECT user_id, event_type, ts, event_id,
       |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS UNBOUNDED PRECEDING) AS sid
       |      FROM m),
       |bk AS (SELECT user_id, sid,
       |         first_value(event_type) OVER win AS first_t,
       |         last_value(event_type) OVER win AS last_t,
       |         count(*) OVER win AS len
       |       FROM s
       |       WINDOW win AS (PARTITION BY user_id, sid ORDER BY ts, event_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       |u AS (SELECT DISTINCT user_id, sid, first_t, last_t FROM bk WHERE len >= 2)
       |SELECT first_t, last_t, count(*) AS n_sessions
       |FROM u GROUP BY 1, 2 ORDER BY first_t, last_t""".stripMargin

  // ---------------------------------------------------------------- q192

  /** Fulfillment SLA attainment: per order priority, the share of orders
    * whose LAST lineitem shipped within 60 days of the order date —
    * integer date arithmetic over the header⋈detail join (co-partitioned
    * on the order key at scale), integer counts, one IEEE ratio. The
    * operational-compliance metric header↔detail data exists to answer.
    */
  def q192SlaAttainment(spark: SparkSession, dir: String): DataFrame = {
    val lastShip = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
    Tables.orders(spark, dir)
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("lead_days",
        datediff(col("last_ship"), to_date(col("o_orderdate"))).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("lead_days") <= 60, 1L).otherwise(0L)).as("n_met"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_met"),
        (col("n_met").cast("double") / col("n_orders").cast("double")).as("sla_rate"))
      .orderBy(col("o_orderpriority"))
  }

  val q192Oracle: String =
    """WITH s AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
      |           FROM lineitem GROUP BY 1),
      |j AS (SELECT o_orderpriority,
      |        CAST(last_ship - CAST(o_orderdate AS DATE) AS BIGINT) AS lead_days
      |      FROM orders JOIN s ON o_orderkey = l_orderkey)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN lead_days <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_met,
      |  CAST(sum(CASE WHEN lead_days <= 60 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE) AS sla_rate
      |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q138

  /** Exponentially time-decayed revenue per customer (half-life = 1 year):
    * the recency-weighted score feature pipelines derive per entity. The
    * decay is computed ENTIRELY in integers — cents × 2^(maxAge − age)
    * shifts, summed exactly, one final division by the constant scale —
    * because the naive form (price · 0.5^age summed as doubles) is a
    * shuffle-order lottery AND double→decimal casts of long-mantissa
    * products diverge between engines (Det notes). Broadcast scalar max
    * year; map-only weighting; one partial+final aggregation.
    */
  def q138DecayedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val maxy = o.agg(max(year(col("o_orderdate"))).as("ymax"))
    o.crossJoin(broadcast(maxy))
      .withColumn("age", col("ymax") - year(col("o_orderdate"))) // 0..~7
      .withColumn("w_scaled",
        expr("shiftleft(CAST(1 AS BIGINT), 7 - CAST(age AS INT))"))
      .withColumn("cents", floor(col("o_totalprice") * 100.0).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents") * col("w_scaled")).as("scaled"))
      .select(col("o_custkey"), col("n_orders"),
        (col("scaled").cast("double") / 12800.0).as("decayed_revenue"))
      .orderBy(col("o_custkey"))
  }

  val q138Oracle: String =
    """WITH m AS (SELECT max(CAST(year(o_orderdate) AS INT)) AS ymax FROM orders),
      |w AS (
      |  SELECT o_custkey,
      |    CAST(floor(o_totalprice * 100.0) AS BIGINT) *
      |      (CAST(1 AS BIGINT) << (7 - (ymax - CAST(year(o_orderdate) AS INT)))) AS sw
      |  FROM orders CROSS JOIN m)
      |SELECT o_custkey, count(*) AS n_orders,
      |  CAST(CAST(sum(sw) AS BIGINT) AS DOUBLE) / 12800.0 AS decayed_revenue
      |FROM w GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
}
