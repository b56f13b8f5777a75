package graft.operators


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Typed `Dataset[T]` surface: case-class encoders, typed filter/map, then a
  * hand-off to the relational aggregation path (the idiomatic hybrid — typed
  * logic where type safety helps, Catalyst aggregation where codegen wins;
  * typed lambdas are opaque to the optimizer, so the scan-side filter is also
  * expressed as a Column to keep parquet pushdown).
  */
object TypedOps {

  final case class OrderRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double)

  def q50TypedPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .where(col("o_totalprice") > 100000) // Column form → pushed to the scan
      .as[OrderRow]
    ds.filter(o => o.o_totalprice > 100000) // typed guard (same predicate)
      .map(o => (o.o_orderstatus, o.o_totalprice))
      .toDF("status", "price")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("price")).as("sum_price"))
      .orderBy(col("status"))
  }

  val q50Oracle: String =
    s"""SELECT o_orderstatus AS status, count(*) AS cnt,
       |  ${Det.dsumSql("o_totalprice")} AS sum_price
       |FROM orders WHERE o_totalprice > 100000
       |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  final case class CustOrder(o_custkey: Long, o_orderkey: Long,
      ms: Long, o_totalprice: Double)

  /** Longest strictly-increasing price run per customer via
    * `flatMapGroups` — the typed per-group escape hatch (the Scala sibling
    * of applyInPandas): arbitrary sequential logic over one group's rows,
    * here an in-memory sort + linear scan. Bounded per-customer history
    * keeps a group in one task's memory (same contract as q130's
    * collect_list); the oracle proves the imperative scan equivalent to
    * the relational gaps-and-islands formulation — which is exactly the
    * judgment call this operator documents: use flatMapGroups when the
    * per-group logic stops being expressible as windows, accept that
    * Catalyst cannot see inside it.
    */
  def q135LongestRun(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"), col("o_totalprice"))
      .as[CustOrder]
      .groupByKey(_.o_custkey)
      .flatMapGroups { (custkey: Long, it: Iterator[CustOrder]) =>
        val rows = it.toArray.sortBy(r => (r.ms, r.o_orderkey))
        var best = 0; var cur = 0; var prev = Double.NegativeInfinity
        rows.foreach { r =>
          cur = if (r.o_totalprice > prev) cur + 1 else 1
          if (cur > best) best = cur
          prev = r.o_totalprice
        }
        Iterator.single((custkey, rows.length, best))
      }
      .toDF("o_custkey", "n_orders", "longest_increasing_run")
      .orderBy(col("o_custkey"))
  }

  val q135Oracle: String =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey,
      |    CASE WHEN lag(o_totalprice) OVER w IS NULL
      |           OR o_totalprice <= lag(o_totalprice) OVER w THEN 1 ELSE 0 END AS brk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |runs AS (
      |  SELECT o_custkey,
      |    sum(brk) OVER (PARTITION BY o_custkey ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM (SELECT o_custkey, brk, row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate, o_orderkey) AS rn FROM seq))
      |SELECT o_custkey, CAST(sum(run_len) AS INT) AS n_orders,
      |  CAST(max(run_len) AS INT) AS longest_increasing_run
      |FROM (SELECT o_custkey, run_id, count(*) AS run_len
      |      FROM runs GROUP BY o_custkey, run_id) rl
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q206

  /** ts carried as epoch MICROSECONDS (unix_micros) so the per-user sort is
    * exactly the µs-precision (ts, event_id) order the oracle's window uses —
    * a java.sql.Timestamp getTime sort would collapse to milliseconds.
    */
  final case class CusumEvent(user_id: Long, tsu: Long, event_id: Long, x: Long)

  /** One-sided CUSUM changepoint monitor per user: the cumulative-sum
    * recursion s_i = max(0, s_{i-1} + x_i − k) over the event stream
    * (x = value in integer cents, k = 3459 the corpus median, alarm at
    * s > 50000). The recursion is inherently sequential per key — the one
    * shape window frames cannot express — so it runs as `mapGroups` over
    * `groupByKey(user_id)`: one shuffle on the key, then a linear in-memory
    * walk per user (a user's event history is the documented per-group bound,
    * same as every sessionization op; an unbounded key would stream through
    * flatMapGroupsWithState instead — see streaming/StreamingOps). All
    * arithmetic is 64-bit integer; the DuckDB oracle replays the identical
    * recursion as a recursive CTE, so the hash match proves the typed path
    * and the relational path agree step for step.
    */
  def q206CusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 3459L
    val h = 50000L
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"),
        floor(col("value") * 100).cast("long").as("x"))
      .as[CusumEvent]
      .groupByKey(_.user_id)
      .mapGroups { (uid: Long, it: Iterator[CusumEvent]) =>
        val evs = it.toArray.sortBy(e => (e.tsu, e.event_id))
        var s = 0L
        var alarms = 0L
        var maxS = 0L
        evs.foreach { e =>
          s = math.max(0L, s + e.x - k)
          if (s > h) alarms += 1
          if (s > maxS) maxS = s
        }
        (uid, alarms, maxS)
      }
      .toDF("user_id", "n_alarms", "max_cusum")
      .orderBy(col("user_id"))
  }

  val q206Oracle: String =
    s"""WITH RECURSIVE e AS (${Det.EventsSql}),
       |ev AS (SELECT user_id, event_id, CAST(floor(value*100) AS BIGINT) AS x,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |       FROM e),
       |walk(user_id, rn, s) AS (
       |  SELECT user_id, rn, greatest(0, x - 3459) FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT ev.user_id, ev.rn, greatest(0, walk.s + ev.x - 3459)
       |  FROM walk JOIN ev ON ev.user_id = walk.user_id AND ev.rn = walk.rn + 1)
       |SELECT user_id,
       |  CAST(sum(CASE WHEN s > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       |  max(s) AS max_cusum
       |FROM walk GROUP BY user_id ORDER BY user_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q50_typed_pipeline", q50TypedPipeline, q50Oracle),
    GraftQuery.sql("q135_longest_run", q135LongestRun, q135Oracle),
    GraftQuery.sql("q206_cusum_changepoint", q206CusumChangepoint, q206Oracle)
  )
}
