package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Fixed-point (all-integer) PageRank over the bipartite part↔supplier
  * graph derived from lineitem.
  *
  * Why fixed-point: floating-point PageRank is a hash lottery — per-node
  * contribution sums are order-dependent doubles. Instead ranks live as
  * 64-bit integers scaled by 10^12 and every update is integer-only:
  *
  *   R0(u)   = SCALE div N
  *   C(u)    = R(u) div deg(u)               (deg ≥ 1 by construction)
  *   R'(u)   = (3·(SCALE div N)) div 20  +  (17 · Σ_{v→u} C(v)) div 20
  *
  * i.e. damping 0.85 = 17/20 as exact integer multiply-then-divide. Both
  * engines floor identical non-negative integers, so three iterations are
  * bit-reproducible with no decimal detour. Rank mass stays ≤ SCALE = 10^12,
  * so 17·Σ ≤ 1.7·10^13 — no 64-bit overflow anywhere.
  *
  * Scale shape: edges/degrees/ranks are all keyed by node id; each
  * iteration is one shuffle join (edges ⋈ ranks, same key) plus one
  * aggregation by dst. On a real cluster the edge table would be bucketed
  * by src once so the per-iteration join is exchange-free; degrees join
  * ranks map-side after the first co-partition. Iteration count is fixed
  * (3), so the lineage stays shallow — no checkpoint needed.
  */
object GraphRank {

  private val SCALE = 1000000000000L // 10^12

  def q143FixedPointPagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    // localCheckpoint: the derived edge set feeds deg + every iteration +
    // the node count — materialize the distinct once instead of re-running
    // the lineitem scan/shuffle per consumer (bench hygiene reclaims it).
    val edges = pairs.select((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .union(pairs.select((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count() // node count: every node has out-edges (bipartite symmetric)
    val base = 3L * (SCALE / n) / 20L
    var ranks = deg.select(col("src").as("node"), lit(SCALE / n).as("r"))
    for (_ <- 1 to 3) {
      // rename before joining: edges/deg/ranks share lineage, and explicit
      // names sidestep ambiguous-self-join resolution in the loop.
      // broadcast hints: the rank/degree tables are O(nodes) — tiny next to
      // the edge set here, so each iteration is one map-side join plus one
      // aggregation shuffle. (A web-scale graph where ranks don't fit a
      // broadcast would drop the hints and co-partition edges and ranks on
      // the node key instead — same plan minus the broadcast.)
      val contrib = ranks.join(broadcast(deg.select(col("src").as("cnode"), col("deg"))),
          col("node") === col("cnode"))
        .select(col("cnode"), expr("r div deg").as("c"))
      ranks = edges.join(broadcast(contrib), col("src") === col("cnode"))
        .groupBy(col("dst"))
        .agg(expr(s"$base + (17 * sum(c)) div 20").as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    ranks
      .withColumn("node_type",
        when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier")))
      .select(col("node").as("node_id"), col("node_type"), col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("node_id"))
      .limit(50)
  }

  val q143Oracle: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
      |e AS (SELECT p*2 AS src, s*2+1 AS dst FROM pairs
      |      UNION ALL SELECT s*2+1, p*2 FROM pairs),
      |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |n AS (SELECT count(*) AS nn FROM d),
      |r0 AS (SELECT src AS node, 1000000000000 // nn AS r FROM d, n),
      |r1 AS (SELECT e.dst AS node,
      |         (3*(1000000000000 // nn)) // 20 + (17 * sum(r.r // d.deg)) // 20 AS r
      |       FROM e JOIN r0 r ON e.src = r.node JOIN d ON e.src = d.src, n
      |       GROUP BY e.dst, nn),
      |r2 AS (SELECT e.dst AS node,
      |         (3*(1000000000000 // nn)) // 20 + (17 * sum(r.r // d.deg)) // 20 AS r
      |       FROM e JOIN r1 r ON e.src = r.node JOIN d ON e.src = d.src, n
      |       GROUP BY e.dst, nn),
      |r3 AS (SELECT e.dst AS node,
      |         (3*(1000000000000 // nn)) // 20 + (17 * sum(r.r // d.deg)) // 20 AS r
      |       FROM e JOIN r2 r ON e.src = r.node JOIN d ON e.src = d.src, n
      |       GROUP BY e.dst, nn)
      |SELECT node AS node_id,
      |  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
      |  CAST(r AS BIGINT) AS rank_fp
      |FROM r3
      |ORDER BY rank_fp DESC, node_id
      |LIMIT 50""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q143_fixed_point_pagerank", q143FixedPointPagerank, q143Oracle)
  )
}
