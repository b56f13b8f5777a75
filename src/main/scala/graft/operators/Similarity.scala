package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Similarity search over the embeddings table (ArrayType(FloatType)).
  *
  * q40: brute-force cosine top-k — the exact baseline; query side broadcast,
  *      candidate side streamed, so it scales to any candidate count.
  * q41: all-pairs cosine near-dup — the quadratic exact baseline.
  * q42: random-hyperplane LSH signatures — the 100 TB path: bucket by
  *      signature, compare only within buckets (q42 materializes the
  *      signatures + bucket sizes; the bucket self-join mirrors q34's).
  *
  * All dot products are sequential left folds in double (see Det), so DuckDB
  * reproduces every cosine bit-for-bit.
  */
object Similarity {

  /** embeddings enriched with the squared L2 norm (codegen'd kernel; same
    * sequential fold — and therefore the same bits — as the HOF reference and
    * the DuckDB oracle).
    */
  private[operators] def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding", "float_vec_dot(embedding, embedding) AS n2")

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 10). */
  def q40CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val cand = withNorm(spark, dir)
    val queries = cand.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    cand.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("dot", expr("float_vec_dot(q_emb, embedding)"))
      .withColumn("cos", col("dot") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  val q40Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings)
       |SELECT q_id, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      ${Det.dotSql("q.embedding", "c.embedding")} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |    FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id))
       |WHERE rn <= 5 ORDER BY q_id, neighbor_id""".stripMargin

  /** Cosine near-duplicates within label blocks (cos ≥ 0.4 on this corpus).
    * Label blocking turns the O(n²) all-pairs scan into an equi-join on the
    * block key — the shuffle-partitionable shape that survives scale (swap
    * `label` for an LSH bucket from q42 when no natural block key exists).
    */
  def q41EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "embedding", "float_vec_dot(embedding, embedding) AS n2")
    val a = n.select(col("vec_id").as("vec_a"), col("label").as("label_a"),
      col("embedding").as("emb_a"), col("n2").as("n2_a"))
    val b = n.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("embedding").as("emb_b"), col("n2").as("n2_b"))
    a.join(b, col("label_a") === col("label_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos",
        expr("float_vec_dot(emb_a, emb_b)") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
      .where(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q41Oracle: String =
    s"""WITH n AS (SELECT vec_id, label, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings)
       |SELECT vec_a, vec_b, cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${Det.dotSql("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
       |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** Bits in the LSH signature. */
  private val SigBits = 16

  /** Spark SQL expr: signed projection of the embedding onto deterministic
    * integer hyperplane j (weights in [−3, 3] from a fixed affine formula).
    * The index range is driven off size(embedding) — any dimensionality
    * projects correctly instead of zip_with null-padding every signature to 0.
    */
  private[graft] def projExpr(j: Int): String =
    s"aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), (x, i) -> " +
      s"CAST(((i * 31 + $j * 17) % 7) - 3 AS DOUBLE) * CAST(x AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def projSql(j: Int): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || [CAST(((i * 31 + $j * 17) % 7) - 3 AS DOUBLE) " +
      s"* CAST(embedding[i + 1] AS DOUBLE) for i in range(0, len(embedding))], (acc, v) -> acc + v)"

  /** Random-hyperplane LSH signatures + bucket occupancy. The signature is
    * one codegen-registered pass (graft.functions.HyperplaneSig) — same
    * sequential fold bits as the HOF chain and the DuckDB twin ([[projSql]]).
    */
  def q42AnnLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("sig"))
    Tables.embeddings(spark, dir)
      .withColumn("sig", expr(s"hyperplane_sig(embedding, $SigBits)"))
      .withColumn("bucket_size", count(lit(1)).over(w))
      .select("vec_id", "sig", "bucket_size")
      .orderBy(col("vec_id"))
  }

  val q42Oracle: String = {
    val sig = (0 until SigBits)
      .map(j => s"(CASE WHEN ${projSql(j)} >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT vec_id, sig, count(*) OVER (PARTITION BY sig) AS bucket_size
       |FROM (SELECT vec_id, $sig AS sig FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }

  /** LSH-bucketed ANN search — the scale path for q40: queries join
    * candidates on an 8-bit hyperplane signature (an EQUI join on the bucket
    * key, so candidate generation shuffles instead of cross-joining), then
    * exact cosine ranks within the bucket. Recall is approximate by design;
    * the oracle replays the identical deterministic bucketing.
    */
  def q47AnnBucketSearch(spark: SparkSession, dir: String): DataFrame = {
    val sigged = Tables.embeddings(spark, dir)
      .withColumn("n2", expr("float_vec_dot(embedding, embedding)"))
      .withColumn("sig8", expr("hyperplane_sig(embedding, 8)"))
    val queries = sigged.where(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("sig8").as("q_sig"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    sigged.join(queries, col("sig8") === col("q_sig") && col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  val q47Oracle: String = {
    val sig = (0 until 8)
      .map(j => s"(CASE WHEN ${projSql(j)} >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH s AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2, $sig AS sig8 FROM embeddings)
       |SELECT q_id, neighbor_id, cos FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |      ${Det.dotSql("q.embedding", "c.embedding")} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |    FROM s q JOIN s c ON q.vec_id < 50 AND c.sig8 = q.sig8 AND c.vec_id <> q.vec_id))
       |WHERE rn <= 3 ORDER BY q_id, neighbor_id""".stripMargin
  }

  /** IVF-style ANN: a fixed coarse quantizer (the 8 lowest-id vectors stand
    * in for trained centroids) assigns every vector to its nearest cell via
    * ‖x−c‖² = x·x − 2·x·c + c·c; queries then search ONLY their own cell —
    * an equi-join on the cell id, the IVF scale path (nprobe=1). At 100 TB
    * the centroid set broadcasts and cell assignment is map-only.
    */
  /** The fixed coarse quantizer: the 8 lowest-id vectors of the corpus stand
    * in for trained centroids (a real pipeline trains them offline on a
    * sample; the assignment path is identical either way).
    */
  private[graft] def ivfCentroids(base: DataFrame): DataFrame =
    base.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))

  /** Nearest-centroid cell assignment via ‖x−c‖² = x·x − 2·x·c + c·c:
    * centroids broadcast, so assignment is map-only at any corpus size.
    * Shared by the in-flight ANN (q67/q84/q216) and the persistent
    * catalog-table index (q246) so both paths assign identically.
    */
  private[graft] def ivfAssign(base: DataFrame, cents: DataFrame): DataFrame =
    // argmin as a min_by AGGREGATION, not a rank window (r14 opt): the
    // window form shuffled all |centroids|× rows and sorted them; min_by
    // partial-aggregates MAP-SIDE (the crossJoin output is partition-local,
    // so the K× amplification collapses before the exchange) and never
    // sorts. The (dist2, c_id) struct order is the window's exact
    // (asc dist2, asc c_id) total order, so the chosen cell is identical.
    base.crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.functions.min_by(
        struct(col("embedding"), col("n2"), col("c_id")),
        struct(col("dist2"), col("c_id"))).as("_best"))
      .select(col("vec_id"), col("_best.embedding").as("embedding"),
        col("_best.n2").as("n2"), col("_best.c_id").as("cell"))

  /** Top-3 in-cell neighbors for the query vectors (vec_id < 20) over ANY
    * table of cell assignments (vec_id, embedding, n2, cell) — shared by
    * the in-flight ANN (q67), the catalog-table index probe (q246), and
    * the streaming-maintained SegmentedIndex probe, so all three serving
    * faces compute bit-identical answers.
    */
  private[graft] def ivfProbe(assigned: DataFrame): DataFrame = {
    val queries = assigned.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("cell").as("q_cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    assigned.join(queries, col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("cell"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  def q67IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    ivfProbe(ivfAssign(base, ivfCentroids(base)))
  }

  /** DuckDB twin of [[ivfCentroids]]+[[ivfAssign]] — the `assigned` CTE
    * shared by every IVF-family oracle (q67, q246, q247).
    */
  private val ivfAssignedCte: String =
    s"""n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, embedding, n2, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.n2, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |    FROM n, cents c)
       |  WHERE crn = 1)""".stripMargin

  val q67Oracle: String =
    s"""WITH $ivfAssignedCte
       |SELECT q_id, cell, neighbor_id, cos FROM (
       |  SELECT q.vec_id AS q_id, a.cell, a.vec_id AS neighbor_id,
       |    ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) DESC,
       |      a.vec_id) AS rn
       |  FROM assigned q JOIN assigned a
       |    ON q.vec_id < 20 AND a.cell = q.cell AND a.vec_id <> q.vec_id)
       |WHERE rn <= 3 ORDER BY q_id, neighbor_id""".stripMargin

  /** IVF-cell-blocked embedding near-dup — the no-natural-block-key scale
    * path for q41's label-blocked pair scan: when no label exists, the IVF
    * cell assignment IS the block key, so the pair comparison is an
    * equi-join on `cell` (candidates bounded by the largest cell — tunable
    * by raising the centroid count) instead of all-pairs. Misses only
    * cross-cell pairs, exactly the nprobe=1 recall semantics q216 audits.
    * This is the embedding-space analogue of the text side's MinHash
    * banding (q34): map-only assignment, equi-join candidates, never n².
    */
  def q247IvfBlockedNeardup(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val assigned = ivfAssign(base, ivfCentroids(base))
    val a = assigned.select(col("vec_id").as("vec_a"), col("cell"),
      col("embedding").as("emb_a"), col("n2").as("n2_a"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cell"),
      col("embedding").as("emb_b"), col("n2").as("n2_b"))
    a.join(b, "cell").where(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        expr("float_vec_dot(emb_a, emb_b)") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
      .where(col("cos") >= 0.4)
      .select(col("cell"), col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q247Oracle: String =
    s"""WITH $ivfAssignedCte
       |SELECT cell, vec_a, vec_b, cos FROM (
       |  SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${Det.dotSql("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** Semantic dedup clusters — the embedding-space twin of the text side's
    * q77: the IVF-blocked cosine pair graph (q247) feeds the SAME
    * pointer-jumping CC kernel ([[Dedup.ccFromPairs]]), labeling each
    * near-duplicate group with its min vec_id; the representative (the one
    * row a curated corpus keeps per semantic group) is the label holder.
    * This is the SemDeDup-style pipeline stage: cluster semantically
    * redundant documents by embedding similarity, keep one per cluster —
    * candidates from cell-blocked equi-joins, log-round CC, never n².
    */
  def q249SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q247IvfBlockedNeardup(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val w = Window.partitionBy(col("cluster_id"))
    Dedup.ccFromPairs(pairs)
      .select(col("id").as("vec_id"), col("comp").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_rep", col("vec_id") === col("cluster_id"))
      .orderBy(col("vec_id"))
  }

  val q249Oracle: String =
    s"""WITH RECURSIVE $ivfAssignedCte,
       |pairs AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |      ${Det.dotSql("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
       |    FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |  WHERE cos >= 0.4),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
       |          UNION ALL SELECT vec_b, vec_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
       |comps AS (SELECT id, min(comp) AS cluster_id FROM reach GROUP BY id)
       |SELECT id AS vec_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  id = cluster_id AS is_rep
       |FROM comps ORDER BY vec_id""".stripMargin

  /** Per-label centroids (first 8 dimensions): element-wise mean via
    * posexplode + sorted sequential fold — sorting the per-group values
    * before a left-to-right double fold makes the sum order-deterministic
    * under any partitioning, without casting float-derived doubles to
    * decimal (which diverges between engines past ~15 digits).
    *
    * This sorted-fold form is the ORACLE TWIN (cross-engine bit-exact);
    * production uses [[labelCentroidsScale]], whose two-phase partial sums
    * never materialize a group in one reducer. q83 proves on the corpus that
    * the two agree to float precision.
    */
  def q68LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .where(col("pos") < 8)
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        expr("aggregate(array_sort(collect_list(CAST(x AS DOUBLE))), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("dim_sum"))
      .withColumn("centroid", col("dim_sum") / col("n").cast("double"))
      .select("label", "pos", "n", "centroid")
      .orderBy(col("label"), col("pos"))

  val q68Oracle: String =
    """SELECT label, pos, n, dim_sum / CAST(n AS DOUBLE) AS centroid FROM (
      |  SELECT label, s.i - 1 AS pos, count(*) AS n,
      |    list_reduce([CAST(0 AS DOUBLE)] || list(CAST(s.x AS DOUBLE) ORDER BY CAST(s.x AS DOUBLE)),
      |                (acc, v) -> acc + v) AS dim_sum
      |  FROM (SELECT label,
      |          unnest([{'i': i, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS s
      |        FROM embeddings)
      |  WHERE s.i <= 8
      |  GROUP BY label, s.i)
      |ORDER BY label, pos""".stripMargin

  /** The 100 TB path for per-label centroids: ordinary two-phase aggregation
    * (map-side partial sums, then a final merge per (label, pos) key) — no
    * collect_list, so a hot label never materializes its whole group in one
    * reducer. Float→double widening is exact and the embedding magnitudes are
    * O(1), so the partial-sum result differs from the sorted sequential fold
    * by at most ~n·ε·max|x| (≈1e-10 at n=10^6) — q83 asserts that bound on
    * the corpus against the deterministic twin.
    */
  def labelCentroidsScale(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .where(col("pos") < 8)
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast("double")).as("scale_sum"))
      .withColumn("centroid_scale", col("scale_sum") / col("n").cast("double"))
      .select("label", "pos", "n", "centroid_scale")

  /** Scale-vs-deterministic centroid agreement: the partial-sum production
    * path must land within float-noise tolerance of the sorted-fold oracle
    * twin on every (label, pos). The DuckDB side runs the same experiment
    * with ITS native (order-arbitrary) sum(double), so the hash-matched
    * boolean verifies the tolerance contract in both engines.
    */
  def q83CentroidScale(spark: SparkSession, dir: String): DataFrame = {
    val det = q68LabelCentroids(spark, dir).select(col("label"), col("pos"),
      col("n"), col("centroid"))
    val sc = labelCentroidsScale(spark, dir).select(col("label"), col("pos"),
      col("centroid_scale"))
    det.join(sc, Seq("label", "pos"))
      .select(col("label"), col("pos"), col("n"),
        (abs(col("centroid") - col("centroid_scale")) < lit(1e-7)).as("within_tol"))
      .orderBy(col("label"), col("pos"))
  }

  val q83Oracle: String =
    """SELECT label, pos, n,
      |  abs(dim_sum / CAST(n AS DOUBLE) - native_sum / CAST(n AS DOUBLE)) < 1e-7 AS within_tol
      |FROM (
      |  SELECT label, s.i - 1 AS pos, count(*) AS n,
      |    list_reduce([CAST(0 AS DOUBLE)] || list(CAST(s.x AS DOUBLE) ORDER BY CAST(s.x AS DOUBLE)),
      |                (acc, v) -> acc + v) AS dim_sum,
      |    sum(CAST(s.x AS DOUBLE)) AS native_sum
      |  FROM (SELECT label,
      |          unnest([{'i': i, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS s
      |        FROM embeddings)
      |  WHERE s.i <= 8
      |  GROUP BY label, s.i)
      |ORDER BY label, pos""".stripMargin

  /** IVF ANN with nprobe=2 — the recall/cost dial: each query searches its
    * TWO nearest cells instead of one. Candidates stay assigned to exactly
    * one cell, queries fan out to two (cell, query) rows, and candidate
    * generation remains an equi-join on the cell id — doubling probe cost,
    * never approaching all-pairs. Compare q67 (nprobe=1) for the recall
    * delta at the same corpus.
    */
  def q84IvfAnnNprobe2(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val cents = base.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(asc("dist2"), asc("c_id"))
    val ranked = base.crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .withColumn("crn", row_number().over(wCell))
    val assigned = ranked.where(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("n2"), col("c_id").as("cell"))
    val queries = ranked.where(col("vec_id") < 20 && col("crn") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("c_id").as("q_cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    assigned.join(queries, col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("cell"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  val q84Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |ranked AS (
       |  SELECT n.vec_id, n.embedding, n.n2, c.c_id,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |  FROM n, cents c),
       |assigned AS (SELECT vec_id, embedding, n2, c_id AS cell FROM ranked WHERE crn = 1),
       |queries AS (SELECT vec_id AS q_id, embedding AS q_emb, n2 AS q_n2, c_id AS q_cell
       |            FROM ranked WHERE vec_id < 20 AND crn <= 2)
       |SELECT q_id, cell, neighbor_id, cos FROM (
       |  SELECT q.q_id, a.cell, a.vec_id AS neighbor_id,
       |    ${Det.dotSql("q.q_emb", "a.embedding")} / (sqrt(q.q_n2) * sqrt(a.n2)) AS cos,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY
       |      ${Det.dotSql("q.q_emb", "a.embedding")} / (sqrt(q.q_n2) * sqrt(a.n2)) DESC,
       |      a.vec_id) AS rn
       |  FROM queries q JOIN assigned a
       |    ON a.cell = q.q_cell AND a.vec_id <> q.q_id)
       |WHERE rn <= 3 ORDER BY q_id, neighbor_id""".stripMargin

  /** Int8 embedding quantization — the storage-scale op: per-vector max-abs
    * scaling to [-127, 127] (the symmetric-quantization scheme vector stores
    * use to cut 100 TB of float32 embeddings to a quarter). Map-only per-row
    * array arithmetic; emitted as the per-vector scale plus integer L1 norm
    * and a positional checksum so the oracle verifies every quantized value
    * without materializing 64-wide integer columns. All arithmetic is
    * IEEE-or-integer exact: float→double widening, one multiply, one divide,
    * floor(x + 0.5) — both engines evaluate the identical op sequence.
    */
  def q95EmbeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs")
      .selectExpr("vec_id", "max_abs",
        "CASE WHEN max_abs = 0.0 THEN transform(embedding, x -> 0) " +
          "ELSE transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5) AS INT)) END AS q")
      .selectExpr("vec_id", "max_abs",
        "aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + CAST(abs(v) AS BIGINT)) AS l1_q",
        "aggregate(zip_with(q, sequence(1, size(q)), (v, i) -> CAST(v AS BIGINT) * i), " +
          "CAST(0 AS BIGINT), (acc, v) -> (acc + v) % 1000000007) AS checksum")
      .orderBy(col("vec_id"))

  val q95Oracle: String =
    """WITH e AS (SELECT vec_id, embedding,
      |  list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS max_abs FROM embeddings),
      |qv AS (SELECT vec_id, max_abs,
      |  CASE WHEN max_abs = 0.0 THEN [0 for x in embedding]
      |       ELSE [CAST(floor(CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5) AS INT)
      |             for x in embedding] END AS q
      |  FROM e)
      |SELECT vec_id, max_abs,
      |  list_reduce([CAST(0 AS BIGINT)] || [CAST(abs(v) AS BIGINT) for v in q],
      |              (a, b) -> a + b) AS l1_q,
      |  list_reduce([CAST(0 AS BIGINT)] || [CAST(q[i] AS BIGINT) * i for i in range(1, len(q) + 1)],
      |              (a, b) -> (a + b) % 1000000007) AS checksum
      |FROM qv ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q258

  /** Product quantization (PQ) with asymmetric-distance (ADC) probing — the
    * FAISS-style vector-compression layer of the ANN family: each 64-dim
    * embedding is split into M=8 subspaces of 8 dims, every subspace is
    * encoded as the id of its nearest codebook centroid (here the
    * subvectors of 16 fixed seed embeddings, vec_id < 16 — a quantizer
    * "trained offline", like q67's IVF centroids), and a query is answered
    * WITHOUT decompressing: the query precomputes its 8×16 subspace
    * distance table once, and each candidate's approximate distance is just
    * 8 table lookups summed — top-20 by ADC distance.
    *
    * Scale shape: encoding is candidates × a 16-row broadcast codebook with
    * a (vec, subspace)-partitioned argmin window (never a global sort);
    * codes are 8 small ints per vector — an 8-byte index over any corpus
    * width; the probe joins codes to a broadcast 128-entry distance table
    * and ranks by TakeOrdered. Compose with IVF cells (q67/q246) for
    * IVF-PQ at 100 TB.
    *
    * Determinism: subspace distances are sequential left folds of squared
    * diffs in slice order (bit-identical across engines); argmin is a
    * row_number over (d2, cid); the 8-term ADC sum folds in subspace order
    * via the array_sort(collect_list(struct)) idiom (q68's oracle-twin
    * form — exact for an 8-element group).
    */
  def q258PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val sub = pqSubDists(emb)
    val codes = pqCodes(sub)
    val dtab = broadcast(sub.where(col("vec_id") === 7)
      .select(col("m").as("qm"), col("cid").as("qcid"), col("d2").as("qd2")))
    codes.join(dtab, col("m") === col("qm") && col("code") === col("qcid"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_sub"),
        expr("aggregate(array_sort(collect_list(struct(m, qd2))), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v.qd2)").as("adc"))
      .where(col("vec_id") =!= 7)
      .orderBy(col("adc"), col("vec_id"))
      .limit(20)
      .select(col("vec_id"), col("n_sub"), col("adc"))
  }

  /** Per-(vector, subspace, codebook-centroid) squared distance — the PQ
    * building block shared by the flat ADC probe (q258) and the IVF-PQ
    * composition (q264). Codebook = subvectors of the 16 seed embeddings,
    * broadcast; distances are sequential left folds in slice order.
    */
  private[graft] def pqSubDists(emb: DataFrame): DataFrame =
    pqSubDistsAgainst(emb, emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cent")))

  /** [[pqSubDists]] against an EXPLICIT codebook — the persisted-index
    * serving path (q303) reads its (cid, cent) rows from a catalog table
    * instead of re-deriving them from the raw embeddings.
    */
  private[graft] def pqSubDistsAgainst(emb: DataFrame, codebook: DataFrame): DataFrame = {
    val seeds = broadcast(codebook.select(col("cid"), col("cent")))
    emb.crossJoin(seeds)
      .select(col("vec_id"), col("cid"), explode(expr(
        "transform(sequence(0, 7), m -> struct(m AS m, " +
          "aggregate(zip_with(slice(embedding, m * 8 + 1, 8), slice(cent, m * 8 + 1, 8), " +
          "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d2))")).as("s"))
      .select(col("vec_id"), col("cid"), col("s.m").as("m"), col("s.d2").as("d2"))
  }

  /** PQ encoding: nearest codebook centroid per (vector, subspace) — a
    * (vec, m)-partitioned argmin window over [[pqSubDists]].
    */
  private[graft] def pqCodes(sub: DataFrame): DataFrame =
    // argmin as min_by (r14 opt — see ivfAssign): map-side partial
    // aggregation collapses the |codebook|× amplification before the
    // exchange and drops the window sort; (d2, cid) struct order == the
    // old (d2, cid) rank order, so codes are identical.
    sub.groupBy(col("vec_id"), col("m"))
      .agg(org.apache.spark.sql.functions.min_by(col("cid"),
        struct(col("d2"), col("cid"))).as("code"))

  /** DuckDB twin of [[pqSubDists]]+[[pqCodes]] — `sub` and `codes` CTEs
    * shared by the q258 and q264 oracles.
    */
  private val pqCtes: String =
    """seeds AS (
      |  SELECT vec_id AS cid, embedding AS cent FROM embeddings WHERE vec_id < 16),
      |sub0 AS (
      |  SELECT e.vec_id, s.cid, e.embedding AS emb, s.cent AS cent,
      |    unnest(range(0, 8)) AS m
      |  FROM embeddings e, seeds s),
      |sub AS (
      |  SELECT vec_id, cid, m,
      |    list_reduce([CAST(0 AS DOUBLE)] ||
      |      [(CAST(emb[m*8+i] AS DOUBLE) - CAST(cent[m*8+i] AS DOUBLE))
      |        * (CAST(emb[m*8+i] AS DOUBLE) - CAST(cent[m*8+i] AS DOUBLE))
      |       for i in range(1, 9)],
      |      (acc, v) -> acc + v) AS d2
      |  FROM sub0),
      |codes AS (
      |  SELECT vec_id, m, cid AS code FROM (
      |    SELECT vec_id, m, cid,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
      |    FROM sub) WHERE rn = 1)""".stripMargin

  val q258Oracle: String =
    s"""WITH $pqCtes,
       |dtab AS (SELECT m AS qm, cid AS qcid, d2 AS qd2 FROM sub WHERE vec_id = 7)
       |SELECT vec_id, count(*) AS n_sub,
       |  list_reduce([CAST(0 AS DOUBLE)] || list(qd2 ORDER BY m), (acc, v) -> acc + v) AS adc
       |FROM codes JOIN dtab ON m = qm AND code = qcid
       |WHERE vec_id <> 7
       |GROUP BY vec_id
       |ORDER BY adc, vec_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q264

  /** IVF-PQ — the full FAISS-style serving stack assembled from its two
    * audited halves: candidate generation by IVF cell (q67's nprobe=1
    * equi-join — touch one cell, not the corpus) and candidate SCORING by
    * PQ asymmetric distance (q258's broadcast distance table — 8 lookups
    * per candidate, never the raw vectors). Per query (vec_id < 20): top-3
    * in-cell neighbors by ADC. At 100 TB the index stores 8 small codes +
    * a cell id per vector — the corpus's float payload is needed neither
    * at index time (codes precompute once) nor at query time.
    *
    * Scale shape: cell assignment map-only (broadcast centroids), the
    * candidate join is the cell equi-join, the per-query distance tables
    * are a 20×128-row broadcast, and the per-(query, neighbor) ADC sum
    * folds in subspace order (the q68 sorted-fold idiom). The exact-rerank
    * upgrade path (re-score the ADC top-k with true distances) is q67
    * itself; q216's recall audit methodology applies unchanged.
    */
  def q264IvfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    // localCheckpoint (r14, the q110 discipline): assigned feeds the query
    // set AND the candidate side — assign cells once.
    val assigned = ivfAssign(base, ivfCentroids(base)).localCheckpoint()
    val sub = pqSubDists(base.select(col("vec_id"), col("embedding")))
      .localCheckpoint() // feeds codes AND the query distance tables
    val codes = pqCodes(sub)
    val queries = assigned.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("cell").as("q_cell"))
    val dtab = broadcast(sub.where(col("vec_id") < 20)
      .select(col("vec_id").as("dq_id"), col("m").as("qm"),
        col("cid").as("qcid"), col("d2").as("qd2")))
    val wTop = Window.partitionBy(col("q_id")).orderBy(asc("adc"), asc("neighbor_id"))
    assigned.select(col("vec_id").as("neighbor_id"), col("cell"))
      .join(queries, col("cell") === col("q_cell") && col("neighbor_id") =!= col("q_id"))
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(dtab, col("q_id") === col("dq_id") && col("m") === col("qm") &&
        col("code") === col("qcid"))
      .groupBy(col("q_id"), col("cell"), col("neighbor_id"))
      .agg(expr("aggregate(array_sort(collect_list(struct(m, qd2))), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v.qd2)").as("adc"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("cell"), col("neighbor_id"), col("adc"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  val q264Oracle: String =
    s"""WITH $ivfAssignedCte,
       |$pqCtes,
       |queries AS (SELECT vec_id AS q_id, cell AS q_cell FROM assigned WHERE vec_id < 20),
       |dtab AS (SELECT vec_id AS dq_id, m AS qm, cid AS qcid, d2 AS qd2
       |         FROM sub WHERE vec_id < 20),
       |scored AS (
       |  SELECT q_id, a.cell, a.vec_id AS neighbor_id,
       |    list_reduce([CAST(0 AS DOUBLE)] || list(qd2 ORDER BY qm), (acc, v) -> acc + v) AS adc
       |  FROM assigned a
       |  JOIN queries ON a.cell = q_cell AND a.vec_id <> q_id
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN dtab ON dq_id = q_id AND qm = c.m AND qcid = c.code
       |  GROUP BY q_id, a.cell, a.vec_id)
       |SELECT q_id, cell, neighbor_id, adc FROM (
       |  SELECT q_id, cell, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, neighbor_id) AS rn
       |  FROM scored)
       |WHERE rn <= 3 ORDER BY q_id, neighbor_id""".stripMargin

  // ---------------------------------------------------------------- q282

  /** Hard-negative mining for retrieval/embedding training: for each query
    * vector, the top-3 most-similar candidates whose LABEL DIFFERS — the
    * near-misses a contrastive objective (DPR/Contriever-style) learns the
    * most from, where random negatives are trivially separable. Candidate
    * generation reuses the IVF machinery: cell assignment is map-only
    * against the broadcast quantizer, candidates come from the query's own
    * cell (an equi-join on the cell id — never all-pairs), and the
    * label-mismatch condition is a residual filter on that join. At 100 TB
    * this is the q67 serving shape with one extra predicate; mining depth
    * is the same nprobe dial as q84/q278.
    */
  def q282HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "embedding", "label", "float_vec_dot(embedding, embedding) AS n2")
    val cents = base.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(asc("dist2"), asc("c_id"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("n2"), col("label"),
        col("c_id").as("cell"))
    val queries = assigned.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("label").as("q_label"), col("cell").as("q_cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    assigned.join(queries,
        col("cell") === col("q_cell") && col("label") =!= col("q_label"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("q_label"), col("neighbor_id"),
        col("label").as("neg_label"), col("cos"))
      .orderBy(col("q_id"), col("neighbor_id"))
  }

  val q282Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding, label,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, embedding, label, n2, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.label, n.n2, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |    FROM n, cents c)
       |  WHERE crn = 1)
       |SELECT q_id, q_label, neighbor_id, neg_label, cos FROM (
       |  SELECT q.vec_id AS q_id, q.label AS q_label, a.vec_id AS neighbor_id,
       |    a.label AS neg_label,
       |    ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) DESC,
       |      a.vec_id) AS rn
       |  FROM assigned q JOIN assigned a
       |    ON q.vec_id < 20 AND a.cell = q.cell AND a.label <> q.label)
       |WHERE rn <= 3 ORDER BY q_id, neighbor_id""".stripMargin

  // ---------------------------------------------------------------- q291

  /** Label-noise screen via neighborhood label agreement: for each vector,
    * the fraction of its IVF-cell co-members sharing its label — the
    * cheap kNN-agreement proxy (Confident-Learning-style) a labeling
    * pipeline runs to surface probable mislabels before training. A
    * vector whose cell is dominated by OTHER labels (agreement < 0.2 here)
    * is flagged. Candidate generation is the cell equi-join (per-cell
    * Σ size² work, the standard IVF bound — never all-pairs); agreement
    * is integer counts with one IEEE division.
    */
  def q291LabelAgreement(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "embedding", "label", "float_vec_dot(embedding, embedding) AS n2")
    val cents = base.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(asc("dist2"), asc("c_id"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") === 1)
      .select(col("vec_id"), col("label"), col("c_id").as("cell"))
    val nb = assigned.select(col("vec_id").as("nb_id"), col("label").as("nb_label"),
      col("cell"))
    assigned.join(nb, Seq("cell"))
      .where(col("vec_id") =!= col("nb_id"))
      .groupBy(col("vec_id"), col("label"), col("cell"))
      .agg(count(lit(1)).as("n_nb"),
        sum(when(col("nb_label") === col("label"), 1L).otherwise(0L)).as("n_same"))
      .withColumn("agree", col("n_same").cast("double") / col("n_nb").cast("double"))
      .withColumn("suspect", col("agree") < 0.2)
      .orderBy(col("vec_id"))
  }

  val q291Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding, label,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, label, cell FROM (
       |    SELECT n.vec_id, n.label, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |    FROM n, cents c)
       |  WHERE crn = 1)
       |SELECT vec_id, label, cell, n_nb, n_same,
       |  CAST(n_same AS DOUBLE) / CAST(n_nb AS DOUBLE) AS agree,
       |  CAST(n_same AS DOUBLE) / CAST(n_nb AS DOUBLE) < 0.2 AS suspect
       |FROM (
       |  SELECT a.vec_id, a.label, a.cell, count(*) AS n_nb,
       |    CAST(sum(CASE WHEN b.label = a.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2, 3)
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q298

  /** Recall@3 audit of the nprobe=2 dial (q84's probe shape) against the
    * exact brute-force top-3 — the companion measurement to q216 (which
    * audits nprobe=1): together they give the operator the recall-vs-cost
    * CURVE that decides the production probe setting, not a single point.
    * By candidate-superset construction every per-query recall here
    * dominates q216's (the q278 test pins the same property on the
    * persisted index). Integer overlap counts; recall is one IEEE
    * division per query.
    */
  def q298Nprobe2RecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val queries = base.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    val exact3 = base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("neighbor_id"))
    val ivf2 = q84IvfAnnNprobe2(spark, dir)
      .select(col("q_id"), col("neighbor_id"), lit(1L).as("in_ivf"))
    exact3.join(ivf2, Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("in_ivf"), lit(0L))).as("n_overlap"))
      .select(col("q_id"), col("n_exact"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_exact")).as("recall"))
      .orderBy(col("q_id"))
  }

  val q298Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |exact3 AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) DESC,
       |        a.vec_id) AS rn
       |    FROM n q JOIN n a ON q.vec_id < 20 AND a.vec_id <> q.vec_id)
       |  WHERE rn <= 3),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |ranked AS (
       |  SELECT n.vec_id, n.embedding, n.n2, c.c_id,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |  FROM n, cents c),
       |assigned AS (SELECT vec_id, embedding, n2, c_id AS cell FROM ranked WHERE crn = 1),
       |queries AS (SELECT vec_id AS q_id, embedding AS q_emb, n2 AS q_n2, c_id AS q_cell
       |            FROM ranked WHERE vec_id < 20 AND crn <= 2),
       |ivf AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.q_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        ${Det.dotSql("q.q_emb", "a.embedding")} / (sqrt(q.q_n2) * sqrt(a.n2)) DESC,
       |        a.vec_id) AS rn
       |    FROM queries q JOIN assigned a ON a.cell = q.q_cell AND a.vec_id <> q.q_id)
       |  WHERE rn <= 3)
       |SELECT e.q_id, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN i.q_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |  CAST(sum(CASE WHEN i.q_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS recall
       |FROM exact3 e LEFT JOIN ivf i
       |  ON e.q_id = i.q_id AND e.neighbor_id = i.neighbor_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q298_nprobe2_recall", q298Nprobe2RecallAudit, q298Oracle),
    GraftQuery.sql("q291_label_agreement", q291LabelAgreement, q291Oracle),
    GraftQuery.sql("q282_hard_negatives", q282HardNegatives, q282Oracle),
    GraftQuery.sql("q258_pq_adc", q258PqAdc, q258Oracle),
    GraftQuery.sql("q264_ivfpq_ann", q264IvfPqAnn, q264Oracle),
    GraftQuery.sql("q40_cosine_topk", q40CosineTopk, q40Oracle),
    GraftQuery.sql("q41_embedding_neardup", q41EmbeddingNeardup, q41Oracle),
    GraftQuery.sql("q42_ann_lsh_buckets", q42AnnLshBuckets, q42Oracle),
    GraftQuery.sql("q47_ann_bucket_search", q47AnnBucketSearch, q47Oracle),
    GraftQuery.sql("q67_ivf_ann", q67IvfAnn, q67Oracle),
    GraftQuery.sql("q68_label_centroids", q68LabelCentroids, q68Oracle),
    GraftQuery.sql("q83_centroid_scale", q83CentroidScale, q83Oracle),
    GraftQuery.sql("q84_ivf_ann_nprobe2", q84IvfAnnNprobe2, q84Oracle),
    GraftQuery.sql("q95_embedding_quantize", q95EmbeddingQuantize, q95Oracle),
    GraftQuery.sql("q216_ann_recall_audit", q216AnnRecallAudit, q216Oracle),
    GraftQuery.sql("q247_ivf_blocked_neardup", q247IvfBlockedNeardup, q247Oracle),
    GraftQuery.sql("q249_semantic_dedup", q249SemanticDedup, q249Oracle)
  )

  // ---------------------------------------------------------------- q216

  /** Recall@3 audit of the IVF index (q67, nprobe=1) against the exact
    * brute-force top-3 — the measurement that decides whether an ANN
    * configuration is shippable or needs more probes (q84). Ground truth is
    * the q40 shape (candidate stream × broadcast 20-query set); the ANN side
    * reuses q67's plan verbatim; the overlap join is per-(query, neighbor)
    * equi — integers to the end, recall is one exact division. On this
    * corpus nprobe=1 recall is well under 1, exactly the gap q84's second
    * probe closes — the audit quantifies it.
    */
  def q216AnnRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val base = withNorm(spark, dir)
    val queries = base.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    val exact3 = base.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("neighbor_id"))
    val ivf = q67IvfAnn(spark, dir)
      .select(col("q_id"), col("neighbor_id"), lit(1L).as("in_ivf"))
    exact3.join(ivf, Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("in_ivf"), lit(0L))).as("n_overlap"))
      .select(col("q_id"), col("n_exact"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_exact")).as("recall"))
      .orderBy(col("q_id"))
  }

  val q216Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |exact3 AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) DESC,
       |        a.vec_id) AS rn
       |    FROM n q JOIN n a ON q.vec_id < 20 AND a.vec_id <> q.vec_id)
       |  WHERE rn <= 3),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, embedding, n2, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.n2, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |    FROM n, cents c)
       |  WHERE crn = 1),
       |ivf AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${Det.dotSql("q.embedding", "a.embedding")} / (sqrt(q.n2) * sqrt(a.n2)) DESC,
       |        a.vec_id) AS rn
       |    FROM assigned q JOIN assigned a
       |      ON q.vec_id < 20 AND a.cell = q.cell AND a.vec_id <> q.vec_id)
       |  WHERE rn <= 3)
       |SELECT e.q_id, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |  CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS recall
       |FROM exact3 e LEFT JOIN ivf ON e.q_id = ivf.q_id AND e.neighbor_id = ivf.neighbor_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin
}
