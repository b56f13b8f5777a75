package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Embedding/token statistics beyond search: the k-means training step
  * (Lloyd iteration) over embeddings and corpus-level token co-occurrence
  * association mining.
  */
object VecMore {

  // ---------------------------------------------------------------- q115

  /** One Lloyd (k-means) iteration: assign every embedding to its nearest
    * of the 8 fixed seed centroids (the 8 lowest-id vectors — same coarse
    * quantizer as the IVF index, q67), then recompute per-(cluster, dim)
    * member counts and coordinate sums.
    *
    * The recompute quantizes coordinates to integers (floor(x·1000) after
    * exact float→double widening) so the per-cluster sums are
    * order-independent 64-bit arithmetic — the cross-engine-deterministic
    * stand-in for the float partial sums a production trainer would use
    * (whose tolerance contract q83 already establishes).
    *
    * Scale shape: centroids broadcast, assignment is map-only (distance =
    * one codegen'd dot product per centroid), and the recompute is an
    * ordinary partial+final aggregation on (cluster, dim) — the textbook
    * distributed k-means step. Nothing shuffles except the 8·dims-key agg.
    */
  def q115KmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val base = Similarity.withNorm(spark, dir)
    val cents = base.where(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("n2").as("c_n2"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(asc("dist2"), asc("c_id"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("dist2",
        col("n2") - lit(2.0) * expr("float_vec_dot(embedding, c_emb)") + col("c_n2"))
      .withColumn("crn", row_number().over(wCell))
      .where(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n_members"),
        sum(floor(col("x").cast("double") * 1000.0).cast("long")).as("qsum"))
      .orderBy(col("cell"), col("pos"))
  }

  val q115Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2 FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT n.vec_id, n.embedding, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2.0 * ${Det.dotSql("n.embedding", "c.c_emb")} + c.c_n2, c.c_id) AS crn
       |    FROM n, cents c)
       |  WHERE crn = 1)
       |SELECT cell, s.i - 1 AS pos, count(*) AS n_members,
       |  CAST(sum(CAST(floor(CAST(s.x AS DOUBLE) * 1000.0) AS BIGINT)) AS BIGINT) AS qsum
       |FROM (SELECT cell,
       |        unnest([{'i': i, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS s
       |      FROM assigned)
       |GROUP BY cell, s.i ORDER BY cell, pos""".stripMargin

  // ---------------------------------------------------------------- q116

  /** Token co-occurrence association over the top-20 corpus tokens:
    * for every unordered pair of frequent tokens, the number of documents
    * containing both, each token's document frequency, and the lift
    * n_both·N / (n_a·n_b) — the PMI-style association score (one exact
    * integer-valued division; both products stay far under 2⁵³).
    *
    * Scale shape: the vocabulary cap makes this tractable anywhere — the
    * top-k token list is a broadcast semi-join filter, per-doc pair
    * expansion is bounded by k²/2 = 190 pairs, and the final count is a
    * partial+final agg on the (tok_a, tok_b) key. The doc-frequency and
    * total-count sides are 20- and 1-row broadcasts.
    */
  def q116Cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // localCheckpoint (r14, the q110 discipline): dt feeds the top-k doc
    // frequencies AND (through the semi-join) both pair sides — tokenize +
    // distinct once.
    val dt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .localCheckpoint()
    val top = dt.groupBy(col("tok")).agg(count(lit(1)).as("n_docs_tok"))
      .orderBy(desc("n_docs_tok"), asc("tok")).limit(20)
    val ft = dt.join(broadcast(top.select("tok")), Seq("tok"), "left_semi")
    val pairs = ft.select(col("doc_id"), col("tok").as("tok_a"))
      .join(ft.select(col("doc_id"), col("tok").as("tok_b")), Seq("doc_id"))
      .where(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_both"))
    val nTotal = docs.agg(count(lit(1)).as("n_corpus"))
    pairs
      .join(broadcast(top.select(col("tok").as("tok_a"), col("n_docs_tok").as("n_a"))), "tok_a")
      .join(broadcast(top.select(col("tok").as("tok_b"), col("n_docs_tok").as("n_b"))), "tok_b")
      .crossJoin(broadcast(nTotal))
      .withColumn("lift",
        (col("n_both") * col("n_corpus")).cast("double") / (col("n_a") * col("n_b")))
      .select(col("tok_a"), col("tok_b"), col("n_both"), col("n_a"), col("n_b"), col("lift"))
      .orderBy(col("tok_a"), col("tok_b"))
  }

  val q116Oracle: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |top AS (
      |  SELECT tok, count(*) AS n_docs_tok FROM dt GROUP BY tok
      |  ORDER BY n_docs_tok DESC, tok LIMIT 20),
      |ft AS (SELECT doc_id, tok FROM dt WHERE tok IN (SELECT tok FROM top)),
      |pairs AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_both
      |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY a.tok, b.tok),
      |n AS (SELECT count(*) AS n_corpus FROM documents)
      |SELECT tok_a, tok_b, n_both, ta.n_docs_tok AS n_a, tb.n_docs_tok AS n_b,
      |  CAST(n_both * n_corpus AS DOUBLE) / (ta.n_docs_tok * tb.n_docs_tok) AS lift
      |FROM pairs
      |JOIN top ta ON ta.tok = pairs.tok_a
      |JOIN top tb ON tb.tok = pairs.tok_b
      |CROSS JOIN n
      |ORDER BY tok_a, tok_b""".stripMargin

  // ---------------------------------------------------------------- q128

  /** Per-dimension embedding standardization stats + outlier screen — the
    * preprocessing pass before k-means/PCA/quantization. Coordinates
    * quantize to milli-units (exact), per-dim mean and population variance
    * come from integer sums (μ = S/n, σ² = (n·Q − S²)/n² — each a single
    * exact-integer-fed IEEE division, so both engines produce identical
    * doubles), and the outlier count applies the z > 3 test in pure integer
    * arithmetic: (n·v − S)² > 9·(n·Q − S²). Same determinism family as the
    * rolling detector (Timeline q113), lifted from a window to a whole
    * column.
    *
    * Scale shape: one partial+final aggregation on the dim key for the
    * stats (64 groups), broadcast back for the outlier pass — two scans of
    * the quantized stream or one scan + broadcast join; nothing sorts,
    * nothing collects.
    */
  def q128DimStandardize(spark: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("v", floor(col("x").cast("double") * 1000.0).cast("long"))
    val stats = qv.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"))
    val outliers = qv.join(broadcast(stats), Seq("pos"))
      .where((col("n") * col("v") - col("s")) * (col("n") * col("v") - col("s")) >
        lit(9L) * (col("n") * col("q") - col("s") * col("s")))
      .groupBy(col("pos")).agg(count(lit(1)).as("n_outliers"))
    stats.join(outliers, Seq("pos"), "left")
      .select(col("pos"), col("n"),
        (col("s").cast("double") / col("n")).as("mean_milli"),
        ((col("n") * col("q") - col("s") * col("s")).cast("double") /
          (col("n") * col("n")).cast("double")).as("var_milli"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy(col("pos"))
  }

  val q128Oracle: String =
    """WITH qv AS (
      |  SELECT s.i - 1 AS pos, CAST(floor(CAST(s.x AS DOUBLE) * 1000.0) AS BIGINT) AS v
      |  FROM (SELECT unnest([{'i': i, 'x': embedding[i]}
      |                       for i in range(1, len(embedding) + 1)]) AS s
      |        FROM embeddings)),
      |stats AS (
      |  SELECT pos, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
      |    CAST(sum(v * v) AS BIGINT) AS q
      |  FROM qv GROUP BY pos),
      |outliers AS (
      |  SELECT pos, count(*) AS n_outliers
      |  FROM qv JOIN stats USING (pos)
      |  WHERE (n * v - s) * (n * v - s) > 9 * (n * q - s * s)
      |  GROUP BY pos)
      |SELECT pos, n,
      |  CAST(s AS DOUBLE) / n AS mean_milli,
      |  CAST(n * q - s * s AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_milli,
      |  coalesce(n_outliers, 0) AS n_outliers
      |FROM stats LEFT JOIN outliers USING (pos)
      |ORDER BY pos""".stripMargin

  // ---------------------------------------------------------------- q149

  /** Fixed-point covariance matrix over the embedding dimensions — the
    * Gram-style second-moment pass PCA/whitening pipelines start from.
    * Coordinates quantize to integers (floor(x·10⁶) after exact
    * float→double widening) so every sum is 64-bit-exact and
    * order-independent; the covariance then comes out of integer sums with
    * four IEEE-exact double operations per (i,j) cell.
    *
    * Scale shape: pair generation is MAP-ONLY — a nested `transform` over
    * the quantized array emits only the upper triangle (j > i) per row, so
    * there is no self-join and no shuffle until the partial aggregation,
    * which collapses everything to d(d−1)/2 = 2016 cells before the one
    * tiny exchange. At 100 TB the per-term products (≤ 10¹⁴ here) would
    * upcast to decimal(38,0) — same one-division determinism argument.
    */
  def q149CovarianceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .select(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qarr"))
    // Only the cross-moment needs the O(d²) pair expansion; the marginal
    // sums are identical for every pair sharing a dimension, so they come
    // from a 64-key aggregate joined back as a broadcast, and n is one
    // scalar. This keeps the exploded struct to (di, dj, xy) — 40% of the
    // bytes the 5-field version pushed through the map-side combine.
    // The O(d²)-per-row cross moments come from the typed CovPairSums
    // aggregator — a tight primitive loop with a mergeable 2016-slot long
    // buffer (one per partition crosses the wire, not d²·rows exploded pair
    // rows; the interpreted nested-HOF explode this replaces was 5× slower).
    // The (di, dj) labels are generated positionally in the SAME row-major
    // order the aggregator fills and zipped onto the sums.
    val covAgg = udaf(new graft.functions.CovPairSums(64))
    val sums = q.agg(covAgg(col("qarr")).as("sums"))
      .select(explode(expr(
        """zip_with(
          |  flatten(transform(sequence(0, 62), i ->
          |    transform(sequence(i + 1, 63), j -> named_struct('di', i, 'dj', j)))),
          |  sums,
          |  (p, s) -> struct(p.di AS di, p.dj AS dj, s AS sxy))""".stripMargin)).as("z"))
      .select(col("z.di").as("di"), col("z.dj").as("dj"), col("z.sxy").as("sxy"))
    val marg = q.select(posexplode(col("qarr")).as(Seq("d", "qx")))
      .groupBy(col("d")).agg(sum(col("qx")).as("s"), count(lit(1)).as("n"))
    sums
      .join(broadcast(marg.select(col("d").as("di"), col("s").as("sx"), col("n"))), "di")
      .join(broadcast(marg.select(col("d").as("dj"), col("s").as("sy"))), "dj")
      .select(col("di"), col("dj"), col("sxy"), col("n"),
        ((col("sxy").cast("double") / col("n") -
          (col("sx").cast("double") / col("n")) * (col("sy").cast("double") / col("n")))
          / 1000000000000.0).as("cov"))
      .orderBy(abs(col("cov")).desc, col("di"), col("dj"))
      .limit(50)
  }

  val q149Oracle: String =
    """WITH q AS (
      |  SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS qx
      |  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) dims),
      |p AS (
      |  SELECT a.i AS di, b.i AS dj, CAST(sum(a.qx * b.qx) AS BIGINT) AS sxy,
      |    CAST(sum(a.qx) AS BIGINT) AS sx, CAST(sum(b.qx) AS BIGINT) AS sy,
      |    count(*) AS n
      |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i < b.i
      |  GROUP BY 1, 2)
      |SELECT di, dj, sxy, n,
      |  (CAST(sxy AS DOUBLE) / n -
      |   (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) / 1000000000000.0 AS cov
      |FROM p
      |ORDER BY abs(cov) DESC, di, dj
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q178

  /** Association-rule LIFT over market baskets: brand pairs co-purchased
    * within an order, lift = N·n_ab / (n_a·n_b) — the normalized
    * co-occurrence score that separates genuine affinity from popularity
    * (q116 reports raw counts; lift is what a recommender thresholds on).
    * Candidates come from the within-order self-join on the distinct
    * (order, brand) set — basket size bounds the quadratic — with a
    * min-support cut (n_ab ≥ 20) before ranking. All counts integer; the
    * lift is one IEEE expression over exact inputs. Top 25 by lift.
    *
    * One DAG, no driver-side actions: the basket total N rides along as a
    * broadcast 1-row aggregate (crossJoin), and the basket set feeds the
    * self-join through one reused exchange instead of being recomputed per
    * branch — the all-lazy shape that halves this query's wall-clock.
    *
    * A-priori prune: a pair with support ≥ 20 needs BOTH singletons ≥ 20
    * (downward closure), so the basket rows are semi-joined against the
    * frequent-brand set — already computed for the lift denominators, and
    * broadcastable at any corpus scale because |brands| is small — BEFORE
    * the quadratic pair self-join. The prune provably cannot change the
    * surviving pairs; it only shrinks the self-join's input.
    */
  def q178AssociationLift(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (r14, the q110 discipline): b feeds FOUR consumers —
    // the basket count, the per-brand support, and both self-join sides
    // (via the support-filtered bf) — whose alias-renamed subtrees defeat
    // ReuseExchange; materialize the scan+join+distinct once.
    val b = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .localCheckpoint()
    val nbDf = b.agg(countDistinct(col("l_orderkey")).as("nb"))
    val s = b.groupBy(col("p_brand")).agg(count(lit(1)).as("c"))
    val bf = b.join(broadcast(s.where(col("c") >= 20).select(col("p_brand"))), "p_brand")
      .select(col("l_orderkey"), col("p_brand"))
    val pairs = bf.select(col("l_orderkey"), col("p_brand").as("ba"))
      .join(bf.select(col("l_orderkey"), col("p_brand").as("bb")), Seq("l_orderkey"))
      .where(col("ba") < col("bb"))
      .groupBy(col("ba"), col("bb")).agg(count(lit(1)).as("cab"))
      .where(col("cab") >= 20)
    pairs
      .join(broadcast(s.select(col("p_brand").as("ba"), col("c").as("ca"))), "ba")
      .join(broadcast(s.select(col("p_brand").as("bb"), col("c").as("cb"))), "bb")
      .crossJoin(broadcast(nbDf))
      .select(col("ba"), col("bb"), col("cab"), col("ca"), col("cb"),
        (col("cab").cast("double") * col("nb") /
          (col("ca").cast("double") * col("cb").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("ba"), col("bb"))
      .limit(25)
  }

  val q178Oracle: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, p_brand
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
      |s AS (SELECT p_brand, count(*) AS c FROM b GROUP BY 1),
      |p AS (SELECT a.p_brand AS ba, b2.p_brand AS bb, count(*) AS cab
      |      FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
      |        AND a.p_brand < b2.p_brand
      |      GROUP BY 1, 2 HAVING count(*) >= 20)
      |SELECT ba, bb, cab, sa.c AS ca, sb.c AS cb,
      |  CAST(cab AS DOUBLE) * (SELECT nb FROM n) /
      |    (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS lift
      |FROM p JOIN s sa ON sa.p_brand = ba JOIN s sb ON sb.p_brand = bb
      |ORDER BY lift DESC, ba, bb LIMIT 25""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q115_kmeans_step", q115KmeansStep, q115Oracle),
    GraftQuery.sql("q116_cooccurrence", q116Cooccurrence, q116Oracle),
    GraftQuery.sql("q128_dim_standardize", q128DimStandardize, q128Oracle),
    GraftQuery.sql("q149_covariance_matrix", q149CovarianceMatrix, q149Oracle),
    GraftQuery.sql("q178_association_lift", q178AssociationLift, q178Oracle)
  )
}
