package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Hybrid retrieval: fusing the keyword (BM25, q242) and dense (cosine, q40
  * family) rankings into one result list — the serving-side shape of a
  * RAG / corpus-search stack, where neither lexical nor embedding recall is
  * sufficient alone.
  */
object Retrieval {

  /** Fusion depth: each leg contributes its top-K ranked list. */
  private val FuseK = 100

  /** The RRF dampening constant (Cormack et al.'s k=60). */
  private val RrfK = 60

  // ---------------------------------------------------------------- q252

  /** Reciprocal-rank-fusion hybrid retrieval: the BM25 keyword ranking
    * (q242's scoring core, terms "vector stream scan") and the dense cosine
    * ranking against a fixed query embedding (vec_id 7; doc_id ≡ vec_id per
    * the multimodal join, q43) are each cut to their top-100, then fused by
    * RRF(d) = Σ_leg 1/(60 + rank_leg(d)) — absent from a leg contributes 0.
    *
    * Determinism: ranks are row_numbers over (score DESC, id) where both
    * engines produce bit-identical scores (the exact-rational BM25 family
    * and the sequential-fold dot product); 1/(60+r) is one IEEE division of
    * exact small integers, and the two-term sum is evaluated in fixed
    * keyword-then-dense order — so the fused score is bit-identical too.
    *
    * Scale shape: each leg ends in a TakeOrdered top-K (per-partition heads
    * + driver merge — never a global sort), and only then does a
    * single-partition row_number window run over the ≤K surviving rows —
    * the window is bounded by construction, not by data size. The BM25 leg
    * touches only postings of the query terms; the dense leg is a map-only
    * scored scan against one broadcast query vector (swap in the IVF probe,
    * q67/q246, when the corpus outgrows brute force). The fusion join is
    * ≤2K rows.
    */
  def q252RrfHybrid(spark: SparkSession, dir: String): DataFrame = {
    val kwTop = TextAnalysis.bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id")).limit(FuseK)
      .withColumn("r_kw", row_number()
        .over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_kw"))
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding", "float_vec_dot(embedding, embedding) AS n2")
    val q = broadcast(emb.where(col("vec_id") === 7)
      .select(col("embedding").as("q_emb"), col("n2").as("q_n2")))
    val denseTop = emb.where(col("vec_id") =!= 7)
      .crossJoin(q)
      .withColumn("cos",
        expr("float_vec_dot(embedding, q_emb)") / (sqrt(col("n2")) * sqrt(col("q_n2"))))
      .orderBy(col("cos").desc, col("vec_id")).limit(FuseK)
      .withColumn("r_dense", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("r_dense"))
    kwTop.join(denseTop, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("r_kw").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("r_dense").cast("double")), lit(0.0)))
      .select(col("doc_id"), col("r_kw"), col("r_dense"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val q252Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       |       WHERE tok IN ('vector', 'stream', 'scan') GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |ts AS (
       |  SELECT t.doc_id,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |      / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) *
       |    ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS term_score
       |  FROM tf t JOIN dfreq USING (tok) JOIN dl USING (doc_id), corpus),
       |bm AS (SELECT doc_id, CAST(sum(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS bm25
       |       FROM ts GROUP BY doc_id),
       |kw AS (SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_kw
       |       FROM bm QUALIFY r_kw <= $FuseK),
       |n AS (SELECT vec_id, embedding,
       |        ${Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |q AS (SELECT embedding AS q_emb, n2 AS q_n2 FROM n WHERE vec_id = 7),
       |dn AS (SELECT vec_id,
       |         ${Det.dotSql("embedding", "q_emb")} / (sqrt(n2) * sqrt(q_n2)) AS cos
       |       FROM n, q WHERE vec_id <> 7),
       |dense AS (SELECT vec_id AS doc_id,
       |            CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS r_dense
       |          FROM dn QUALIFY r_dense <= $FuseK)
       |SELECT doc_id, r_kw, r_dense,
       |  coalesce(CAST(1.0 AS DOUBLE) / (CAST($RrfK AS DOUBLE) + CAST(r_kw AS DOUBLE)),
       |           CAST(0 AS DOUBLE))
       |  + coalesce(CAST(1.0 AS DOUBLE) / (CAST($RrfK AS DOUBLE) + CAST(r_dense AS DOUBLE)),
       |             CAST(0 AS DOUBLE)) AS rrf
       |FROM kw FULL OUTER JOIN dense USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q297

  /** Retrieval EVALUATION — the measurement leg that closes the retrieval
    * family (BM25 q242, dense ANN q40/q67, fusion q252): for each query
    * vector, rank ALL candidates by exact cosine and score the ranking
    * against label ground truth (same label = relevant, the standard
    * proxy-relevance setup). Emitted per query: the rank of the first
    * relevant hit (the MRR numerator — the RECIPROCAL/mean is the
    * analyst's last step, kept off this pass because a float mean is a
    * summation-order lottery while ranks are integers), hits@5 and
    * hits@10 (the recall@k numerators), and the relevant-candidate total.
    * At 100 TB evaluation runs over a SAMPLED query panel exactly like
    * this 20-query one — the candidate stream stays a broadcast-bounded
    * scan (q40's shape), never all-pairs.
    */
  def q297RetrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).selectExpr(
      "vec_id", "embedding", "label", "float_vec_dot(embedding, embedding) AS n2")
    val queries = base.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("label").as("q_label"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    base.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr("float_vec_dot(q_emb, embedding)") / (sqrt(col("q_n2")) * sqrt(col("n2"))))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("rel", (col("label") === col("q_label")).cast("int"))
      .groupBy(col("q_id"), col("q_label"))
      .agg(
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"),
        sum(when(col("rank") <= 5, col("rel")).otherwise(0)).cast("long").as("hits_at_5"),
        sum(when(col("rank") <= 10, col("rel")).otherwise(0)).cast("long").as("hits_at_10"),
        sum(col("rel")).cast("long").as("n_rel"))
      .orderBy(col("q_id"))
  }

  val q297Oracle: String =
    s"""WITH n AS (SELECT vec_id, embedding, label,
       |  ${graft.operators.Det.dotSql("embedding", "embedding")} AS n2 FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n2 AS q_n2, label AS q_label
       |      FROM n WHERE vec_id < 20),
       |ranked AS (
       |  SELECT q.q_id, q.q_label, c.vec_id, c.label,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY
       |      ${graft.operators.Det.dotSql("q.q_emb", "c.embedding")}
       |        / (sqrt(q.q_n2) * sqrt(c.n2)) DESC, c.vec_id) AS rank,
       |    CASE WHEN c.label = q.q_label THEN 1 ELSE 0 END AS rel
       |  FROM q JOIN n c ON c.vec_id <> q.q_id)
       |SELECT q_id, q_label,
       |  min(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank,
       |  CAST(sum(CASE WHEN rank <= 5 THEN rel ELSE 0 END) AS BIGINT) AS hits_at_5,
       |  CAST(sum(CASE WHEN rank <= 10 THEN rel ELSE 0 END) AS BIGINT) AS hits_at_10,
       |  CAST(sum(rel) AS BIGINT) AS n_rel
       |FROM ranked GROUP BY q_id, q_label ORDER BY q_id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q252_rrf_hybrid", q252RrfHybrid, q252Oracle),
    GraftQuery.sql("q297_retrieval_eval", q297RetrievalEval, q297Oracle))
}
