package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Corpus-curation operators for a training-data pipeline: eval-set
  * decontamination, deterministic stratified sampling, context-window
  * packing, composite quality filtering, random-projection embedding
  * reduction, and incremental (batch-vs-index) dedup.
  *
  * These are the steps that sit between raw dedup (graft.operators.Dedup)
  * and shard packing (Composite.q96) in a real pretraining pipeline. All
  * randomness is hash-derived (md5 / integer LCG) so the DuckDB oracle
  * reproduces every decision bit-for-bit; all double arithmetic is either
  * a single IEEE-specified op or a sequential left fold (see Det).
  */
object Curation {

  // ---------------------------------------------------------------- q98

  /** Eval-set decontamination: flag training documents that share any
    * character 20-gram with a held-out eval set (here the deterministic
    * doc_id % 50 == 0 slice standing in for a benchmark suite). This is the
    * n-gram-overlap decontamination used for pretraining corpora: exact
    * membership, not similarity — one shared shingle contaminates.
    *
    * Scale shape: the eval index (distinct eval shingle hashes) is tiny
    * relative to the corpus — a few thousand docs even for a large benchmark
    * battery — so it BROADCASTS and contamination is a map-side semi join;
    * the only shuffle is the per-lang count. An eval set too big to
    * broadcast degrades gracefully to a shuffle equi-join on the hash.
    */
  def q98Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "shingle_hashes(text, 20) AS sh")
    val evalIdx = sh.where(col("doc_id") % 50 === 0)
      .select(explode(col("sh")).as("h")).distinct()
    val train = sh.where(col("doc_id") % 50 =!= 0)
    val contaminated = train
      .select(col("doc_id"), col("lang"), explode(col("sh")).as("h"))
      .join(broadcast(evalIdx), Seq("h"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
    train.groupBy(col("lang")).agg(count(lit(1)).as("n_train"))
      .join(contaminated.groupBy(col("lang")).agg(count(lit(1)).as("n_cont")),
        Seq("lang"), "left")
      .select(col("lang"), col("n_train"),
        coalesce(col("n_cont"), lit(0L)).as("n_contaminated"))
      .orderBy(col("lang"))
  }

  val q98Oracle: String =
    s"""WITH ${Dedup.hashedShingleCte},
       |ev AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE doc_id % 50 = 0),
       |tr AS (SELECT h.doc_id, d.lang, h.hs
       |       FROM hs h JOIN documents d USING (doc_id) WHERE h.doc_id % 50 <> 0),
       |contam AS (
       |  SELECT DISTINCT t.doc_id, t.lang
       |  FROM (SELECT doc_id, lang, unnest(hs) AS h FROM tr) t JOIN ev USING (h)),
       |base AS (SELECT lang, count(*) AS n_train FROM tr GROUP BY lang),
       |c AS (SELECT lang, count(*) AS n_cont FROM contam GROUP BY lang)
       |SELECT lang, n_train, coalesce(n_cont, 0) AS n_contaminated
       |FROM base LEFT JOIN c USING (lang) ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q99

  /** Deterministic stratified (quota) sampling: up to 50 docs per language,
    * chosen by md5(doc_id) order — a reproducible uniform draw within each
    * stratum, the standard way to build fixed eval/calibration slices from a
    * skewed corpus without a seed-dependent RNG.
    *
    * Scale shape: one shuffle on the stratum key, per-stratum top-k via
    * row_number. A giant stratum serializes through one reducer task — at
    * 100 TB pre-filter with a conservative hash-threshold pass (keep rows
    * with md5 below quota/stratum_count × safety margin) so the window only
    * ranks a small superset of the quota.
    */
  def q99StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("skey", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 50)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  val q99Oracle: String =
    """SELECT lang, rk, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q100

  /** Context-window packing: assign documents (in deterministic doc_id order
    * per language) to consecutive 4096-token training windows by running
    * token count — the sequential-fill packing used to batch documents into
    * fixed-size contexts. Emits per-window occupancy so over/under-fill is
    * visible. Window id = floor(tokens-before-this-doc / 4096): a doc that
    * straddles a boundary counts toward the window it started in.
    *
    * Scale shape: one shuffle (window over lang) + one agg; the running sum
    * is a ROWS UNBOUNDED PRECEDING frame, which Spark evaluates streaming
    * per partition. Same giant-stratum caveat as q99: at 100 TB shard the
    * stream (pack per (lang, shard) with shard = hash(doc_id) % K) since
    * windows need not cross shards.
    */
  def q100PackContext(spark: SparkSession, dir: String): DataFrame = {
    val cum = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("before", coalesce(sum(col("tok")).over(cum), lit(0L)))
      .withColumn("window_id", floor(col("before") / 4096L))
      .groupBy(col("lang"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("lang"), col("window_id"))
  }

  val q100Oracle: String =
    """SELECT lang, window_id, count(*) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT lang, tok,
      |    CAST(floor(coalesce(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0) AS BIGINT)
      |      AS window_id
      |  FROM (SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |        FROM documents))
      |GROUP BY lang, window_id ORDER BY lang, window_id""".stripMargin

  // ---------------------------------------------------------------- q101

  /** Composite quality filter with per-reason counts (Gopher-style): flag
    * docs that are too short (< 20 tokens), have an implausible mean word
    * length (< 3 or > 8 chars), or too high a symbol ratio (> 20% of chars
    * outside [A-Za-z ]). Reports, per language, how many docs each rule
    * would drop and how many survive all rules — the observability a
    * filtering pipeline needs before anyone commits to thresholds.
    *
    * Map-only flag computation + one agg shuffle; every flag is a comparison
    * of deterministically-computed doubles (single IEEE division), so the
    * oracle reproduces decisions exactly.
    */
  def q101QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val flags = Tables.documents(spark, dir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("alpha_len",
        length(regexp_replace(col("text"), "[^A-Za-z ]", "")))
      .withColumn("word_chars", length(regexp_replace(col("text"), " ", "")))
      .withColumn("mean_word_len",
        col("word_chars").cast("double") / col("n_tok"))
      .withColumn("symbol_ratio",
        (length(col("text")) - col("alpha_len")).cast("double") / length(col("text")))
      .withColumn("f_short", col("n_tok") < 20)
      .withColumn("f_word_len",
        col("mean_word_len") < 3.0 || col("mean_word_len") > 8.0)
      .withColumn("f_symbol", col("symbol_ratio") > 0.2)
    flags.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("f_short"), 1L).otherwise(0L)).as("n_too_short"),
        sum(when(col("f_word_len"), 1L).otherwise(0L)).as("n_word_len"),
        sum(when(col("f_symbol"), 1L).otherwise(0L)).as("n_symbol"),
        sum(when(!col("f_short") && !col("f_word_len") && !col("f_symbol"), 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q101Oracle: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
      |  CAST(sum(CASE WHEN f_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_word_len,
      |  CAST(sum(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol,
      |  CAST(sum(CASE WHEN NOT f_short AND NOT f_word_len AND NOT f_symbol
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM (
      |  SELECT lang,
      |    n_tok < 20 AS f_short,
      |    (word_chars / n_tok) < 3.0 OR (word_chars / n_tok) > 8.0 AS f_word_len,
      |    ((len(text) - alpha_len) / len(text)) > 0.2 AS f_symbol
      |  FROM (
      |    SELECT lang, text,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |      CAST(len(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) AS alpha_len,
      |      CAST(len(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS word_chars
      |    FROM documents))
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q102

  /** Random-projection dimensionality reduction: project each embedding to 8
    * dims through a deterministic LCG-derived pseudo-random matrix — the
    * cheap dense-projection step under Johnson–Lindenstrauss sketches and
    * the real-valued sibling of the hyperplane-LSH signs (Similarity q42).
    * Projections are quantized (×1000, floored) so the output is integral.
    *
    * Map-only over the embeddings table: the projection fuses into the scan
    * as one codegen'd expression per row; no shuffle at any scale. The fold
    * over vector elements is a sequential left fold in both engines, so the
    * doubles (and hence the floor) are bit-identical (see Det notes).
    */
  def q102RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    // coef(j,i) in [-1, 1): ((1103515245·(j·dim+i) + 12345) mod 2048 − 1024)/1024
    val proj =
      """transform(sequence(0, 7), j ->
        |  aggregate(
        |    zip_with(embedding, sequence(0, size(embedding) - 1), (x, i) ->
        |      CAST(x AS DOUBLE) *
        |      (CAST((1103515245L * (j * size(embedding) + i) + 12345L) % 2048 - 1024 AS DOUBLE) / 1024.0)),
        |    CAST(0 AS DOUBLE), (acc, v) -> acc + v))
        |""".stripMargin
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", s"$proj AS p")
      .select(col("vec_id"), posexplode(col("p")).as(Seq("dim_j", "pv")))
      .select(col("vec_id"), col("dim_j").cast("long").as("dim_j"),
        floor(col("pv") * 1000.0).as("qproj"))
      .orderBy(col("vec_id"), col("dim_j"))
  }

  val q102Oracle: String =
    """SELECT vec_id, j AS dim_j, CAST(floor(p * 1000.0) AS BIGINT) AS qproj
      |FROM (
      |  SELECT vec_id, j,
      |    list_reduce([CAST(0 AS DOUBLE)] ||
      |      [CAST(embedding[i + 1] AS DOUBLE) *
      |       (CAST((1103515245 * (j * len(embedding) + i) + 12345) % 2048 - 1024 AS DOUBLE) / 1024.0)
      |       for i in range(0, len(embedding))],
      |      (acc, v) -> acc + v) AS p
      |  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) js)
      |ORDER BY vec_id, dim_j""".stripMargin

  // ---------------------------------------------------------------- q103

  /** Incremental dedup of a new batch against an already-indexed corpus:
    * the even-doc_id half plays the standing index (prior crawls), the odd
    * half the incoming batch; an incoming doc whose sha-256 matches any
    * indexed doc is a duplicate. This is the cross-RUN dedup that exact
    * dedup (q32) can't express — the index is not part of the batch.
    *
    * Scale shape: the index at 100 TB is far too big to broadcast, so this
    * is a SHUFFLE left-semi join on the content hash — both sides partition
    * by the hash, matches resolve within partitions. (Contrast q97's
    * broadcast anti join, where the drop set is small.) The per-lang
    * rollup then aggregates the marked batch.
    */
  def q103IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("h", sha2(col("text"), 256))
    val index = docs.where(col("doc_id") % 2 === 0).select(col("h")).distinct()
    val batch = docs.where(col("doc_id") % 2 === 1)
    val dup = batch.join(index, Seq("h"), "left_semi")
    batch.groupBy(col("lang")).agg(count(lit(1)).as("n_new"))
      .join(dup.groupBy(col("lang")).agg(count(lit(1)).as("n_dup")),
        Seq("lang"), "left")
      .select(col("lang"), col("n_new"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (col("n_new") - coalesce(col("n_dup"), lit(0L))).as("n_fresh"))
      .orderBy(col("lang"))
  }

  val q103Oracle: String =
    """WITH d AS (SELECT lang, doc_id, sha256(text) AS h FROM documents),
      |idx AS (SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0),
      |batch AS (SELECT lang, h FROM d WHERE doc_id % 2 = 1),
      |dup AS (SELECT lang, count(*) AS n_dup FROM batch
      |        WHERE h IN (SELECT h FROM idx) GROUP BY lang),
      |base AS (SELECT lang, count(*) AS n_new FROM batch GROUP BY lang)
      |SELECT lang, n_new, coalesce(n_dup, 0) AS n_dup,
      |  n_new - coalesce(n_dup, 0) AS n_fresh
      |FROM base LEFT JOIN dup USING (lang) ORDER BY lang""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q98_decontaminate", q98Decontaminate, q98Oracle),
    GraftQuery.sql("q99_stratified_sample", q99StratifiedSample, q99Oracle),
    GraftQuery.sql("q100_pack_context", q100PackContext, q100Oracle),
    GraftQuery.sql("q101_quality_filter", q101QualityFilter, q101Oracle),
    GraftQuery.sql("q102_random_projection", q102RandomProjection, q102Oracle),
    GraftQuery.sql("q103_incremental_dedup", q103IncrementalDedup, q103Oracle)
  )
}
