package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * and shard packing (Composite.q96) in a real pretraining pipeline. Each
  * operator is a DataFrame→DataFrame core (callers bring their own corpus)
  * with a qNN wrapper binding the driver's test tables. All randomness is
  * hash-derived (md5 / integer LCG) so the DuckDB oracle reproduces every
  * decision bit-for-bit; all double arithmetic is either a single
  * IEEE-specified op or a sequential left fold (see Det).
  */
object Curation {

  // ---------------------------------------------------------------- q98

  /** Core: training docs (rows of `docs` where !isEval) that share at least
    * one character `width`-gram with any eval doc (rows where isEval).
    * Expects columns (doc_id, text); returns distinct (doc_id, lang).
    *
    * Scale shape: the eval index (distinct eval shingle hashes) is tiny
    * relative to the corpus — a few thousand docs even for a large benchmark
    * battery — so it BROADCASTS and contamination is a map-side semi join.
    * An eval set too big to broadcast degrades gracefully to a shuffle
    * equi-join on the hash.
    */
  def contaminatedDocs(docs: DataFrame, isEval: Column, width: Int): DataFrame = {
    // localCheckpoint: sh feeds the eval index AND the training side —
    // hash the shingles once instead of per consumer.
    val sh = docs.withColumn("is_eval", isEval)
      .selectExpr("doc_id", "lang", "is_eval", s"shingle_hashes(text, $width) AS sh")
      .localCheckpoint()
    val evalIdx = sh.where(col("is_eval"))
      .select(explode(col("sh")).as("h")).distinct()
    sh.where(!col("is_eval"))
      .select(col("doc_id"), col("lang"), explode(col("sh")).as("h"))
      .join(broadcast(evalIdx), Seq("h"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
  }

  /** Eval-set decontamination report: per-language training-doc counts and
    * how many are contaminated (share any 20-gram with the eval slice —
    * exact membership, not similarity; one shared shingle contaminates).
    * The deterministic doc_id % 50 == 0 slice stands in for a benchmark
    * suite.
    */
  def q98Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 50 === 0
    val train = docs.where(!isEval)
    train.groupBy(col("lang")).agg(count(lit(1)).as("n_train"))
      .join(contaminatedDocs(docs, isEval, 20)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_cont")),
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

  /** Core: up to `quota` rows per stratum, chosen by md5(doc_id) order — a
    * reproducible uniform draw within each stratum, the standard way to
    * build fixed eval/calibration slices from a skewed corpus without a
    * seed-dependent RNG. Expects (doc_id, <stratum col>); adds `rk`.
    *
    * Scale shape: one shuffle on the stratum key, per-stratum top-k via
    * row_number. A giant stratum serializes through one reducer task — at
    * 100 TB pre-filter with a conservative hash-threshold pass (keep rows
    * with md5 below quota/stratum_count × safety margin) so the window only
    * ranks a small superset of the quota.
    */
  def stratifiedSample(docs: DataFrame, stratum: Column, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(col("skey"), col("doc_id"))
    docs.withColumn("skey", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= quota)
      .drop("skey")
  }

  def q99StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), col("lang"), 50)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))

  val q99Oracle: String =
    """SELECT lang, rk, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q100

  /** Core: assign documents (in deterministic doc_id order per `groupCol`)
    * to consecutive `budget`-token training windows by running token count —
    * sequential-fill packing into fixed-size contexts. Window id =
    * floor(tokens-before-this-doc / budget): a doc that straddles a boundary
    * counts toward the window it started in. Expects (doc_id, text); adds
    * (tok, window_id).
    *
    * Scale shape: one shuffle (window over the group key); the running sum
    * is a ROWS UNBOUNDED PRECEDING frame, evaluated streaming per
    * partition. Same giant-stratum caveat as [[stratifiedSample]]: at
    * 100 TB pack per (group, shard) with shard = hash(doc_id) % K, since
    * windows need not cross shards.
    */
  def packContext(docs: DataFrame, groupCol: Column, budget: Int): DataFrame = {
    val cum = Window.partitionBy(groupCol).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("before", coalesce(sum(col("tok")).over(cum), lit(0L)))
      .withColumn("window_id", floor(col("before") / budget.toLong))
      .drop("before")
  }

  /** Per-(lang, window) occupancy of 4096-token context packing, so
    * over/under-fill is visible before anyone trains on the shards.
    */
  def q100PackContext(spark: SparkSession, dir: String): DataFrame =
    packContext(Tables.documents(spark, dir), col("lang"), 4096)
      .groupBy(col("lang"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("lang"), col("window_id"))

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

  /** Core: per-doc quality flags (Gopher-style): too short (< 20 tokens),
    * implausible mean word length (< 3 or > 8 chars), high symbol ratio
    * (> 20% of chars outside [A-Za-z ]). Map-only; every flag is a
    * comparison of deterministically-computed doubles (single IEEE
    * division), so an oracle reproduces decisions exactly. Expects (text);
    * adds (f_short, f_word_len, f_symbol).
    */
  def qualityFlags(docs: DataFrame): DataFrame =
    docs
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

  /** Per-language counts of each drop reason + survivors — the
    * observability a filtering pipeline needs before anyone commits to
    * thresholds.
    */
  def q101QualityFilter(spark: SparkSession, dir: String): DataFrame =
    qualityFlags(Tables.documents(spark, dir))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("f_short"), 1L).otherwise(0L)).as("n_too_short"),
        sum(when(col("f_word_len"), 1L).otherwise(0L)).as("n_word_len"),
        sum(when(col("f_symbol"), 1L).otherwise(0L)).as("n_symbol"),
        sum(when(!col("f_short") && !col("f_word_len") && !col("f_symbol"), 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))

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

  /** Core: project each embedding to `outDims` dims through a deterministic
    * LCG-derived pseudo-random matrix — the cheap dense-projection step
    * under Johnson–Lindenstrauss sketches and the real-valued sibling of
    * the hyperplane-LSH signs (Similarity q42). Projections quantize
    * (×1000, floored) so the output is integral. Expects (vec_id,
    * embedding); returns (vec_id, dim_j, qproj).
    *
    * Map-only: the projection fuses into the scan as one codegen'd
    * expression per row; no shuffle at any scale. The fold over vector
    * elements is a sequential left fold in both engines, so the doubles
    * (and hence the floor) are bit-identical (see Det notes).
    */
  def randomProjectionQ(embeddings: DataFrame, outDims: Int): DataFrame = {
    // coef(j,i) in [-1, 1): ((1103515245·(j·dim+i) + 12345) mod 2048 − 1024)/1024
    val proj =
      s"""transform(sequence(0, ${outDims - 1}), j ->
         |  aggregate(
         |    zip_with(embedding, sequence(0, size(embedding) - 1), (x, i) ->
         |      CAST(x AS DOUBLE) *
         |      (CAST((1103515245L * (j * size(embedding) + i) + 12345L) % 2048 - 1024 AS DOUBLE) / 1024.0)),
         |    CAST(0 AS DOUBLE), (acc, v) -> acc + v))
         |""".stripMargin
    embeddings
      .selectExpr("vec_id", s"$proj AS p")
      .select(col("vec_id"), posexplode(col("p")).as(Seq("dim_j", "pv")))
      .select(col("vec_id"), col("dim_j").cast("long").as("dim_j"),
        floor(col("pv") * 1000.0).as("qproj"))
  }

  def q102RandomProjection(spark: SparkSession, dir: String): DataFrame =
    randomProjectionQ(Tables.embeddings(spark, dir), 8)
      .orderBy(col("vec_id"), col("dim_j"))

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

  /** Core: rows of the batch whose sha-256 content hash matches any row of
    * the standing index — the cross-RUN dedup that exact dedup (Dedup.q32)
    * can't express, because the index is not part of the batch. Both inputs
    * expect a `text` column.
    *
    * Scale shape: the index at 100 TB is far too big to broadcast, so this
    * is a SHUFFLE left-semi join on the content hash — both sides partition
    * by the hash, matches resolve within partitions. (Contrast q97's
    * broadcast anti join, where the drop set is small.)
    */
  def batchDuplicates(batch: DataFrame, index: DataFrame): DataFrame = {
    val idx = index.select(sha2(col("text"), 256).as("h")).distinct()
    batch.withColumn("h", sha2(col("text"), 256))
      .join(idx, Seq("h"), "left_semi")
      .drop("h")
  }

  /** Incremental dedup report: the even-doc_id half plays the standing index
    * (prior crawls), the odd half the incoming batch; per-language new /
    * duplicate / fresh counts.
    */
  def q103IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val dup = batchDuplicates(batch, docs.where(col("doc_id") % 2 === 0))
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

  // ---------------------------------------------------------------- q208

  /** Corpus rebalancing to a uniform language mix — the training-mix step
    * that downsamples over-represented languages to the smallest class.
    * Per-language keep decisions are pure integer arithmetic: keep doc iff
    * hash(doc_id)·n_lang < target·2³², i.e. an exact cross-multiplied
    * Bernoulli(target/n_lang) over the hash space — no RNG state, no floats,
    * every executor decides rows independently, rerun-stable (the 100 TB
    * rejection-sampling shape). Class counts ride along as a broadcast join.
    */
  def q208CorpusRebalance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cnt = docs.groupBy(col("lang")).agg(count(lit(1)).cast("long").as("c"))
    val target = cnt.agg(min(col("c")).as("t"))
    val kept = docs
      .join(broadcast(cnt), "lang")
      .crossJoin(broadcast(target))
      .where(expr("((doc_id * 2654435761) % 4294967296) * c < t * 4294967296"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    cnt.crossJoin(broadcast(target))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("c").as("n_before"), col("t").as("target"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val q208Oracle: String =
    """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
      |mn AS (SELECT min(c) AS t FROM cnt),
      |k AS (SELECT d.lang FROM documents d JOIN cnt ON d.lang = cnt.lang, mn
      |      WHERE ((d.doc_id * 2654435761) % 4294967296) * cnt.c < mn.t * 4294967296),
      |kc AS (SELECT lang, count(*) AS n_kept FROM k GROUP BY 1)
      |SELECT cnt.lang, cnt.c AS n_before, mn.t AS target,
      |       coalesce(kc.n_kept, 0) AS n_kept
      |FROM cnt CROSS JOIN mn LEFT JOIN kc ON cnt.lang = kc.lang
      |ORDER BY cnt.lang""".stripMargin

  // ---------------------------------------------------------------- q211

  /** Stratified k-fold assignment (k=5): within each language stratum, docs
    * are ranked by a deterministic hash (doc_id tiebreak) and dealt
    * round-robin into folds — fold sizes within each stratum differ by at
    * most 1, the textbook stratified split, with no RNG and rerun-stable
    * assignment. One shuffle on the stratum key; the window is a streaming
    * rank. Emits the lang × fold occupancy audit.
    */
  def q211StratifiedKfold(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", expr("(doc_id * 2654435761) % 4294967296"))
      .withColumn("fold", ((row_number().over(w) - 1) % 5).cast("int"))
      .groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("fold"))
  }

  val q211Oracle: String =
    """WITH h AS (SELECT lang, doc_id, (doc_id * 2654435761) % 4294967296 AS h
      |           FROM documents),
      |f AS (SELECT lang,
      |        CAST((row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) - 1) % 5 AS INT) AS fold
      |      FROM h)
      |SELECT lang, fold, count(*) AS n_docs
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q214

  /** Context-window chunking — the RAG/pretraining prep step that splits
    * every document into overlapping token windows (40 tokens, stride 30).
    * Chunk boundaries are integer arithmetic over the token array; chunk
    * text is a slice+join (value copies, no computed floats). Map-side row
    * expansion only — no shuffle at any scale, the ideal 100 TB shape;
    * output order is the deterministic (doc_id, chunk_idx).
    */
  def q214ContextChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .select(col("doc_id"), col("n_toks"), col("toks"),
        explode(expr(
          "sequence(0, greatest((n_toks - 40 + 30 - 1) div 30, 0))")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
        expr("array_join(slice(toks, chunk_idx * 30 + 1, 40), ' ')").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val q214Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx, CAST(len(toks) AS INT) AS n_toks,
      |        array_to_string(toks[(i*30+1):(i*30+40)], ' ') AS chunk
      |      FROM t, LATERAL (SELECT unnest(range(0,
      |        greatest((len(toks) - 40 + 30 - 1) // 30, 0) + 1)) AS i) g)
      |SELECT doc_id, chunk_idx, n_toks, chunk
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q215

  /** Boilerplate audit per source: a sorted group's common prefix is
    * LCP(min(text), max(text)) — two cheap order statistics per group plus
    * ONE pairwise LCP (the custom codegen `common_prefix_length` kernel),
    * never a pairwise scan of the group. The oracle recomputes the LCP by
    * counting equal-prefix lengths over an uncorrelated position series.
    * One aggregation shuffle; the kernel runs on |sources| rows only.
    */
  def q215BoilerplateAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(min(col("text")).as("a"), max(col("text")).as("b"), count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        expr("common_prefix_length(a, b)").as("lcp_len"),
        expr("substring(a, 1, common_prefix_length(a, b))").as("boilerplate"))
      .orderBy(col("source"))

  val q215Oracle: String =
    """WITH mm AS (SELECT source, min(text) AS a, max(text) AS b, count(*) AS n_docs
      |            FROM documents GROUP BY 1),
      |g AS (SELECT unnest(range(1,
      |        1 + (SELECT max(least(length(a), length(b))) FROM mm))) AS i),
      |lcp AS (SELECT mm.source,
      |          CAST(sum(CASE WHEN i <= least(length(a), length(b))
      |                     AND substr(a, 1, CAST(i AS INT)) = substr(b, 1, CAST(i AS INT))
      |                   THEN 1 ELSE 0 END) AS INT) AS lcp_len
      |        FROM mm CROSS JOIN g GROUP BY 1)
      |SELECT mm.source, mm.n_docs, lcp.lcp_len,
      |       substr(mm.a, 1, lcp.lcp_len) AS boilerplate
      |FROM mm JOIN lcp ON mm.source = lcp.source
      |ORDER BY mm.source""".stripMargin

  // ---------------------------------------------------------------- q226

  /** Denylist term scrubbing — the PII-redaction machinery (regex match,
    * count, mask, measure) exercised on a term denylist, since this corpus
    * carries no synthetic PII. Per source: documents touched, total matches
    * and characters removed by masking. Both engines run the identical
    * word-boundary alternation (Java regex and RE2 agree on this subset);
    * all outputs are integer counts, and the scan is map-only ahead of one
    * small aggregation — at 100 TB this is the same single-pass shape as
    * q101's quality filter.
    */
  def q226TermScrub(spark: SparkSession, dir: String): DataFrame = {
    val pat = "\\b(customer|vector|stream)\\b"
    val h = Tables.documents(spark, dir).select(col("source"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("hits"),
      length(col("text")).as("chars_in"),
      length(regexp_replace(col("text"), pat, "#")).as("chars_out"))
    h.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("hits")).cast("long").as("total_hits"),
        sum(col("chars_in") - col("chars_out")).cast("long").as("chars_removed"))
      .orderBy(col("source"))
  }

  val q226Oracle: String =
    """WITH h AS (
      |  SELECT source,
      |    len(regexp_extract_all(text, '\b(customer|vector|stream)\b')) AS hits,
      |    length(text) AS chars_in,
      |    length(regexp_replace(text, '\b(customer|vector|stream)\b', '#', 'g')) AS chars_out
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
      |  CAST(sum(hits) AS BIGINT) AS total_hits,
      |  CAST(sum(chars_in - chars_out) AS BIGINT) AS chars_removed
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q260

  /** Temperature-sampled budget for the output corpus. */
  private val TempSampleN = 200

  /** Temperature sampling over language strata — the mT5/XLM-R corpus-mixing
    * rule: a language's share of the output is proportional to cnt^α with
    * α = 1/2, so head languages are down-weighted and tail languages
    * up-weighted relative to their raw frequency. Quota_l =
    * max(1, ⌊N·√cnt_l / Σ√cnt⌋); within each language the quota is filled by
    * the md5-ranked deterministic draw (the q99 idiom — reproducible without
    * an RNG).
    *
    * Determinism: α = 1/2 means the weight is sqrt — IEEE-exact, unlike a
    * general pow (whose libm rounding differs across engines); the weight
    * SUM folds in sorted language order (the q68 sorted-fold idiom), and the
    * quota floor(·) of a bit-identical double matches bit-for-bit.
    *
    * Scale shape: one groupBy for counts, a broadcast 1-row weight sum, one
    * per-stratum rank window — with the same giant-stratum pre-filter note
    * as [[stratifiedSample]] at 100 TB.
    */
  def q260TemperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val wsum = broadcast(cnts.agg(expr(
      "aggregate(array_sort(collect_list(struct(lang, sqrt(CAST(cnt AS DOUBLE)) AS w))), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v.w)").as("wsum")))
    val quotas = cnts.crossJoin(wsum)
      .withColumn("quota",
        greatest(lit(1L),
          floor(lit(TempSampleN) * sqrt(col("cnt").cast("double")) / col("wsum"))))
      .select(col("lang"), col("quota"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "lang")
      .where(col("rk") <= col("quota"))
      .select(col("lang"), col("quota"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  val q260Oracle: String =
    s"""WITH cnts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
       |wsum AS (SELECT list_reduce([CAST(0 AS DOUBLE)] ||
       |    list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY lang), (acc, v) -> acc + v) AS wsum
       |  FROM cnts),
       |quotas AS (SELECT lang,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(floor($TempSampleN * sqrt(CAST(cnt AS DOUBLE)) / wsum) AS BIGINT)) AS quota
       |  FROM cnts, wsum),
       |ranked AS (SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |SELECT lang, quota, rk, doc_id
       |FROM ranked JOIN quotas USING (lang)
       |WHERE rk <= quota ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q275

  /** The curation CAPSTONE: the full training-corpus assembly line as ONE
    * composed query — exact dedup (content-hash keep-first, q32) → quality
    * gate (length + token floor, the q101 family) → eval-set
    * decontamination (drop anything sharing a 20-char shingle with the
    * eval slice, q98's [[contaminatedDocs]] kernel) → temperature-sampled
    * language mix (α=1/2 quotas filled by the md5 draw, q260). Every stage
    * is an operator already proven in isolation; this query proves they
    * COMPOSE — one lazy DAG, no intermediate materialization, each stage's
    * shuffle feeding the next. Emits the per-language assembly report
    * (quota, selected count, id range). The oracle is the same chain in
    * SQL, each stage its proven oracle idiom.
    */
  def q275CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 50 === 0
    // 1. exact dedup — keep the first (min doc_id) copy of identical text
    val wDedup = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = docs.withColumn("rn", row_number().over(wDedup))
      .where(col("rn") === 1).drop("rn")
    // 2. quality gate — cheap deterministic floors (map-only)
    val quality = deduped
      .where(col("n_chars") >= 100 && expr("token_count(text) >= 20"))
    // 3. decontamination — candidates are non-eval; one shared 20-char
    // shingle with the eval slice disqualifies
    val clean = quality.where(!isEval)
      .join(contaminatedDocs(docs, isEval, 20).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // 4. temperature-sampled language mix (α = 1/2, N = 150)
    val cnts = clean.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val wsum = broadcast(cnts.agg(expr(
      "aggregate(array_sort(collect_list(struct(lang, sqrt(CAST(cnt AS DOUBLE)) AS w))), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v.w)").as("wsum")))
    val quotas = cnts.crossJoin(wsum)
      .withColumn("quota", greatest(lit(1L),
        floor(lit(150) * sqrt(col("cnt").cast("double")) / col("wsum"))))
      .select(col("lang"), col("quota"))
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    clean.withColumn("rk", row_number().over(wRank).cast("long"))
      .join(broadcast(quotas), "lang")
      .where(col("rk") <= col("quota"))
      .groupBy(col("lang"), col("quota"))
      .agg(count(lit(1)).as("n_selected"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"))
  }

  val q275Oracle: String =
    s"""WITH ${Dedup.hashedShingleCte},
       |ev AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE doc_id % 50 = 0),
       |contam AS (
       |  SELECT DISTINCT t.doc_id
       |  FROM (SELECT doc_id, unnest(hs) AS h FROM hs WHERE doc_id % 50 <> 0) t
       |  JOIN ev USING (h)),
       |dedup AS (
       |  SELECT doc_id, lang, text, n_chars FROM (
       |    SELECT d.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM documents d) WHERE rn = 1),
       |quality AS (
       |  SELECT * FROM dedup
       |  WHERE n_chars >= 100 AND len(string_split(text, ' ')) >= 20),
       |clean AS (
       |  SELECT doc_id, lang FROM quality
       |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contam)),
       |cnts AS (SELECT lang, count(*) AS cnt FROM clean GROUP BY lang),
       |wsum AS (SELECT list_reduce([CAST(0 AS DOUBLE)] ||
       |    list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY lang), (acc, v) -> acc + v) AS wsum
       |  FROM cnts),
       |quotas AS (SELECT lang,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(floor(150 * sqrt(CAST(cnt AS DOUBLE)) / wsum) AS BIGINT)) AS quota
       |  FROM cnts, wsum),
       |ranked AS (SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM clean)
       |SELECT lang, quota, count(*) AS n_selected,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM ranked JOIN quotas USING (lang)
       |WHERE rk <= quota
       |GROUP BY lang, quota ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q311

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling"): rank raw documents by how much
    * their HASHED-BIGRAM feature profile resembles a target domain versus
    * the raw corpus. Features are the hashing-trick buckets q283
    * established (md5 → 256 buckets, vocabulary-free — the property that
    * makes the featurizer viable at 100 TB); the target distribution is
    * the English slice, the raw distribution is everything. Where DSIR
    * scores log p_t(x) − p_r(x) under hashed n-gram LMs, this ranks by the
    * AFFINITY RATIO dot(c_doc, c_target) / dot(c_doc, c_raw) — the same
    * "target-like vs raw-like" ordering built from exact int64 dot
    * products and ONE IEEE division, where the log-likelihood difference
    * would be a per-term libm lottery (q281's determinism rule). Both dot
    * products are order-independent integer sums, so the score is
    * bit-identical across engines and partitionings; selection takes the
    * top-25 deterministically (production would Gumbel-sample with these
    * scores as weights; determinism is what an oracle-checked pipeline
    * wants).
    *
    * Scale shape: bucket histograms are one shuffle each (256·|langs|
    * groups); target/raw profiles broadcast (256 rows); the per-doc score
    * is a map-side join + one doc-keyed aggregation; top-25 is
    * TakeOrdered. No vocabulary state anywhere.
    */
  def q311DsirResample(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
    val docBg = toks.select(col("doc_id"), col("lang"), explode(expr(
      "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .withColumn("bucket",
        (conv(substring(md5(concat(col("b.w1"), lit(" "), col("b.w2"))), 1, 8), 16, 10)
          .cast("long") % 256).cast("int"))
      .select(col("doc_id"), col("lang"), col("bucket"))
    val docFeat = docBg.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    val target = docBg.where(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val raw = docBg.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    docFeat
      .join(broadcast(target), Seq("bucket"), "left")
      .join(broadcast(raw), Seq("bucket"))
      .groupBy(col("doc_id")).agg(
        sum(col("c") * coalesce(col("ct"), lit(0L))).as("dot_t"),
        sum(col("c") * col("cr")).as("dot_r"))
      .withColumn("score", col("dot_t") / col("dot_r"))
      .orderBy(col("score").desc, col("doc_id")).limit(25)
      .select(col("doc_id"), col("dot_t"), col("dot_r"), col("score"))
  }

  val q311Oracle: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT doc_id, lang,
      |         unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS b FROM t),
      |h AS (SELECT doc_id, lang,
      |        CAST(list_reduce([strpos('0123456789abcdef', substr(md5(b), i, 1)) - 1
      |                          for i in range(1, 9)], (a, b) -> a * 16 + b) % 256 AS INT)
      |          AS bucket
      |      FROM bg),
      |df AS (SELECT doc_id, bucket, count(*) AS c FROM h GROUP BY 1, 2),
      |tgt AS (SELECT bucket, count(*) AS ct FROM h WHERE lang = 'en' GROUP BY 1),
      |raw AS (SELECT bucket, count(*) AS cr FROM h GROUP BY 1),
      |sc AS (SELECT doc_id,
      |         CAST(sum(c * COALESCE(ct, 0)) AS BIGINT) AS dot_t,
      |         CAST(sum(c * cr) AS BIGINT) AS dot_r
      |       FROM df LEFT JOIN tgt USING (bucket) JOIN raw USING (bucket)
      |       GROUP BY 1)
      |SELECT doc_id, dot_t, dot_r, dot_t / dot_r AS score
      |FROM sc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- q325

  /** DETERMINISTIC EPOCH SHUFFLE — the per-epoch training-data permutation
    * at 100 TB: no RNG state, no global row numbering. Each (epoch, doc)
    * gets an integer hash from the house multiplicative scheme with the
    * epoch folded in (`h = (doc_id·2654435761 + epoch·40503) mod 2³²`),
    * the doc lands in shard `h mod K`, and WITHIN its shard the epoch
    * order is `(h, doc_id)`. Different epochs give different
    * permutations; reruns give the same one — every executor decides
    * placement independently (map-only), and the only sort is per-shard,
    * which IS the shard-file write order a training pipeline needs
    * anyway. Contrast the naive `ORDER BY rand()`: a global sort with
    * non-reproducible output and RNG state per task.
    *
    * Emits the per-(epoch, shard) audit: occupancy, token mass, and an
    * ORDER CHECKSUM (Σ rank·doc_id over the within-shard epoch order) —
    * the checksum pins the exact permutation cross-engine, not just
    * membership, so the oracle hash-match proves both engines would feed
    * identical batch streams.
    */
  private val ShuffleShards = 4

  def q325EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        explode(expr("sequence(0L, 1L)")).as("epoch"))
      .withColumn("h",
        expr("(doc_id * 2654435761 + epoch * 40503) % 4294967296"))
      .withColumn("shard", col("h") % lit(ShuffleShards))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("rn") * col("doc_id")).as("order_checksum"))
      .orderBy(col("epoch"), col("shard"))
  }

  val q325Oracle: String =
    s"""WITH e AS (SELECT doc_id, n_chars, unnest(range(0, 2)) AS epoch FROM documents),
       |h AS (SELECT doc_id, n_chars, epoch,
       |        (doc_id * 2654435761 + epoch * 40503) % 4294967296 AS h
       |      FROM e),
       |s AS (SELECT epoch, h % $ShuffleShards AS shard, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY epoch, h % $ShuffleShards
       |                           ORDER BY h, doc_id) AS rn
       |      FROM h)
       |SELECT epoch, shard, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(rn * doc_id) AS BIGINT) AS order_checksum
       |FROM s GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q325_epoch_shuffle", q325EpochShuffle, q325Oracle),
    GraftQuery.sql("q311_dsir_resample", q311DsirResample, q311Oracle),
    GraftQuery.sql("q275_curation_pipeline", q275CurationPipeline, q275Oracle),
    GraftQuery.sql("q260_temperature_sample", q260TemperatureSample, q260Oracle),
    GraftQuery.sql("q226_term_scrub", q226TermScrub, q226Oracle),
    GraftQuery.sql("q208_corpus_rebalance", q208CorpusRebalance, q208Oracle),
    GraftQuery.sql("q211_stratified_kfold", q211StratifiedKfold, q211Oracle),
    GraftQuery.sql("q214_context_chunks", q214ContextChunks, q214Oracle),
    GraftQuery.sql("q215_boilerplate_audit", q215BoilerplateAudit, q215Oracle),
    GraftQuery.sql("q98_decontaminate", q98Decontaminate, q98Oracle),
    GraftQuery.sql("q99_stratified_sample", q99StratifiedSample, q99Oracle),
    GraftQuery.sql("q100_pack_context", q100PackContext, q100Oracle),
    GraftQuery.sql("q101_quality_filter", q101QualityFilter, q101Oracle),
    GraftQuery.sql("q102_random_projection", q102RandomProjection, q102Oracle),
    GraftQuery.sql("q103_incremental_dedup", q103IncrementalDedup, q103Oracle)
  )
}
