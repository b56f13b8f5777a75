package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Text-analysis operators for an LLM-data pipeline: marker-based language
  * scoring, quality heuristics (C4-style), and corpus token statistics.
  * Everything is exact integer / single-IEEE-op arithmetic so DuckDB
  * reproduces it bit-for-bit.
  */
object TextAnalysis {

  /** Marker tokens scored per doc (exact token match, frequency counted). */
  private val Markers = Seq("the", "data", "query", "fast", "slow")

  /** Language-ID-style marker scoring: count each marker token per document
    * and pick the dominant one (fixed priority order breaks ties).
    */
  def q37LangMarkers(spark: SparkSession, dir: String): DataFrame = {
    val counts = Markers.map(m =>
      expr(s"size(filter(split(text, ' '), t -> t = '$m'))").as(s"c_$m"))
    val top = Markers.foldRight(lit("none")) { (m, rest) =>
      val others = Markers.filterNot(_ == m).map(o => col(s"c_$o"))
      when(col(s"c_$m") >= greatest(others: _*) && col(s"c_$m") > 0,
        lit(m)).otherwise(rest)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id") +: col("lang") +: counts: _*)
      .withColumn("top_marker", top)
      .orderBy(col("doc_id"))
  }

  val q37Oracle: String = {
    val cnt = Markers.map(m =>
      s"len(list_filter(string_split(text, ' '), t -> t = '$m')) AS c_$m").mkString(",\n  ")
    val top = Markers.reverse.foldLeft("'none'") { (rest, m) =>
      val others = Markers.filterNot(_ == m).map(o => s"c_$o")
      s"CASE WHEN c_$m >= greatest(${others.mkString(", ")}) AND c_$m > 0 THEN '$m' ELSE $rest END"
    }
    s"""SELECT doc_id, lang, c_the, c_data, c_query, c_fast, c_slow,
       |  $top AS top_marker
       |FROM (SELECT doc_id, lang,
       |  $cnt
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** C4-style quality heuristics: whitespace + BPE-ish regex token counts,
    * mean token length, stopword ratio, a weighted score, and a boolean
    * keep/drop verdict.
    */
  def q38QualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("n_re_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
      .withColumn("chars_nospace", length(regexp_replace(col("text"), " ", "")))
      .withColumn("stop_cnt",
        expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of')))"))
      .withColumn("avg_tok_len", col("chars_nospace") / col("n_tokens"))
      .withColumn("stop_ratio", col("stop_cnt") / col("n_tokens"))
      .withColumn("score", col("avg_tok_len") * 0.5 + col("stop_ratio") * 10.0)
      .withColumn("quality_pass", col("n_tokens") >= 30 && col("stop_cnt") >= 1)
      .select("doc_id", "n_tokens", "n_re_tokens", "chars_nospace", "stop_cnt",
        "avg_tok_len", "stop_ratio", "score", "quality_pass")
      .orderBy(col("doc_id"))

  val q38Oracle: String =
    """SELECT doc_id, n_tokens, n_re_tokens, chars_nospace, stop_cnt,
      |  chars_nospace / n_tokens AS avg_tok_len,
      |  stop_cnt / n_tokens AS stop_ratio,
      |  (chars_nospace / n_tokens) * 0.5 + (stop_cnt / n_tokens) * 10.0 AS score,
      |  n_tokens >= 30 AND stop_cnt >= 1 AS quality_pass
      |FROM (SELECT doc_id,
      |        len(string_split(text, ' ')) AS n_tokens,
      |        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_re_tokens,
      |        length(replace(text, ' ', '')) AS chars_nospace,
      |        len(list_filter(string_split(text, ' '),
      |                        t -> t IN ('the', 'a', 'of'))) AS stop_cnt
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Corpus token statistics per language: docs, total tokens, vocabulary. */
  def q39TokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct(col("tok")).as("vocab"),
        min(length(col("tok"))).as("min_tok_len"),
        max(length(col("tok"))).as("max_tok_len"))
      .orderBy(col("lang"))

  val q39Oracle: String =
    """SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS total_tokens,
      |  count(DISTINCT tok) AS vocab,
      |  min(length(tok)) AS min_tok_len, max(length(tok)) AS max_tok_len
      |FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Top-5 word bigrams per language: pair adjacent tokens per doc (guarded
    * for single-token docs — Spark's `sequence(1, 0)` would count DOWN),
    * explode, count per (lang, bigram), rank. The heavy shuffle keys on
    * (lang, bigram) — high cardinality, skew-free.
    */
  def q63BigramTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(desc("cnt"), asc("bigram"))
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("bigram", explode(expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END")))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select("lang", "bigram", "cnt", "rn")
      .orderBy(col("lang"), col("rn"))
  }

  val q63Oracle: String =
    """SELECT lang, bigram, cnt, rn FROM (
      |  SELECT lang, bigram, cnt,
      |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn
      |  FROM (
      |    SELECT lang, bigram, count(*) AS cnt FROM (
      |      SELECT lang, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bigram
      |      FROM (SELECT lang, string_split(text, ' ') AS t FROM documents))
      |    GROUP BY lang, bigram))
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin

  /** Text normalization for dedup keys: digits → <num>, whitespace squashed,
    * trimmed; emit the normalized fingerprint. (DuckDB's regexp_replace
    * needs the 'g' flag — it replaces only the first match by default,
    * Spark always replaces all.)
    */
  def q64TextNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(trim(regexp_replace(regexp_replace(col("text"), "[0-9]+", "<num>"),
          "  +", " "))).as("norm_md5"),
        length(trim(regexp_replace(regexp_replace(col("text"), "[0-9]+", "<num>"),
          "  +", " "))).as("norm_len"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_numbers"))
      .orderBy(col("doc_id"))

  val q64Oracle: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(text, '[0-9]+', '<num>', 'g'),
      |      '  +', ' ', 'g'))) AS norm_md5,
      |  length(trim(regexp_replace(regexp_replace(text, '[0-9]+', '<num>', 'g'),
      |      '  +', ' ', 'g'))) AS norm_len,
      |  len(regexp_extract_all(text, '[0-9]+', 0)) AS n_numbers
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Lexical diversity per document: vocabulary size, hapax count, and
    * type-token ratio — one (doc_id, token) aggregation, then per-doc
    * rollup; both shuffles key on high-cardinality compounds.
    */
  def q65LexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tok_cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tok_cnt")).as("total_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("tok_cnt") === 1, 1L).otherwise(0L)).as("hapax"))
      .withColumn("ttr",
        col("vocab").cast("double") / col("total_tokens").cast("double"))
      .orderBy(col("doc_id"))

  val q65Oracle: String =
    """SELECT doc_id, total_tokens, vocab, hapax,
      |  CAST(vocab AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS ttr
      |FROM (
      |  SELECT doc_id, CAST(sum(tok_cnt) AS BIGINT) AS total_tokens,
      |    count(*) AS vocab,
      |    CAST(sum(CASE WHEN tok_cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM (
      |    SELECT doc_id, tok, count(*) AS tok_cnt
      |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Document-length histogram: fixed 200-char buckets with corpus share —
    * integer bucketing plus an exact-integer double division.
    */
  def q66LengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.documents(spark, dir)
      .withColumn("bucket", expr("n_chars div 200"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("doc_cnt"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("share",
        col("doc_cnt").cast("double") / sum(col("doc_cnt")).over(w).cast("double"))
      .orderBy(col("bucket"))
  }

  val q66Oracle: String =
    """SELECT bucket, doc_cnt, min_chars, max_chars,
      |  CAST(doc_cnt AS DOUBLE) / CAST(sum(doc_cnt) OVER () AS DOUBLE) AS share
      |FROM (
      |  SELECT n_chars // 200 AS bucket, count(*) AS doc_cnt,
      |    min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |  FROM documents GROUP BY 1)
      |ORDER BY bucket""".stripMargin

  /** TF-IDF-style top terms per document. The IDF factor is the BM25-ish
    * RATIO (N − df + 0.5)/(df + 0.5) rather than a logarithm: ln() is a libm
    * call with no cross-engine bit guarantee, while the ratio is two exact
    * int→double conversions, one subtraction, two additions and a division —
    * all IEEE-identical. Ranking (and thus output) matches what log-IDF
    * would produce since the ratio is monotone in df.
    *
    * Scale shape: (doc, tok) and (tok) aggregations shuffle on high-
    * cardinality keys; the corpus size N broadcasts as a 1-row scalar.
    */
  def q71TfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(desc("score"), asc("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score", expr(
        "CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("doc_id", "tok", "tf", "df", "score", "rn")
      .orderBy(col("doc_id"), col("rn"))
  }

  val q71Oracle: String =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, tok, tf, df, score, rn FROM (
      |  SELECT doc_id, tok, tf, df,
      |    CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) AS score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY
      |      CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) DESC,
      |      tok) AS rn
      |  FROM tf JOIN dfreq USING (tok), n)
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  /** Gopher-style repetition filters: per-doc duplicate word-3-gram fraction
    * plus the hottest single token's count. The 3-gram stats are map-only
    * array arithmetic (one pass per doc); the top-token count is the standard
    * two-level aggregation (doc × token → doc), shuffle-partitioned on the
    * doc id — no per-doc collect, scales with the corpus. Index access uses
    * try_element_at so ANSI mode cannot throw at the tail; concat_ws skips
    * nulls identically in both engines.
    */
  def q93RepetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val gramStats = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("grams", expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), i -> " +
          "concat_ws(' ', try_element_at(toks, i), try_element_at(toks, i + 1), " +
          "try_element_at(toks, i + 2)))"))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        size(col("grams")).as("n_3grams"),
        size(array_distinct(col("grams"))).as("uniq_3grams"))
      .withColumn("rep3_fraction",
        lit(1.0).cast("double") -
          col("uniq_3grams").cast("double") / col("n_3grams").cast("double"))
    val topTok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_tok_cnt"))
    gramStats.join(topTok, "doc_id")
      .select("doc_id", "n_tokens", "n_3grams", "uniq_3grams", "rep3_fraction",
        "top_tok_cnt")
      .orderBy(col("doc_id"))
  }

  val q93Oracle: String =
    """WITH g AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    [concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])
      |     for i in range(1, greatest(len(toks) - 2, 1) + 1)] AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |gs AS (
      |  SELECT doc_id, n_tokens, len(grams) AS n_3grams,
      |    len(list_distinct(grams)) AS uniq_3grams
      |  FROM g),
      |tt AS (
      |  SELECT doc_id, max(c) AS top_tok_cnt FROM (
      |    SELECT doc_id, tok, count(*) AS c
      |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_3grams, uniq_3grams,
      |  CAST(1.0 AS DOUBLE) - CAST(uniq_3grams AS DOUBLE) / CAST(n_3grams AS DOUBLE)
      |    AS rep3_fraction,
      |  top_tok_cnt
      |FROM gs JOIN tt USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Deterministic train/validation/test corpus split: md5 the doc id, take
    * the first 16 bits mod 100, cut at 80/90. Pure per-row arithmetic — no
    * RNG state, no coordination; the same document lands in the same split
    * on any cluster at any scale, which is what makes held-out sets stable
    * across pipeline re-runs.
    */
  def q94CorpusSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100"))
      .withColumn("part",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("part"))

  val q94Oracle: String =
    """SELECT part, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM (
      |  SELECT CASE WHEN bucket < 80 THEN 'train'
      |              WHEN bucket < 90 THEN 'validation'
      |              ELSE 'test' END AS part, n_chars
      |  FROM (
      |    SELECT n_chars,
      |      list_reduce([strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
      |                   for i in range(1, 5)], (a, b) -> a * 16 + b) % 100 AS bucket
      |    FROM documents))
      |GROUP BY part ORDER BY part""".stripMargin

  /** Token-budget shard packing: assign documents to fixed-budget training
    * shards (4000 tokens each) in deterministic doc_id order, per language.
    * The running token total is a PARTITIONED cumulative window (one shuffle
    * on lang, sort within partition) — the scalable shape; a single global
    * running sum would serialize through one task, so the partition key is
    * part of the contract (at 100 TB: per-(lang, date-bucket) shards, with
    * per-partition prefix offsets if a truly global order is required).
    * shard = floor((cum − toks) / budget): a doc belongs to the shard its
    * FIRST token lands in, so every shard except a language's last holds
    * ≥ budget tokens and no doc is split.
    */
  def q96ShardPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard", expr("CAST((cum - toks) DIV 4000 AS BIGINT)"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_tokens"))
      .orderBy(col("lang"), col("shard"))
  }

  val q96Oracle: String =
    """SELECT lang, shard, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_tokens
      |FROM (
      |  SELECT lang, toks,
      |    CAST((sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks)
      |         // 4000 AS BIGINT) AS shard
      |  FROM (SELECT lang, doc_id, len(string_split(text, ' ')) AS toks FROM documents))
      |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin

  // ---------------------------------------------------------------- q146

  /** χ² term–class association: which tokens are over/under-represented in
    * which language. Per (token, lang) the 2×2 contingency cells are pure
    * integer counts (distinct doc-token pairs vs per-lang doc counts), and
    * χ² = N·(o11·o22 − o12·o21)² / (df·(N−df)·n_l·(N−n_l)) is evaluated as
    * ONE IEEE division of two exactly-computed integer products — no
    * order-dependent float summation anywhere, so the ranking is
    * bit-reproducible. Common tokens only (df ≥ N/20, integer test), top 50.
    * All factors fit int64 through sf≈1 (N·(N²/4)² needs N ≲ 2.6·10⁴); a
    * 100 TB corpus would upcast the two products to decimal(38,0) before
    * the final division — same one-division determinism argument.
    */
  def q146Chi2Terms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val dt = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val dl = docs.select(col("doc_id"), col("lang"))
    val nn = docs.count()
    val tl = dt.join(dl, "doc_id").groupBy(col("token"), col("lang"))
      .agg(count(lit(1)).as("o11"))
    val tt = dt.groupBy(col("token")).agg(count(lit(1)).as("df_t"))
    val ll = dl.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val det = col("o11") * (lit(nn) - col("df_t") - col("n_l") + col("o11")) -
      (col("df_t") - col("o11")) * (col("n_l") - col("o11"))
    tl.join(tt, "token").join(broadcast(ll), "lang")
      .where(col("df_t") * 20 >= nn)
      .withColumn("chi2",
        (lit(nn) * det * det).cast("double") /
          (col("df_t") * (lit(nn) - col("df_t")) * col("n_l") * (lit(nn) - col("n_l")))
            .cast("double"))
      .select(col("token"), col("lang"), col("o11"), col("df_t"), col("n_l"), col("chi2"))
      .orderBy(col("chi2").desc, col("token"), col("lang"))
      .limit(50)
  }

  val q146Oracle: String =
    """WITH dt AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |           FROM documents),
      |dl AS (SELECT doc_id, lang FROM documents),
      |n AS (SELECT count(*) AS nn FROM documents),
      |tl AS (SELECT token, lang, count(*) AS o11 FROM dt JOIN dl USING (doc_id)
      |       GROUP BY 1, 2),
      |tt AS (SELECT token, count(*) AS df_t FROM dt GROUP BY 1),
      |ll AS (SELECT lang, count(*) AS n_l FROM dl GROUP BY 1)
      |SELECT token, lang, o11, df_t, n_l,
      |  CAST(nn * (o11*(nn-df_t-n_l+o11) - (df_t-o11)*(n_l-o11))
      |          * (o11*(nn-df_t-n_l+o11) - (df_t-o11)*(n_l-o11)) AS DOUBLE)
      |  / CAST(df_t*(nn-df_t)*n_l*(nn-n_l) AS DOUBLE) AS chi2
      |FROM tl JOIN tt USING (token) JOIN ll USING (lang), n
      |WHERE df_t * 20 >= nn
      |ORDER BY chi2 DESC, token, lang
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q155

  /** Count-Min sketch (depth 4 × width 512) over the token stream, with the
    * estimate audited against exact counts for the 20 most frequent tokens.
    * The sketch build is ONE aggregation to 2048 integer cells (map-side
    * combine collapses the 4× row amplification before the shuffle), and
    * the point-query side joins 80 probe rows against the broadcast cell
    * table — the mergeable, fixed-memory frequency structure a 100 TB
    * pipeline keeps per shard and ORs together, where an exact per-token
    * count would be a full shuffle of the token space. Hash rows use the
    * corpus-wide md5-fold convention (first 8 hex chars as an integer —
    * identical in both engines), so every cell, estimate, and the
    * CMS ≥ exact overestimate guarantee is bit-reproducible.
    */
  def q155CountminEstimate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    // r14 opt (guide §1.2 per-task work): count tokens FIRST, then hash.
    // The sketch cell (r, bucket) count = Σ counts of the tokens hashing
    // there, so the 4 md5 rows per token need only be computed per
    // DISTINCT token, not per occurrence — the occurrence stream passes
    // through ONE plain count aggregation (identical to the exact-count
    // branch, so the two branches share one exchange via ReuseExchange)
    // and the 4x md5 amplification runs over the vocabulary only.
    val tokCounts = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
    val cells = tokCounts
      .select(col("tok"), col("exact_cnt"), explode(sequence(lit(0), lit(3))).as("r"))
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(concat(tok, '#', r)), 1, 8), 16, 10) AS BIGINT) % 512"))
      .groupBy(col("r"), col("bucket")).agg(sum(col("exact_cnt")).as("cnt"))
    val exact = tokCounts
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    val probes = exact
      .select(col("tok"), col("exact_cnt"), explode(sequence(lit(0), lit(3))).as("r"))
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(concat(tok, '#', r)), 1, 8), 16, 10) AS BIGINT) % 512"))
    probes.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overestimate"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  val q155Oracle: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |rows_ AS (
      |  SELECT tok, r,
      |    list_reduce([strpos('0123456789abcdef',
      |                        substr(md5(tok || '#' || r), i, 1)) - 1
      |                 for i in range(1, 9)], (a, b) -> a * 16 + b) % 512 AS bucket
      |  FROM toks, (SELECT unnest(range(0, 4)) AS r) rs),
      |cells AS (SELECT r, bucket, count(*) AS cnt FROM rows_ GROUP BY 1, 2),
      |exact AS (SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY 1
      |          ORDER BY exact_cnt DESC, tok LIMIT 20),
      |probes AS (
      |  SELECT tok, exact_cnt, r,
      |    list_reduce([strpos('0123456789abcdef',
      |                        substr(md5(tok || '#' || r), i, 1)) - 1
      |                 for i in range(1, 9)], (a, b) -> a * 16 + b) % 512 AS bucket
      |  FROM exact, (SELECT unnest(range(0, 4)) AS r) rs)
      |SELECT tok, exact_cnt, CAST(min(cnt) AS BIGINT) AS cms_est,
      |  CAST(min(cnt) - exact_cnt AS BIGINT) AS overestimate
      |FROM probes JOIN cells USING (r, bucket)
      |GROUP BY tok, exact_cnt
      |ORDER BY exact_cnt DESC, tok""".stripMargin

  // ---------------------------------------------------------------- q170

  /** Weighted Jaccard between language sub-corpora over token FREQUENCY
    * vectors: J_w = Σ_t min(c_a, c_b) / Σ_t max(c_a, c_b), with the union
    * denominator computed by the exact identity Σmax = tot_a + tot_b − Σmin
    * — so only SHARED tokens ever join (an equi-join on the token), and
    * tokens unique to one corpus enter through the broadcast per-lang
    * totals. All integer sums; one IEEE division per pair. The
    * distribution-level near-dup / domain-shift measure corpus curation
    * uses above the document level.
    */
  def q170WeightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (r14, the q110 discipline): cnt feeds the totals agg
    // AND both self-join sides — tokenize + count once.
    val cnt = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = cnt.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    val shared = cnt.select(col("lang").as("la"), col("tok"), col("c").as("ca"))
      .join(cnt.select(col("lang").as("lb"), col("tok"), col("c").as("cb")), Seq("tok"))
      .where(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(least(col("ca"), col("cb"))).as("smin"))
    shared
      .join(broadcast(totals.select(col("lang").as("la"), col("tot").as("tot_a"))), "la")
      .join(broadcast(totals.select(col("lang").as("lb"), col("tot").as("tot_b"))), "lb")
      .select(col("la"), col("lb"), col("smin"),
        (col("tot_a") + col("tot_b") - col("smin")).as("smax"),
        (col("smin").cast("double") /
          (col("tot_a") + col("tot_b") - col("smin")).cast("double")).as("weighted_jaccard"))
      .orderBy(col("la"), col("lb"))
  }

  val q170Oracle: String =
    """WITH cnt AS (
      |  SELECT lang, tok, count(*) AS c FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
      |shared AS (
      |  SELECT a.lang AS la, b.lang AS lb,
      |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin
      |  FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.lang < b.lang
      |  GROUP BY 1, 2)
      |SELECT la, lb, smin, ta.tot + tb.tot - smin AS smax,
      |  CAST(smin AS DOUBLE) / CAST(ta.tot + tb.tot - smin AS DOUBLE)
      |    AS weighted_jaccard
      |FROM shared
      |JOIN totals ta ON ta.lang = la
      |JOIN totals tb ON tb.lang = lb
      |ORDER BY la, lb""".stripMargin

  // ---------------------------------------------------------------- q177

  /** Grouped multi-quantile summary: p25/p50/p75 of document length per
    * language, every quantile a RANK-PICKED integer (nearest-rank on the
    * (n_chars, doc_id) total order — no interpolation, no float quantile
    * surface). One window pass per group then a conditional-max rollup;
    * groups rank independently, so the shuffle is by lang and each
    * language's ranking streams through its own partition.
    */
  def q177GroupedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(byLang.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .groupBy(col("lang"), col("n"))
      .agg(
        max(when(col("rn") === expr("(n + 3) div 4"), col("n_chars"))).as("p25"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).as("p50"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("n_chars"))).as("p75"))
      .orderBy(col("lang"))
  }

  val q177Oracle: String =
    """WITH r AS (SELECT lang, n_chars,
      |             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |             count(*) OVER (PARTITION BY lang) AS n
      |           FROM documents)
      |SELECT lang, n,
      |  max(CASE WHEN rn = (n + 3) // 4 THEN n_chars END) AS p25,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
      |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END) AS p75
      |FROM r GROUP BY 1, 2 ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q195

  /** Label-vs-signal confusion matrix: the declared `lang` label crossed
    * with the marker-based detector's verdict (q37's deterministic argmax)
    * — the label-quality audit a curation pipeline runs before trusting
    * either column, with each cell's share of its declared-label row
    * (exact integer counts, one IEEE division via a window total).
    */
  def q195LangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    q37LangMarkers(spark, dir)
      .groupBy(col("lang"), col("top_marker"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(byLang))
      .select(col("lang"), col("top_marker"), col("n"),
        (col("n").cast("double") / col("lang_total").cast("double")).as("share"))
      .orderBy(col("lang"), col("top_marker"))
  }

  val q195Oracle: String = {
    val cnt = Markers.map(m =>
      s"len(list_filter(string_split(text, ' '), t -> t = '$m')) AS c_$m").mkString(",\n  ")
    val top = Markers.reverse.foldLeft("'none'") { (rest, m) =>
      val others = Markers.filterNot(_ == m).map(o => s"c_$o")
      s"CASE WHEN c_$m >= greatest(${others.mkString(", ")}) AND c_$m > 0 THEN '$m' ELSE $rest END"
    }
    s"""WITH g AS (
       |  SELECT lang, $top AS top_marker
       |  FROM (SELECT doc_id, lang,
       |    $cnt
       |    FROM documents)),
       |c AS (SELECT lang, top_marker, count(*) AS n FROM g GROUP BY 1, 2)
       |SELECT lang, top_marker, n,
       |  CAST(n AS DOUBLE) /
       |    CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS share
       |FROM c ORDER BY lang, top_marker""".stripMargin
  }

  // ---------------------------------------------------------------- q242

  /** BM25 document retrieval for a fixed multi-term query — the ranking
    * function behind keyword search over a training corpus (finding docs to
    * audit, decontaminate, or upweight). Classic Okapi shape per term:
    * idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with k1=1.2, b=0.75 —
    * except idf uses Robertson's raw odds ratio (N−df+0.5)/(df+0.5) WITHOUT
    * the log (the same exact-arithmetic family as q71's TF-IDF): every term
    * score is then a rational of exact integers evaluated in identically-
    * ordered IEEE ops, so both engines produce bit-identical doubles where
    * a log would differ in final ULPs between libm implementations. The
    * per-term monotonicity of BM25 is preserved; only cross-term weighting
    * differs from the textbook constant.
    *
    * Scale shape: tf is one shuffle on (doc_id, term) over the posting rows
    * of the query terms only; df is a tiny broadcast; doc lengths join on
    * doc_id (O(docs) — shuffle join, never broadcast); the corpus stats ride
    * along as a broadcast 1-row aggregate. Per-doc term sums go through
    * DECIMAL so summation order never enters the hash.
    */
  def q242Bm25Retrieval(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(15)

  /** BM25 scoring core for the fixed query terms — (doc_id, n_terms, sum_tf,
    * bm25) for every doc containing at least one term; shared by q242's
    * ranked retrieval face and q252's hybrid-fusion keyword leg.
    */
  private[operators] def bm25Scores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val terms = Seq("vector", "stream", "scan")
    val tf = toks.where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("term_score", expr(
        "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)) * " +
          "((CAST(tf AS DOUBLE) * 2.2D) / (CAST(tf AS DOUBLE) + 1.2D * " +
          "(0.25D + 0.75D * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("sum_tf"),
        sum(col("term_score").cast("decimal(18,6)")).cast("double").as("bm25"))
  }

  val q242Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
      |       WHERE tok IN ('vector', 'stream', 'scan') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |ts AS (
      |  SELECT t.doc_id, t.tf,
      |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
      |      / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) *
      |    ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
      |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
      |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS term_score
      |  FROM tf t JOIN dfreq USING (tok) JOIN dl USING (doc_id), corpus)
      |SELECT doc_id, count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS sum_tf,
      |  CAST(sum(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      |FROM ts GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin

  // ---------------------------------------------------------------- q245

  /** Blocked sparse-vector cosine similarity join: documents as TF-IDF
    * weighted bags of tokens, cosine computed EXACTLY via an inverted-index
    * pair join within (lang, source) blocks — the sparse twin of q41's
    * dense label-blocked embedding near-dup, and the doc-doc granularity
    * q170's language-level weighted Jaccard doesn't cover. Weights use the
    * same exact-rational idf family as q242 ((N+1)/df — no log, so both
    * engines produce bit-identical doubles); dot products and squared norms
    * go through DECIMAL sums (order-independent), and the final
    * dot/(‖a‖·‖b‖) is sqrt+multiply+divide — all IEEE-exact.
    *
    * Scale shape: the pair join is an equi-join on (lang, source, tok) —
    * block-bounded candidates, never all-pairs; weights/norms are one
    * token-shuffle each; the O(docs) norm table joins on doc_id. Top 20
    * pairs by cosine. Run over a deterministic 1-in-3 doc sample: this is
    * the EXACT audit face; full-corpus similarity at scale goes through the
    * LSH/ANN family (q34/q42/q47/q67), for which this operator provides
    * spot ground truth.
    *
    * Unlike 20-char shingles, single TOKENS are viral — every document in a
    * block shares common words, so an unguarded (lang, source, tok) join
    * degenerates toward all-pairs-per-block as blocks grow. The df-cap
    * guard (same family as [[Dedup.capPostings]], q239/q240) drops tokens
    * with df > cap from the PAIR JOIN ONLY — norms stay exact over all
    * tokens — bounding join work at Σ_tok min(df,cap)². Error bound: a
    * dropped token has weight w = tf·(N+1)/df < tf·(N+1)/cap per doc, and
    * by Cauchy-Schwarz the dot-product deficit is at most
    * ‖a|dropped‖·‖b|dropped‖, so the reported cosine under-reports by at
    * most the product of the two docs' dropped-mass fractions — the mass
    * idf already declared negligible. cosine is monotonically UNDER-
    * estimated, never inflated (the safe direction for a near-dup screen).
    * On this corpus max block df < DfCap, so the guard is provably a no-op
    * against the unguarded oracle (hash-identical, the q239-vs-q33
    * methodology); OperatorSpec pins the engaged-cap semantics at cap=130.
    */
  def q245SparseCosine(spark: SparkSession, dir: String): DataFrame =
    sparseCosine(spark, dir, dfCap = DfCap245)

  /** Default pair-join df cap for q245: above any block df at the tested
    * scales (sf0.01 ~167 sampled docs, sf0.1 ~1667 — global df bounds block
    * df), so the audit face stays exact while the guard machinery is live
    * in the plan; a real 10M-doc block would cap its stopwords here.
    */
  private[graft] val DfCap245 = 4000

  /** q245 core, parameterized by the pair-join df cap (see q245 scaladoc). */
  private[graft] def sparseCosine(spark: SparkSession, dir: String,
      dfCap: Int): DataFrame = {
    val docs = Tables.documents(spark, dir).where(col("doc_id") % 3 === 0)
    val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val cnt = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = cnt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = cnt.join(dfreq, "tok").crossJoin(nDocs)
      .withColumn("w", expr(
        "CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) + 1.0D) / CAST(df AS DOUBLE))"))
      .select(col("doc_id"), col("lang"), col("source"), col("tok"), col("w"),
        col("df"))
      .localCheckpoint() // feeds norms + both pair-join sides
    // Norms stay EXACT (all tokens); only the pair join sees the df guard,
    // so a capped cosine can only under-report (see scaladoc error bound).
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(20,4)")).cast("double")).as("nrm"))
    val wj = w.where(col("df") <= dfCap)
    val dots = wj.select(col("doc_id").as("doc_a"), col("lang"), col("source"),
        col("tok"), col("w").as("wa"))
      .join(wj.select(col("doc_id").as("doc_b"), col("lang"), col("source"),
        col("tok"), col("w").as("wb")), Seq("lang", "source", "tok"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum((col("wa") * col("wb")).cast("decimal(20,4)")).cast("double").as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("dot") / (col("na") * col("nb"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  val q245Oracle: String =
    """WITH cnt AS (
      |  SELECT doc_id, lang, source, tok, count(*) AS tf FROM (
      |    SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE doc_id % 3 = 0)
      |  GROUP BY 1, 2, 3, 4),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 3 = 0),
      |dfreq AS (SELECT tok, count(*) AS df FROM cnt GROUP BY tok),
      |w AS (SELECT doc_id, lang, source, tok,
      |        CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE))
      |          / CAST(df AS DOUBLE)) AS w
      |      FROM cnt JOIN dfreq USING (tok), n),
      |norms AS (SELECT doc_id,
      |        sqrt(CAST(sum(CAST(w * w AS DECIMAL(20,4))) AS DOUBLE)) AS nrm
      |      FROM w GROUP BY doc_id),
      |dots AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(CAST(a.w * b.w AS DECIMAL(20,4))) AS DOUBLE) AS dot
      |  FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source
      |    AND a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, dot / (na.nrm * nb.nrm) AS cosine
      |FROM dots JOIN norms na ON na.doc_id = doc_a
      |          JOIN norms nb ON nb.doc_id = doc_b
      |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q283

  /** Feature-hashing (hashing-trick) bag-of-words: every token maps to one
    * of 64 buckets by a hash of the token itself — the fixed-width sparse
    * featurization (Weinberger et al.'s hashing trick) that needs NO
    * vocabulary pass, no dictionary broadcast, no OOV handling. The bucket
    * is md5-derived (first 8 hex chars as an integer, mod 64) so Spark and
    * DuckDB agree bit-for-bit. Emits the per-(lang, bucket) occupancy —
    * occurrence mass and distinct-term load — i.e. the hash-collision
    * profile a practitioner inspects before committing to a width.
    *
    * Scale shape: hashing is a map-only projection inside the scan stage
    * (no vocabulary state at any size — the property that makes feature
    * hashing THE featurizer at 100 TB); the rollup is one shuffle on
    * (lang, bucket) — 64·|langs| groups.
    */
  def q283HashedBow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("bucket",
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 64).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("tok")).as("n_terms"))
      .orderBy(col("lang"), col("bucket"))

  val q283Oracle: String =
    """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |h AS (SELECT lang, tok,
      |        CAST(list_reduce([strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1
      |                          for i in range(1, 9)], (a, b) -> a * 16 + b) % 64 AS INT) AS bucket
      |      FROM toks)
      |SELECT lang, bucket, count(*) AS n_occ, count(DISTINCT tok) AS n_terms
      |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q314

  /** Vocabulary-growth (Heaps-law) and hapax audit — the corpus statistics
    * a tokenizer/LM-prep pipeline reads before fixing a vocabulary size:
    * at nested corpus prefixes of 1/8, 1/4, 1/2 and all of the documents
    * (by doc_id — the deterministic, scale-relative prefix), how many
    * token occurrences, how many DISTINCT types, and how many hapax
    * legomena (count-1 types, the long-tail mass an OOV budget must
    * absorb). Sub-linear vocab growth across the four points is Heaps'
    * law; the hapax fraction tracks Zipf's tail without fitting an
    * exponent (no log — SURVEY §5). One shuffle on token computes all four
    * prefixes at once (per-type conditional counts, since prefixes nest),
    * and the final summary is a 1-row aggregate unpivoted to four rows —
    * the whole audit costs one pass over the corpus regardless of size.
    */
  def q314VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) // bounded 1-row read
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val perType = toks.groupBy(col("tok")).agg(
      sum(when(col("doc_id") <= maxId / 8, 1L).otherwise(0L)).as("c8"),
      sum(when(col("doc_id") <= maxId / 4, 1L).otherwise(0L)).as("c4"),
      sum(when(col("doc_id") <= maxId / 2, 1L).otherwise(0L)).as("c2"),
      count(lit(1)).as("c1"))
    perType.agg(
      sum(col("c8")).as("t8"), sum(when(col("c8") > 0, 1L).otherwise(0L)).as("v8"),
      sum(when(col("c8") === 1, 1L).otherwise(0L)).as("h8"),
      sum(col("c4")).as("t4"), sum(when(col("c4") > 0, 1L).otherwise(0L)).as("v4"),
      sum(when(col("c4") === 1, 1L).otherwise(0L)).as("h4"),
      sum(col("c2")).as("t2"), sum(when(col("c2") > 0, 1L).otherwise(0L)).as("v2"),
      sum(when(col("c2") === 1, 1L).otherwise(0L)).as("h2"),
      sum(col("c1")).as("t1"), sum(when(col("c1") > 0, 1L).otherwise(0L)).as("v1"),
      sum(when(col("c1") === 1, 1L).otherwise(0L)).as("h1"))
      .selectExpr(
        """stack(4,
          |  8, t8, v8, h8,
          |  4, t4, v4, h4,
          |  2, t2, v2, h2,
          |  1, t1, v1, h1) AS (denom, n_tokens, n_vocab, n_hapax)""".stripMargin)
      .orderBy(col("denom").desc)
  }

  val q314Oracle: String =
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |pt AS (SELECT tok,
      |         CAST(sum(CASE WHEN doc_id <= (SELECT m // 8 FROM mx) THEN 1 ELSE 0 END) AS BIGINT) AS c8,
      |         CAST(sum(CASE WHEN doc_id <= (SELECT m // 4 FROM mx) THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |         CAST(sum(CASE WHEN doc_id <= (SELECT m // 2 FROM mx) THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |         count(*) AS c1
      |       FROM tk GROUP BY 1),
      |s AS (SELECT
      |  CAST(sum(c8) AS BIGINT) AS t8, CAST(sum(CASE WHEN c8 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v8,
      |  CAST(sum(CASE WHEN c8 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h8,
      |  CAST(sum(c4) AS BIGINT) AS t4, CAST(sum(CASE WHEN c4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v4,
      |  CAST(sum(CASE WHEN c4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
      |  CAST(sum(c2) AS BIGINT) AS t2, CAST(sum(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  CAST(sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      |  CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(sum(CASE WHEN c1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1
      |FROM pt)
      |SELECT 8 AS denom, t8 AS n_tokens, v8 AS n_vocab, h8 AS n_hapax FROM s
      |UNION ALL SELECT 4, t4, v4, h4 FROM s
      |UNION ALL SELECT 2, t2, v2, h2 FROM s
      |UNION ALL SELECT 1, t1, v1, h1 FROM s
      |ORDER BY denom DESC""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q314_vocab_growth", q314VocabGrowth, q314Oracle),
    GraftQuery.sql("q283_hashed_bow", q283HashedBow, q283Oracle),
    GraftQuery.sql("q37_lang_markers", q37LangMarkers, q37Oracle),
    GraftQuery.sql("q38_quality_score", q38QualityScore, q38Oracle),
    GraftQuery.sql("q39_token_stats", q39TokenStats, q39Oracle),
    GraftQuery.sql("q63_bigram_topk", q63BigramTopk, q63Oracle),
    GraftQuery.sql("q64_text_normalize", q64TextNormalize, q64Oracle),
    GraftQuery.sql("q65_lexical_diversity", q65LexicalDiversity, q65Oracle),
    GraftQuery.sql("q66_length_histogram", q66LengthHistogram, q66Oracle),
    GraftQuery.sql("q71_tfidf_topk", q71TfidfTopk, q71Oracle),
    GraftQuery.sql("q93_repetition_stats", q93RepetitionStats, q93Oracle),
    GraftQuery.sql("q94_corpus_split", q94CorpusSplit, q94Oracle),
    GraftQuery.sql("q96_shard_packing", q96ShardPacking, q96Oracle),
    GraftQuery.sql("q146_chi2_terms", q146Chi2Terms, q146Oracle),
    GraftQuery.sql("q155_countmin_estimate", q155CountminEstimate, q155Oracle),
    GraftQuery.sql("q170_weighted_jaccard", q170WeightedJaccard, q170Oracle),
    GraftQuery.sql("q177_grouped_quantiles", q177GroupedQuantiles, q177Oracle),
    GraftQuery.sql("q195_lang_confusion", q195LangConfusion, q195Oracle),
    GraftQuery.sql("q242_bm25_retrieval", q242Bm25Retrieval, q242Oracle),
    GraftQuery.sql("q245_sparse_cosine", q245SparseCosine, q245Oracle)
  )
}
