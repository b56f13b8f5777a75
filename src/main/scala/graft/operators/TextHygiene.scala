package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Sub-document corpus hygiene: CCNet-style removal of text repeated ACROSS
  * documents (boilerplate paragraphs, nav chrome, license headers), and
  * LM-style rarity scoring — the two standard passes between raw crawl and
  * trainable corpus that document-level dedup (q32/q34) cannot express.
  */
object TextHygiene {

  /** A chunk survives if it appears in at most this many distinct docs. */
  private val MaxChunkDf = 2

  /** Tokens per paragraph-chunk (this corpus has no newlines, so the
    * paragraph unit is a fixed non-overlapping token window).
    */
  private val ChunkToks = 3

  // ---------------------------------------------------------------- q254

  /** Paragraph-level (chunk-level) cross-document dedup, the CCNet/RefinedWeb
    * boilerplate pass: split every document into non-overlapping
    * [[ChunkToks]]-token chunks, count each chunk's document frequency across
    * the corpus, DROP chunks appearing in more than [[MaxChunkDf]] distinct
    * docs, and reassemble each document from its surviving chunks in original
    * order. Emits per-doc (n_kept, n_dropped, new_text) — the rewritten
    * corpus plus the audit counts.
    *
    * Scale shape: chunking is a map-only explode (never holds more than one
    * doc's chunks per row-group); the df table is one shuffle on the chunk
    * string (hash the chunk to a 64-bit key at 100 TB to shrink the shuffle);
    * the keep-join is an equi-join on chunk; reassembly is one shuffle on
    * doc_id with per-doc state bounded by document length. A stopword-like
    * viral chunk costs nothing here — df is an aggregation, not a pair join,
    * so there is no quadratic path to guard (contrast q245).
    *
    * Determinism: reassembly sorts each doc's surviving chunks by chunk
    * index (array_sort on the (cidx, …) struct / string_agg ORDER BY cidx);
    * a fully-boilerplate doc keeps an empty-string text in both engines.
    */
  def q254ParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(t) - 1) div $ChunkToks), i -> " +
          s"struct(i AS cidx, array_join(slice(t, i * $ChunkToks + 1, $ChunkToks), ' ') AS chunk))"))
        .as("c"))
      .select(col("doc_id"), col("c.cidx"), col("c.chunk"))
    val dfreq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("cdf"))
    chunks.join(dfreq, "chunk")
      .withColumn("keep", col("cdf") <= MaxChunkDf)
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        expr("array_join(transform(filter(array_sort(collect_list(" +
          "struct(cidx, chunk, keep))), x -> x.keep), x -> x.chunk), ' ')")
          .as("new_text"))
      .orderBy(col("doc_id"))
  }

  val q254Oracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS cidx,
       |    array_to_string(t[i*$ChunkToks+1 : i*$ChunkToks+$ChunkToks], ' ') AS chunk
       |  FROM (SELECT doc_id, t,
       |          unnest(range(0, CAST((len(t)-1)//$ChunkToks AS INT) + 1)) AS i
       |        FROM t)),
       |dfreq AS (SELECT chunk, count(DISTINCT doc_id) AS cdf FROM chunks GROUP BY chunk),
       |j AS (SELECT c.doc_id, c.cidx, c.chunk, (cdf <= $MaxChunkDf) AS keep
       |      FROM chunks c JOIN dfreq USING (chunk))
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       |  coalesce(string_agg(chunk, ' ' ORDER BY cidx) FILTER (WHERE keep), '') AS new_text
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q255

  /** Unigram-LM rarity scoring — the CCNet LM-filter face: train a unigram
    * model on the corpus itself (global token counts), then score each
    * document by its mean token "surprisal". The textbook statistic is mean
    * −log p(tok); this uses the exact-rational member of the same monotone
    * family (the house rule that keeps q71/q242/q245 bit-identical across
    * engines): rarity(tok) = ⌊total·10⁶ / cnt(tok)⌋ — an INTEGER — so the
    * per-doc sum is exact long arithmetic in any order, and the final
    * mean = sum/(n_toks·10⁶) is one IEEE division of exactly-representable
    * values. High scores = rare-token-heavy docs (OOD/noise candidates for
    * the quality filter); low = stopword soup.
    *
    * Scale shape: token counts are one shuffle on tok; the score join is an
    * equi-join on tok (the model table; broadcast when the vocab fits, which
    * AQE decides); the per-doc reduce is one shuffle on doc_id. No floats
    * until the last projection.
    */
  def q255UnigramRarity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val cnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total"))
    toks.join(cnt, "tok")
      .crossJoin(broadcast(total))
      .withColumn("rarity_micro", expr("(total * 1000000L) div cnt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("rarity_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_toks"),
        (col("sum_micro").cast("double") /
          (col("n_toks") * lit(1000000L)).cast("double")).as("mean_rarity"))
      .orderBy(col("mean_rarity").desc, col("doc_id"))
      .limit(20)
  }

  val q255Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnt),
      |r AS (SELECT doc_id, (total * 1000000) // cnt AS rarity_micro
      |      FROM toks JOIN cnt USING (tok), tot)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(CAST(sum(rarity_micro) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) * 1000000 AS DOUBLE) AS mean_rarity
      |FROM r GROUP BY doc_id
      |ORDER BY mean_rarity DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q259

  /** BPE merge iterations. */
  private val BpeIters = 3

  /** Byte-pair-encoding tokenizer TRAINING, the first [[BpeIters]] merge
    * steps — the missing piece between corpus statistics and an actual
    * tokenizer: words (as character sequences) with corpus counts, count
    * every adjacent symbol pair weighted by word frequency, merge the most
    * frequent pair corpus-wide, repeat. Emits the learned merge table
    * (iter, left_sym, right_sym, pair_cnt) — rows 1..k of a real BPE vocab.
    *
    * Representation: a word's symbols are kept as a `||`-delimited string
    * (`cat` → `||c||a||t||`). The DOUBLE delimiter is what makes the merge
    * a plain `replace`: each match `|a||b|` consumes one pipe from each
    * boundary, so adjacent merge sites never overlap and both engines'
    * left-to-right non-overlapping replace implements exactly greedy BPE
    * (`||a||a||a||` → `||aa||a||`, the overlap case OperatorSpec pins).
    *
    * Scale shape: BPE trains on the WORD-COUNT dictionary, not the corpus —
    * the one corpus-sized pass is the token groupBy; after that each
    * iteration is a vocab-sized pair explode + one shuffle on the pair key,
    * and the driver reads back exactly ONE row per iteration (the argmax —
    * the same bounded control read as the two-phase median's histogram).
    * Merges apply as a map-only string rewrite.
    */
  def q259BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit("||"), regexp_replace(col("tok"), "(.)", "$1||")).as("s"),
        col("cnt"))
      // materialize the dictionary: the corpus-sized token pass runs ONCE;
      // every iteration's argmax + merge then reruns only vocab-sized work
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to BpeIters) {
      val top = words
        .select(expr("filter(split(s, '\\\\|\\\\|'), x -> x != '')").as("syms"), col("cnt"))
        .where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> " +
            "struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("a"), col("b"))
        .limit(1).head() // bounded control read: ONE row per iteration
      val (a, b, pc) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((it, a, b, pc))
      // symbols are corpus token characters (no quotes to escape)
      words = words.select(
        expr(s"replace(s, '|$a||$b|', '|$a$b|')").as("s"), col("cnt"))
    }
    merges.result().toDF("iter", "left_sym", "right_sym", "pair_cnt")
      .orderBy(col("iter"))
  }

  val q259Oracle: String = {
    def stage(k: Int): String = {
      val prev = s"w${k - 1}"
      s"""p$k AS (
         |  SELECT syms[i + 1] AS a, syms[i + 2] AS b, cnt FROM (
         |    SELECT syms, cnt, unnest(range(0, greatest(len(syms) - 1, 0))) AS i FROM (
         |      SELECT list_filter(string_split(s, '||'), x -> x <> '') AS syms, cnt
         |      FROM $prev))),
         |m$k AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_cnt FROM p$k
         |        GROUP BY a, b ORDER BY pair_cnt DESC, a, b LIMIT 1),
         |w$k AS (SELECT replace(s, '|' || a || '||' || b || '|', '|' || a || b || '|') AS s,
         |               cnt FROM $prev, m$k)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT '||' || regexp_replace(tok, '(.)', '\\1||', 'g') AS s, cnt FROM (
       |    SELECT tok, count(*) AS cnt FROM (
       |      SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok)),
       |${(1 to BpeIters).map(stage).mkString(",\n")}
       |SELECT CAST(1 AS INT) AS iter, a AS left_sym, b AS right_sym, pair_cnt FROM m1
       |UNION ALL SELECT 2, a, b, pair_cnt FROM m2
       |UNION ALL SELECT 3, a, b, pair_cnt FROM m3 ORDER BY iter""".stripMargin
  }

  // ---------------------------------------------------------------- q280

  /** Kneser–Ney count tables — the integer substrate of KN-smoothed n-gram
    * LM training: corpus bigram counts c(w1,w2) plus the two continuation
    * statistics the discount formula needs, N1+(•w2) (distinct left
    * contexts of w2 — KN's replacement for raw unigram frequency) and
    * N1+(w1•) (distinct continuations of w1, the normalizer of the backoff
    * weight). Every output is an exact integer — the smoothing DIVISIONS
    * belong to the (driver-side, model-size) estimation step, so the
    * corpus-scale pass stays order-independent and hash-stable.
    *
    * Scale shape: bigram formation is a map-only explode bounded by
    * document length; one shuffle on (w1,w2) builds the count table; both
    * continuation tables are aggregations OVER that table (tiny — the
    * distinct-bigram vocabulary), not over the corpus. Top-30 by count is
    * TakeOrdered. This is the textbook MapReduce LM-counts job
    * (Brants et al., "Large Language Models in Machine Translation") in
    * three declarative aggregations.
    */
  def q280KnCounts(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val c = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bigram"))
    val contLeft = c.groupBy(col("w2")).agg(count(lit(1)).as("n_pred"))
    val fanout = c.groupBy(col("w1")).agg(count(lit(1)).as("n_succ"))
    c.join(contLeft, "w2").join(fanout, "w1")
      .select(col("w1"), col("w2"), col("c_bigram"), col("n_succ"), col("n_pred"))
      .orderBy(col("c_bigram").desc, col("w1"), col("w2"))
      .limit(30)
  }

  val q280Oracle: String =
    """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT unnest([{'w1': t[i], 'w2': t[i + 1]} for i in range(1, len(t))]) AS b FROM t),
      |c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_bigram FROM bg GROUP BY 1, 2),
      |cl AS (SELECT w2, count(*) AS n_pred FROM c GROUP BY 1),
      |fo AS (SELECT w1, count(*) AS n_succ FROM c GROUP BY 1)
      |SELECT c.w1, c.w2, c_bigram, n_succ, n_pred
      |FROM c JOIN cl USING (w2) JOIN fo USING (w1)
      |ORDER BY c_bigram DESC, w1, w2 LIMIT 30""".stripMargin

  // ---------------------------------------------------------------- q281

  /** PMI collocation mining: bigrams whose observed frequency most exceeds
    * the independence expectation — the classic collocation score, ranked
    * by the RATIO c(ab)·N / (c(a)·c(b)) (the exponential of PMI, which
    * orders identically). Determinism: every count is an exact int64, the
    * two products stay far under 2^53 (so int→double casts are exact), and
    * the score is ONE IEEE division — bit-identical across engines, where
    * a log-based PMI would be a libm lottery. The c(ab) ≥ 5 support floor
    * is the standard guard against singleton-pair noise dominating the
    * ranking.
    *
    * Scale shape: one shuffle for unigram counts, one for bigram counts,
    * then a join of the bigram table against the (much smaller) unigram
    * table on each endpoint — the a-priori trick (q178) applies unchanged
    * if the support floor should prune before the join. Top-20 is
    * TakeOrdered.
    */
  def q281PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val bigrams = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val cb = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= 5)
    val n = uni.agg(sum(col("cw"))).head.getLong(0)
    cb.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c_a"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c_b"), "w2")
      .withColumn("lift",
        (col("c_ab") * lit(n)).cast("double") / (col("c_a") * col("c_b")).cast("double"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"), col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val q281Oracle: String =
    """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
      |uni AS (SELECT w, count(*) AS cw FROM (SELECT unnest(t) AS w FROM t) GROUP BY 1),
      |n AS (SELECT sum(cw) AS n FROM uni),
      |bg AS (SELECT unnest([{'w1': t[i], 'w2': t[i + 1]} for i in range(1, len(t))]) AS b
      |       FROM t WHERE len(t) >= 2),
      |cb AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_ab FROM bg GROUP BY 1, 2
      |       HAVING count(*) >= 5)
      |SELECT w1, w2, c_ab, c_a, c_b, lift FROM (
      |  SELECT cb.w1, cb.w2, c_ab, a.cw AS c_a, b.cw AS c_b,
      |    CAST(c_ab * n.n AS DOUBLE) / CAST(a.cw * b.cw AS DOUBLE) AS lift
      |  FROM cb JOIN uni a ON cb.w1 = a.w JOIN uni b ON cb.w2 = b.w, n)
      |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q310

  /** Kneser–Ney document-quality bucketing — the CCNet move (Wenzek et al.,
    * "CCNet: Extracting High Quality Monolingual Datasets") of scoring every
    * document under a corpus LM and splitting the corpus into head/middle/
    * tail tiers, here with the bigram KN model whose counts q280 builds.
    * Per corpus bigram: P_KN(w2|w1) = (max(c−d,0) + d·n_succ(w1)·P_cont(w2))
    * / c(w1·) with d=0.75 (exactly 3/4 — every operation is one IEEE
    * multiply/divide on integer-valued doubles, no libm; see q281's
    * determinism note). Each document then reports its bigram count, its
    * RARE-bigram count (corpus support ≤ 2 — singletons/doubletons, the
    * OOV-pressure signal), and its weakest KN probability; documents rank
    * by rare fraction (one exact int/int division) and ntile(3) cuts the
    * tiers. Output is per-tier: doc count, rare/total bigram mass, and the
    * tier's weakest KN probability — min/count/sum aggregates only, so
    * every output cell is order-independent-exact.
    *
    * Scale shape: counts are three shuffles over the bigram vocabulary
    * (q280's shape); the doc-side join is bigram-keyed equi-join; the
    * ntile is over DOCUMENTS (one per-doc row), the only single-partition
    * step — at 100 TB you'd replace ntile with fixed score thresholds
    * (CCNet itself uses global quantile cutpoints computed once).
    */
  def q310KnDocQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
    val docBg = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val c = docBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bigram"))
    val byW1 = c.groupBy(col("w1"))
      .agg(sum(col("c_bigram")).as("c_w1"), count(lit(1)).as("n_succ"))
    val byW2 = c.groupBy(col("w2")).agg(count(lit(1)).as("n_pred"))
    val nbDf = c.agg(count(lit(1)).as("nb"))
    val stats = c.join(byW1, "w1").join(byW2, "w2").crossJoin(broadcast(nbDf))
      .withColumn("p_kn",
        (greatest(col("c_bigram") - lit(0.75), lit(0.0)) +
          lit(0.75) * col("n_succ") * (col("n_pred") / col("nb"))) / col("c_w1"))
      .select(col("w1"), col("w2"), col("c_bigram"), col("p_kn"))
    val perDoc = docBg.join(stats, Seq("w1", "w2"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bg"),
        sum(when(col("c_bigram") <= 2, 1L).otherwise(0L)).as("n_rare"),
        min(col("p_kn")).as("min_pkn"))
      .withColumn("rare_frac", col("n_rare") / col("n_bg"))
    perDoc
      .withColumn("bucket",
        ntile(3).over(Window.orderBy(col("rare_frac"), col("doc_id"))))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_docs"), sum(col("n_rare")).as("total_rare"),
        sum(col("n_bg")).as("total_bg"), min(col("min_pkn")).as("weakest_pkn"))
      .orderBy(col("bucket"))
  }

  val q310Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT doc_id,
      |         unnest([{'w1': t[i], 'w2': t[i + 1]} for i in range(1, len(t))]) AS b FROM t),
      |db AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
      |c AS (SELECT w1, w2, count(*) AS c_bigram FROM db GROUP BY 1, 2),
      |w1s AS (SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1, count(*) AS n_succ
      |        FROM c GROUP BY 1),
      |w2s AS (SELECT w2, count(*) AS n_pred FROM c GROUP BY 1),
      |nbt AS (SELECT count(*) AS nb FROM c),
      |s AS (SELECT c.w1, c.w2, c_bigram,
      |        (greatest(c_bigram - 0.75, 0.0) + 0.75 * n_succ * (n_pred / nb)) / c_w1 AS p_kn
      |      FROM c JOIN w1s USING (w1) JOIN w2s USING (w2) CROSS JOIN nbt),
      |pd AS (SELECT doc_id, count(*) AS n_bg,
      |         CAST(sum(CASE WHEN c_bigram <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |         min(p_kn) AS min_pkn
      |       FROM db JOIN s USING (w1, w2) GROUP BY 1),
      |bk AS (SELECT *, ntile(3) OVER (ORDER BY n_rare / n_bg, doc_id) AS bucket FROM pd)
      |SELECT bucket, count(*) AS n_docs, CAST(sum(n_rare) AS BIGINT) AS total_rare,
      |  CAST(sum(n_bg) AS BIGINT) AS total_bg, min(min_pkn) AS weakest_pkn
      |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q316

  /** Span-corruption mask layout (the T5/UL2 denoising-objective prep,
    * Raffel et al. §3.1.4): every token position draws a DETERMINISTIC
    * pseudo-random value (md5 of doc_id:position — the q260/q283 device
    * that replaces an RNG with something two engines can agree on
    * bit-for-bit); positions hitting 1-in-20 open a corruption span that
    * covers themselves and the next two tokens (mean span 3 ⇒ ≈15% target
    * mask rate, the T5 default). "Is this position inside a span?" is a
    * 3-row trailing window max — O(1) state per position, one doc-keyed
    * shuffle for the whole corpus. The per-language report (tokens, masked
    * count, span starts, realized mask rate) is what an objective-prep
    * pipeline audits before committing a corruption config: the realized
    * rate differs from the nominal 15% exactly where documents are shorter
    * than the span length, and THAT is the number you want measured, not
    * assumed.
    */
  def q316SpanCorruption(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), posexplode(split(col("text"), " ")))
      .withColumn("i", col("pos") + 1) // 1-based, matching the oracle's range()
    val seeded = toks.withColumn("h",
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("i").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("start", when(col("h") % 20 === 0, 1L).otherwise(0L))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(-2, Window.currentRow)
    seeded.withColumn("masked", when(max(col("start")).over(w) >= 1, 1L).otherwise(0L))
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("masked")).as("n_masked"),
        sum(col("start")).as("n_spans"))
      .withColumn("mask_rate",
        col("n_masked").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("lang"))
  }

  val q316Oracle: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
      |tk AS (SELECT doc_id, lang,
      |         unnest([{'i': i} for i in range(1, len(ts) + 1)]).i AS i FROM t),
      |sd AS (SELECT doc_id, lang, i,
      |         CASE WHEN CAST(list_reduce([strpos('0123456789abcdef',
      |                  substr(md5(doc_id || ':' || i), j, 1)) - 1
      |                  for j in range(1, 9)], (a, b) -> a * 16 + b) AS BIGINT) % 20 = 0
      |              THEN 1 ELSE 0 END AS start
      |       FROM tk),
      |mk AS (SELECT lang, start,
      |         CASE WHEN max(start) OVER (PARTITION BY doc_id ORDER BY i
      |                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 1
      |              THEN 1 ELSE 0 END AS masked
      |       FROM sd)
      |SELECT lang, count(*) AS n_tokens,
      |  CAST(sum(masked) AS BIGINT) AS n_masked,
      |  CAST(sum(start) AS BIGINT) AS n_spans,
      |  CAST(CAST(sum(masked) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS mask_rate
      |FROM mk GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q324

  /** Sliding-window size for exact-substring span detection: long enough
    * that a hit means verbatim copying, short enough to catch clipped
    * copies a disjoint-chunk pass (q254) straddles and misses.
    */
  private val SpanK = 8

  /** EXACT SUBSTRING DEDUP — maximal cross-document duplicated spans, the
    * suffix-run shape of Lee et al.'s "Deduplicating Training Data Makes
    * Language Models Better" (ExactSubstr), re-expressed relationally:
    * instead of a monolithic suffix array, slide a [[SpanK]]-token window
    * over every document (stride 1 — q254's disjoint chunks cannot see
    * misaligned copies), keep windows whose text occurs in ≥2 DISTINCT
    * documents, and merge overlapping hits per document into MAXIMAL
    * spans with a gaps-and-islands pass (running max of span ends). A
    * 90-token plagiarized passage then surfaces as ONE span, not 83
    * overlapping window hits — the unit a curation pipeline actually cuts.
    * Emits the per-source audit (docs affected, span count, duplicated
    * token mass, longest span).
    *
    * Scale shape: the window explode is map-only codegen (transform over
    * the token array); "≥2 distinct docs" is groupBy(gram) with
    * min≠max(doc_id) — partial-aggregable, skew-immune (a 2-way distinct
    * test needs no count-distinct sketch); the hit join is an equi-join
    * on gram against a DISTINCT gram set (multiplicity 1 — a
    * stopword-soup gram cannot explode the join, and AQE splits residual
    * skew); islands are one window pass partitioned by doc_id. Three
    * shuffles on a token-volume intermediate — the same budget as any
    * token-level op here (q71/q255). No pair join anywhere: the classic
    * O(corpus²) suffix comparison is replaced by hash aggregation.
    */
  def q324SubstringSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= SpanK)
      .select(col("doc_id"), col("source"), explode(expr(
        s"transform(sequence(0, size(t) - $SpanK), i -> " +
          s"struct(i AS i, array_join(slice(t, i + 1, $SpanK), ' ') AS gram))")).as("g"))
      .select(col("doc_id"), col("source"), col("g.i"), col("g.gram"))
    // localCheckpoint (r14): dup feeds the Bloom build AND the exact hit
    // join — one token-volume aggregation instead of two.
    val dup = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .where(col("d0") =!= col("d1"))
      .select(col("gram"))
      .localCheckpoint()
    // Bloom pre-filter (r14, guide §3.2): drop definitely-unique grams from
    // the probe side BEFORE its exchange — the duplicated fraction is small,
    // so the second token-volume shuffle of ~60-byte gram strings shrinks
    // to the duplicated grams (+ false positives, which the exact equi-join
    // below still removes — no result change at any fpp). Sized from the
    // exact duplicated-gram count (a 1-row read off the checkpoint), 1%
    // fpp: the FILTER stays bounded (~1.2 MB/M keys) even where `dup`
    // itself is not provably broadcastable. Keys are xxhash64 longs on
    // both sides (the sketch's putLong/mightContainLong fast path).
    val nDup = dup.count()
    val bfBytes = {
      val bf = dup.selectExpr("xxhash64(gram) AS h")
        .stat.bloomFilter("h", math.max(nDup, 1000L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = grams
      .where(org.apache.spark.sql.functions.call_function("might_contain",
        lit(bfBytes), expr("xxhash64(gram)")))
      .join(dup, "gram")
      .select(col("doc_id"), col("source"), col("i"))
      .withColumn("prev_end",
        max(col("i") + lit(SpanK - 1)).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("i") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("source"), col("isl"))
      .agg(min(col("i")).as("s"), (max(col("i")) + lit(SpanK - 1)).as("e"))
    spans.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + lit(1)).as("dup_toks"),
        max(col("e") - col("s") + lit(1)).as("max_span"))
      .orderBy(col("source"))
  }

  val q324Oracle: String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, source, i, array_to_string(t[i+1 : i+$SpanK], ' ') AS gram
       |  FROM (SELECT doc_id, source, t, unnest(range(0, len(t) - $SpanK + 1)) AS i
       |        FROM t WHERE len(t) >= $SpanK)),
       |dup AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
       |pos AS (SELECT g.doc_id, g.source, g.i FROM grams g JOIN dup USING (gram)),
       |brk AS (SELECT doc_id, source, i,
       |    CASE WHEN max(i + $SpanK - 1) OVER w IS NULL
       |           OR i > max(i + $SpanK - 1) OVER w THEN 1 ELSE 0 END AS b
       |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |isl AS (SELECT doc_id, source, i,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS isl
       |  FROM brk),
       |spans AS (SELECT doc_id, source, isl, min(i) AS s, max(i) + $SpanK - 1 AS e
       |  FROM isl GROUP BY doc_id, source, isl)
       |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_spans,
       |  CAST(sum(e - s + 1) AS BIGINT) AS dup_toks,
       |  CAST(max(e - s + 1) AS BIGINT) AS max_span
       |FROM spans GROUP BY source ORDER BY source""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q324_substring_spans", q324SubstringSpans, q324Oracle),
    GraftQuery.sql("q316_span_corruption", q316SpanCorruption, q316Oracle),
    GraftQuery.sql("q310_kn_doc_quality", q310KnDocQuality, q310Oracle),
    GraftQuery.sql("q254_paragraph_dedup", q254ParagraphDedup, q254Oracle),
    GraftQuery.sql("q255_unigram_rarity", q255UnigramRarity, q255Oracle),
    GraftQuery.sql("q259_bpe_merges", q259BpeMerges, q259Oracle),
    GraftQuery.sql("q280_kn_counts", q280KnCounts, q280Oracle),
    GraftQuery.sql("q281_pmi_collocations", q281PmiCollocations, q281Oracle),
    GraftQuery.sql("q338_bpe_encode", q338BpeEncode, q338Oracle),
    GraftQuery.sql("q342_bpe_packing", q342BpePacking, q342Oracle))

  // ---------------------------------------------------------------- q342

  /** BPE-BUDGET SHARD PACKING — the q96 packer re-costed in MODEL tokens:
    * context windows and training budgets are denominated in TOKENIZER
    * output, not whitespace words, so the shard assignment that matters at
    * 100 TB packs against `bpe_token_count` (the q338 one-pass kernel)
    * under the q259-trained merges. Same scalable shape as q96: one
    * shuffle on the language partition key, a windowed running total, and
    * shard = floor((cum − toks) / budget); the ONLY new cost is the
    * codegen encode riding the same scan. The oracle re-derives the
    * merges, re-encodes the dictionary, and replays the identical window
    * wholly in DuckDB.
    */
  def q342BpePacking(spark: SparkSession, dir: String): DataFrame = {
    val merges = q259BpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    def sqlLit(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'").replace("\t", "\\t") + "'"
    val mergesArr = merges.map { case (_, a, b) => sqlLit(s"$a\t$b") }
      .mkString("array(", ", ", ")")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"bpe_token_count(text, $mergesArr)").cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard", expr("CAST((cum - toks) DIV 3000 AS BIGINT)"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_tokens"))
      .orderBy(col("lang"), col("shard"))
  }

  /** Merge training + dictionary encode + the q96 window, replayed wholly
    * in DuckDB.
    */
  val q342Oracle: String = {
    def stage(k: Int): String = {
      val prev = s"w${k - 1}"
      s"""p$k AS (
         |  SELECT syms[i + 1] AS a, syms[i + 2] AS b, cnt FROM (
         |    SELECT syms, cnt, unnest(range(0, greatest(len(syms) - 1, 0))) AS i FROM (
         |      SELECT list_filter(string_split(s, '||'), x -> x <> '') AS syms, cnt
         |      FROM $prev))),
         |m$k AS (SELECT a, b FROM p$k GROUP BY a, b
         |        ORDER BY CAST(sum(cnt) AS BIGINT) DESC, a, b LIMIT 1),
         |w$k AS (SELECT tok, replace(s, '|' || a || '||' || b || '|', '|' || a || b || '|') AS s,
         |               cnt FROM $prev, m$k)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT tok, '||' || regexp_replace(tok, '(.)', '\\1||', 'g') AS s, cnt FROM (
       |    SELECT tok, count(*) AS cnt FROM (
       |      SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok)),
       |${(1 to BpeIters).map(stage).mkString(",\n")},
       |dict AS (SELECT tok,
       |    len(list_filter(string_split(s, '||'), x -> x <> '')) AS tc FROM w$BpeIters),
       |dtoks AS (
       |  SELECT doc_id, lang, CAST(sum(tc) AS BIGINT) AS toks
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents) dt
       |  JOIN dict USING (tok) GROUP BY doc_id, lang)
       |SELECT lang, shard, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_tokens
       |FROM (
       |  SELECT lang, toks,
       |    CAST((sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks)
       |         // 3000 AS BIGINT) AS shard
       |  FROM dtoks)
       |GROUP BY lang, shard ORDER BY lang, shard""".stripMargin
  }

  // ---------------------------------------------------------------- q338

  /** BPE tokenizer APPLICATION — the encode side q259's training produces a
    * vocabulary FOR: count every document's tokens under the learned merge
    * table. Training is dictionary-sized, but ENCODING is corpus-sized —
    * the relational replay (one `replace` pass per merge) would cost
    * |vocab| full corpus scans at 100 TB, so the corpus pass runs the
    * [[graft.functions.BpeTokenCount]] codegen kernel instead: the rank
    * table rides into generated code as a reference object and every
    * document is encoded in ONE scan, O(|merges|·|word|) per row, no
    * explode, no join, no shuffle before the final rollup.
    *
    * Correctness is pinned twice: an in-query require proves the kernel
    * bit-equal to the relational `||`-delimited replay on EVERY distinct
    * corpus word (the kernel is the spec's fast path, not a reimplementation
    * drift risk), and the oracle re-derives the merges AND re-encodes the
    * corpus dictionary in DuckDB, then aggregates per-doc token counts —
    * a hash match proves train→encode end-to-end.
    */
  def q338BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    // the learned merge table (rank order) — same training operator as q259
    val merges = q259BpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    def sqlLit(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'").replace("\t", "\\t") + "'"
    val mergesArr = merges.map { case (_, a, b) => sqlLit(s"$a\t$b") }
      .mkString("array(", ", ", ")")
    // kernel ≡ relational replay, per distinct corpus word (require-pinned)
    val replay = merges.foldLeft(
      "concat('||', regexp_replace(tok, '(.)', '$1||'))") { case (acc, (_, a, b)) =>
      s"replace($acc, ${sqlLit(s"|$a||$b|")}, ${sqlLit(s"|$a$b|")})"
    }
    val dict = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    val mismatches = dict
      .select(
        expr(s"size(filter(split($replay, '\\\\|\\\\|'), x -> x != ''))").as("rel"),
        expr(s"bpe_token_count(tok, $mergesArr)").as("fast"))
      .where(col("rel") =!= col("fast")).count()
    require(mismatches == 0,
      s"bpe_token_count disagrees with the relational replay on $mismatches words")
    // the corpus pass: ONE scan, kernel-encoded
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(s"bpe_token_count(text, $mergesArr)").cast("long").as("toks"))
      .groupBy((col("doc_id") % 13).as("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_toks"),
        min(col("toks")).as("min_toks"), max(col("toks")).as("max_toks"))
      .orderBy(col("g"))
  }

  /** Train-and-encode replayed wholly in DuckDB: the q259 merge derivation
    * (dictionary pair argmax per iteration) with the word carried through,
    * then per-doc token totals via the dictionary join.
    */
  val q338Oracle: String = {
    def stage(k: Int): String = {
      val prev = s"w${k - 1}"
      s"""p$k AS (
         |  SELECT syms[i + 1] AS a, syms[i + 2] AS b, cnt FROM (
         |    SELECT syms, cnt, unnest(range(0, greatest(len(syms) - 1, 0))) AS i FROM (
         |      SELECT list_filter(string_split(s, '||'), x -> x <> '') AS syms, cnt
         |      FROM $prev))),
         |m$k AS (SELECT a, b FROM p$k GROUP BY a, b
         |        ORDER BY CAST(sum(cnt) AS BIGINT) DESC, a, b LIMIT 1),
         |w$k AS (SELECT tok, replace(s, '|' || a || '||' || b || '|', '|' || a || b || '|') AS s,
         |               cnt FROM $prev, m$k)""".stripMargin
    }
    s"""WITH w0 AS (
       |  SELECT tok, '||' || regexp_replace(tok, '(.)', '\\1||', 'g') AS s, cnt FROM (
       |    SELECT tok, count(*) AS cnt FROM (
       |      SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY tok)),
       |${(1 to BpeIters).map(stage).mkString(",\n")},
       |dict AS (SELECT tok,
       |    len(list_filter(string_split(s, '||'), x -> x <> '')) AS tc FROM w$BpeIters),
       |per_doc AS (
       |  SELECT doc_id, CAST(sum(tc) AS BIGINT) AS toks
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) dt
       |  JOIN dict USING (tok) GROUP BY doc_id)
       |SELECT doc_id % 13 AS g, count(*) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS sum_toks,
       |  min(toks) AS min_toks, max(toks) AS max_toks
       |FROM per_doc GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
