package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def all: Seq[GraftQuery] = Seq(
    GraftQuery.sql("q37_lang_markers", q37LangMarkers, q37Oracle),
    GraftQuery.sql("q38_quality_score", q38QualityScore, q38Oracle),
    GraftQuery.sql("q39_token_stats", q39TokenStats, q39Oracle)
  )
}
