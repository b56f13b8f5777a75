package graft

import org.apache.spark.sql.functions._

/** TokenCount kernel + RewriteTokenCount optimizer rule: exact parity with
  * `size(split(s, ' '))` on adversarial strings, automatic rewrite of the
  * idiomatic formulation, and non-rewrite of shapes the rule can't prove.
  */
class TokenCountSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "",                       // split → [""] → 1
    " ",                      // ["", ""] → 2
    "a",
    "a b c",
    " leading",
    "trailing ",
    "double  space",
    "   ",
    "héllo wörld ünïcode",    // multi-byte chars must not confuse the byte scan
    "tab\tis not a separator",
    "a b  c   d    e")

  test("token_count equals size(split(s, ' ')) on adversarial strings") {
    val df = cases.toDF("t").selectExpr(
      "t", "token_count(t) AS tc", "size(split(t, ' ')) AS ss")
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("token_count is null on null input (matches size with legacy off)") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("t")
      .selectExpr("token_count(t) AS tc", "size(split(t, ' ')) AS ss")
    val rows = df.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getInt(0) == 2))
  }

  test("optimizer rewrites size(split(s, ' ')) to token_count automatically") {
    val p = graft.sources.Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).as("n_tok"))
      .queryExecution.optimizedPlan.toString
    assert(p.contains("token_count"), p)
    assert(!p.contains("split("), p)
  }

  test("rewrite fires inside the corpus queries that count tokens") {
    val p = operators.Curation.q100PackContext(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("token_count"), p)
  }

  test("rule leaves other separators and explicit limits alone") {
    val df = Seq("a,b c").toDF("t")
    val comma = df.select(size(split(col("t"), ",")).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!comma.contains("token_count"), comma)
    val limited = df.select(size(split(col("t"), " ", 2)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!limited.contains("token_count"), limited)
    // and the unrewritten forms still evaluate correctly
    val r = df.select(size(split(col("t"), ",")).as("a"), size(split(col("t"), " ", 2)).as("b"))
      .collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
  }
}
