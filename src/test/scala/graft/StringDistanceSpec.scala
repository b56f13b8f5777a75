package graft

import org.apache.spark.sql.functions._

/** The custom string-distance kernels, pinned to DuckDB's probed semantics
  * (values below were read off DuckDB 1.0 directly).
  */
class StringDistanceSpec extends SparkSpec {

  private def one(exprStr: String): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(expr(exprStr)).collect()(0).get(0)
  }

  test("damerau_levenshtein is TRUE DL, not OSA ('CA'->'ABC' = 2)") {
    assert(one("damerau_levenshtein('CA', 'ABC')") === 2)
    assert(one("damerau_levenshtein('abcd', 'acbd')") === 1) // adjacent transposition
    assert(one("damerau_levenshtein('', 'abc')") === 3)
    assert(one("damerau_levenshtein('Abc', 'abc')") === 1) // case-sensitive
    assert(one("damerau_levenshtein('same', 'same')") === 0)
  }

  test("char_jaccard is the distinct-character SET ratio") {
    assert(one("char_jaccard('abc', 'bcd')") === 0.5)
    assert(one("char_jaccard('aab', 'ab')") === 1.0) // bag collapses to set
    assert(one("char_jaccard('Abc', 'abc')") === 0.5) // case-sensitive
  }

  test("hamming counts positional mismatches; length mismatch is null") {
    assert(one("hamming('abc', 'abd')") === 1)
    assert(one("hamming('abc', 'abc')") === 0)
    assert(one("hamming('ab', 'abc')") === null)
  }

  test("kernels run inside whole-stage codegen over a real column") {
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("damerau_levenshtein(c_name, c_mktsegment) AS dl",
        "char_jaccard(c_name, c_mktsegment) AS jac")
    // whole-stage-codegen stages render as "*(n) Project ..." in the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [damerau_levenshtein"), p)
    val r = df.agg(min("dl"), max("jac")).collect()(0)
    assert(r.getInt(0) > 0 && r.getDouble(1) < 1.0)
  }

  test("eval and codegen paths agree (interpreted projection vs codegen)") {
    import graft.functions.GraftStrings
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val cases = Seq(("CA", "ABC"), ("abcd", "acbd"), ("Customer#1", "Customer#2"),
      ("kitten", "sitting"), ("", ""), ("x", ""))
    for ((a, b) <- cases) {
      val viaSql = spark.sql(s"SELECT damerau_levenshtein('$a', '$b')").collect()(0).getInt(0)
      assert(viaSql === GraftStrings.damerauLevenshtein(u(a), u(b)), s"($a,$b)")
    }
  }
}
