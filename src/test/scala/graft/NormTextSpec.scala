package graft

/** NormText kernel: canonical form semantics (NFC + per-codepoint lowercase +
  * ASCII-whitespace collapse + trim), codegen/interpreted parity, and the
  * deliberate RE2-compatible boundary (vertical tab is NOT whitespace —
  * DuckDB's `\s` excludes it, and the oracle replay must agree).
  */
class NormTextSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String = graft.functions.NormText.canonical(s)

  test("canonical form: case, whitespace runs, trim, NFC composition") {
    assert(canon("  HeLLo\tWorld ") === "hello world")
    assert(canon("a\n\nb\r\nc") === "a b c")
    assert(canon("") === "")
    assert(canon("   ") === "")
    assert(canon("already canonical") === "already canonical")
    // decomposed A + combining ring (U+0041 U+030A) composes to å
    assert(canon("Å") === "å")
    // the same text in both forms dedups to one canonical string
    assert(canon("Café") === canon("Café"))
  }

  test("vertical tab is NOT whitespace (RE2/DuckDB \\s parity)") {
    assert(canon("a\u000bb") === "a\u000bb")
  }

  test("lowercase is per-codepoint (utf8proc parity): word-final sigma stays σ") {
    // String.toLowerCase would give final ς via SpecialCasing; DuckDB's
    // utf8proc lower maps Σ→σ unconditionally — the kernel must agree
    assert(canon("ΟΔΥΣΣΕΥΣ") === "οδυσσευσ")
    assert(canon("ΣΟΦΙΑ Σ") === "σοφια σ")
    // supplementary-plane codepoints round-trip (Deseret capital → small)
    assert(canon(new String(Character.toChars(0x10400))) ===
      new String(Character.toChars(0x10428)))
  }

  test("SQL face and codegen agree with the static kernel; null passes through") {
    val cases = Seq("  A  B ", "MiXeD\tCase", "x", "", "Å Å")
    val rows = cases.toDF("t").selectExpr("t", "norm_text(t) AS c").collect()
    rows.foreach(r => assert(r.getString(1) === canon(r.getString(0)),
      s"codegen diverged on '${r.getString(0)}'"))
    val n = Seq[Option[String]](None).toDF("t").selectExpr("norm_text(t) AS c").collect()
    assert(n(0).isNullAt(0))
  }

  test("canonical-dedup catches re-cased / re-spaced variants plain hash dedup misses") {
    val df = Seq(
      (1L, "The Quick  Brown Fox"),
      (2L, "the quick brown fox"),
      (3L, " THE\tQUICK BROWN FOX "),
      (4L, "a different document")).toDF("doc_id", "t")
    val survivors = df.selectExpr("doc_id", "norm_text(t) AS c")
      .groupBy("c").min("doc_id").collect()
    assert(survivors.length === 2)
    assert(survivors.map(_.getLong(1)).toSet === Set(1L, 4L))
  }
}
