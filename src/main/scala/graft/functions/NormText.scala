package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CANONICAL TEXT FORM for dedup and fingerprinting: NFC-normalize,
  * lowercase (per codepoint, context-free), collapse ASCII-whitespace runs to single
  * spaces, trim — the standard pre-dedup canonicalization of a web-scale
  * training corpus (CCNet/Gopher-style): `"  HeLLo\tWorld "` and
  * `"hello world"` are the SAME document for exact-dedup purposes, and a
  * decomposed `Å` equals its precomposed `Å`.
  *
  * Semantics are chosen to be REPLAYABLE in the oracle dialect:
  * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))` in
  * DuckDB computes the identical string (cross-validated — per-codepoint
  * `Character.toLowerCase` matches DuckDB's utf8proc `lower` — both apply
  * the context-free simple mapping, so even word-final Σ agrees — and
  * both `\s` classes are the ASCII set).
  *
  * Scale shape: ONE pass per row inside whole-stage codegen via a static
  * kernel (NFC fast-paths to a reference check on already-normalized —
  * i.e. almost all — input); the canonical form then feeds the usual
  * one-shuffle hash dedup, so "canonicalize + dedup" costs exactly what
  * plain exact dedup costs.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormText.canonical(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormText.canonical($a.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {

  /** NFC → per-codepoint lowercase → collapse `[ \t\n\f\r]+` to one
    * space → trim, in one output pass (the collapse+trim never allocates a
    * regex machine).
    *
    * Lowercasing is `Character.toLowerCase(int)` codepoint by codepoint —
    * the context-free SIMPLE Unicode mapping — NOT `String.toLowerCase`,
    * whose SpecialCasing context rules (word-final Σ → ς) diverge from
    * utf8proc-based engines (DuckDB `lower` maps Σ → σ unconditionally).
    */
  def canonical(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val len = n.length
    val sb = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val cp = n.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
      if (ws) {
        if (sb.length > 0) pendingSpace = true // leading runs drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    sb.toString // trailing pendingSpace never flushed (trim)
  }
}
