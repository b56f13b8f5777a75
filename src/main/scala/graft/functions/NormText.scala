package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CANONICAL TEXT FORM for dedup and fingerprinting: NFC-normalize,
  * lowercase (root locale), collapse ASCII-whitespace runs to single
  * spaces, trim — the standard pre-dedup canonicalization of a web-scale
  * training corpus (CCNet/Gopher-style): `"  HeLLo\tWorld "` and
  * `"hello world"` are the SAME document for exact-dedup purposes, and a
  * decomposed `Å` equals its precomposed `Å`.
  *
  * Semantics are chosen to be REPLAYABLE in the oracle dialect:
  * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))` in
  * DuckDB computes the identical string (cross-validated — Java's
  * root-locale lowercase and DuckDB's Unicode `lower` agree outside
  * locale-special corners, and both `\s` classes are the ASCII set).
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

  /** NFC → root-locale lowercase → collapse `[ \t\n\f\r]+` to one
    * space → trim, in one output pass (the collapse+trim never allocates a
    * regex machine).
    */
  def canonical(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val len = n.length
    val sb = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val c = n.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
      if (ws) {
        if (sb.length > 0) pendingSpace = true // leading runs drop (trim)
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString // trailing pendingSpace never flushed (trim)
  }
}
