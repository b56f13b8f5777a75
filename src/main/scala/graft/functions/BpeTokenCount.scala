package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION: the number of tokens a trained byte-pair
  * vocabulary produces for a text — the encode-side twin of the BPE
  * TRAINING operator (TextHygiene q259) and the statistic every packing /
  * budgeting / billing pass over a corpus actually needs.
  *
  * Semantics are exactly greedy BPE as q259's dictionary replay defines it:
  * each SPACE-delimited word (U+0020 only — the q259 dictionary splits on
  * `split(text, ' ')`, so tab/newline stay inside a word by contract)
  * starts as its codepoint sequence; merges apply in
  * RANK order, each pass replacing adjacent (left,right) symbol pairs
  * left-to-right without overlap (the `||`-delimited `replace` trick's
  * contract, so the relational replay and this kernel are provably the
  * same function — q338 pins the equality per dictionary word).
  *
  * Scale shape: training is dictionary-sized, but ENCODING is corpus-sized
  * — the one place a per-merge relational pass would be V full corpus
  * scans. This kernel makes it ONE pass: the rank table rides into
  * generated code as a reference object (the broadcast-variable shape at
  * whole-stage-codegen granularity) and each row costs
  * O(|merges| · |word|) with zero Spark-side allocation churn. `merges` is
  * a foldable ARRAY<STRING> of tab-separated "left\tright" lines in rank
  * order.
  */
case class BpeTokenCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
        case _: StringType => true; case _ => false
      }) && (right.dataType match {
        case ArrayType(_: StringType, _) => true; case _ => false
      }) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable array<string>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  /** Rank-ordered merge table, parsed once per plan (the expression is
    * shared across rows; `right` is foldable by contract).
    */
  @transient private lazy val mergeTable: Array[Array[String]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val line = ad.getUTF8String(i).toString
      val t = line.indexOf('\t')
      require(t > 0 && t < line.length - 1,
        s"$prettyName: merge line $i must be 'left\\tright', got '$line'")
      Array(line.substring(0, t), line.substring(t + 1))
    }
  }

  override protected def nullSafeEval(text: Any, ignored: Any): Any =
    BpeTokenCount.countTokens(text.asInstanceOf[UTF8String].toString, mergeTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeTable, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.BpeTokenCount.countTokens($a.toString(), $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)
}

object BpeTokenCount {

  /** Total BPE tokens of `text`: per SPACE-delimited word (U+0020 only,
    * matching the q259 dictionary's `split(text, ' ')`), greedy rank-order
    * merging of its codepoint symbols; empty words contribute zero (the
    * dictionary replay's `filter(split(s,'||'), x -> x != '')` contract).
    */
  def countTokens(text: String, merges: Array[Array[String]]): Int = {
    var total = 0
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) total += countWord(text, start, i, merges)
        start = i + 1
      }
      i += 1
    }
    total
  }

  private def countWord(text: String, s: Int, e: Int,
      merges: Array[Array[String]]): Int = {
    var syms = new java.util.ArrayList[String](e - s)
    var i = s
    while (i < e) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      syms.add(text.substring(i, i + w))
      i += w
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      // one left-to-right non-overlapping pass per rank (replace semantics:
      // a merge result never re-matches within the same pass)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else {
          out.add(syms.get(j)); j += 1
        }
      }
      syms = out
      m += 1
    }
    syms.size
  }
}
