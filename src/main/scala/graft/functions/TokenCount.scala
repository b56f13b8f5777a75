package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count: the number of elements `split(s, ' ')` would
  * produce (separator count + 1, trailing empties included — Java split with
  * limit -1 semantics) WITHOUT materializing the split array. Counting the
  * 0x20 bytes directly is valid for any UTF-8 input: a space byte can never
  * be a continuation byte of a multi-byte codepoint.
  *
  * Token counting over `split` shows up across the corpus pipeline (token
  * stats, quality filters, shard/context packing); each call otherwise
  * allocates a per-row array + one UTF8String per token just to take its
  * length. Stays inside whole-stage codegen.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var i = 0
    var c = 1
    while (i < bytes.length) { if (bytes(i) == 32) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      s"""
         |byte[] $bts = $a.getBytes();
         |int $c = 1;
         |for (int $k = 0; $k < $bts.length; $k++) { if ($bts[$k] == 32) $c++; }
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Optimizer rewrite: `size(split(s, ' ', -1))` → [[TokenCount]] — the
  * engine-level rule that turns the idiomatic DataFrame formulation into the
  * allocation-free kernel, so callers keep writing `size(split(...))` and
  * every query (token stats, packing, quality filters) gets the fast path
  * automatically. Fires only on the exact shape it can prove equivalent:
  * single-space separator (a regex matching one literal space), limit -1,
  * and non-legacy size-of-null semantics (both sides are null-on-null).
  */
object RewriteTokenCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(sep: UTF8String, _: StringType), Literal(-1, IntegerType)), false)
          if sep.toString == " " =>
        TokenCount(str)
    }
}
