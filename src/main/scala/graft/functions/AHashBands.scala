package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Average-hash (aHash) of an up-to-64-byte "tile" string, returned as its
  * four 16-bit band values `[bits 0–15, 16–31, 32–47, 48–63]` — the banded
  * form the perceptual-near-dup join (q262) keys on, and a layout that never
  * materializes a signed-overflow-prone `1 << 63` (which DuckDB's BIGINT
  * shift refuses, so the band array is the cross-engine canonical form).
  *
  * Definition (matches the DuckDB twin bit-for-bit in integer arithmetic):
  * over the first min(64, len) bytes, `sum = Σ byte_i`; bit i is set iff
  * `byte_i * 64 > sum` (64 = the nominal 8×8 tile size, constant so both
  * engines compare against the same scaled mean); band b collects bits
  * `b*16 … b*16+15`.
  *
  * One compiled pass per row replaces ~128 interpreted higher-order-function
  * lambda evaluations (two 64-element folds) — the same
  * allocation-free-kernel rationale as [[TokenCount]] / FloatVecDot.
  * ASCII-byte semantics: byte value == `ascii(substring(...))` for the
  * fixture corpus; multi-byte input would diverge from the codepoint twin
  * and is out of contract (media tiles are bytes, not text).
  */
case class AHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ahash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = math.min(64, bytes.length)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff).toLong; i += 1 }
    val bands = new Array[Long](4)
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xff).toLong * 64L > sum) bands(i >> 4) |= (1L << (i & 15))
      i += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bands = ctx.freshName("bands")
      val k = ctx.freshName("k")
      s"""
         |byte[] $bts = $a.getBytes();
         |int $n = Math.min(64, $bts.length);
         |long $sum = 0L;
         |for (int $k = 0; $k < $n; $k++) { $sum += (long) ($bts[$k] & 0xff); }
         |long[] $bands = new long[4];
         |for (int $k = 0; $k < $n; $k++) {
         |  if (((long) ($bts[$k] & 0xff)) * 64L > $sum) {
         |    $bands[$k >> 4] |= (1L << ($k & 15));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHashBands =
    copy(child = newChild)
}
