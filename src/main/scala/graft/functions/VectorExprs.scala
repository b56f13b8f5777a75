package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd kernels for the two hot inner loops the built-in surface leaves
  * interpreted (HOF lambdas and ArrayIntersect build per-row hash sets):
  *
  *  - [[SortedIntersectCount]]: |A ∩ B| of two pre-sorted distinct long
  *    arrays via a merge walk — O(n+m), zero allocation. Powers n-gram
  *    Jaccard near-dedup where the interpreted ArrayIntersect was the
  *    whole-bench bottleneck.
  *  - [[FloatVecDot]]: dot product of two float arrays accumulated
  *    sequentially in double — bit-identical to the `aggregate`-HOF left fold
  *    (and DuckDB's `list_reduce`), so swapping it in changes nothing in the
  *    DuckDB-oracle hash compare.
  *
  * Both stay inside whole-stage codegen (no CodegenFallback).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true; case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** All distinct character n-gram shingle hashes of a string, sorted — one
  * O(len) pass using a rolling polynomial hash (base 31 mod 1e9+7), fusing
  * what would otherwise be substring-per-position + md5 + distinct + sort.
  * Returns array<bigint> ready for [[SortedIntersectCount]].
  *
  * Hash of shingle s = fold((acc·31 + codepoint) mod p), windows measured in
  * Unicode codepoints — exactly what DuckDB computes via `list_reduce` over
  * `unicode(substr(...))` (substr is character-addressed there), so oracle
  * parity holds for multibyte text too, not just ASCII. The ASCII fast path
  * skips decoding entirely (byte == codepoint).
  *
  * Per-row work is O(len), so interpreted eval costs nothing measurable at
  * row granularity; CodegenFallback keeps the implementation honest and
  * simple while the surrounding projection stays in codegen.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val P = 1000000007L
  private val Base = 31L

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(str: Any, w: Any): Any = {
    val u8 = str.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val bytes = u8.getBytes
    // Codepoint units: ASCII fast path reuses the byte array values; multibyte
    // decodes once into an int array (still one O(len) pass per row).
    var ascii = true
    var bi = 0
    while (ascii && bi < bytes.length) { if (bytes(bi) < 0) ascii = false; bi += 1 }
    val cps: Array[Int] =
      if (ascii) null // signal: read codepoints straight from `bytes`
      else u8.toString.codePoints().toArray
    val n = if (ascii) bytes.length else cps.length
    @inline def cp(idx: Int): Long = if (ascii) (bytes(idx) & 0xffL) else cps(idx).toLong
    val width = w.asInstanceOf[Int]
    val count = math.max(n - width + 1, 1)
    val eff = math.min(width, n) // degenerate short strings: one whole-string shingle
    // pow = Base^(eff-1) mod P, for rolling removal of the leading codepoint
    var pow = 1L
    var k = 1
    while (k < eff) { pow = pow * Base % P; k += 1 }
    val out = new Array[Long](count)
    var h = 0L
    var i = 0
    while (i < eff && i < n) { h = (h * Base + cp(i) % P) % P; i += 1 }
    out(0) = h
    var s = 1
    while (s < count) {
      h = ((h - cp(s - 1) % P * pow % P + P) % P * Base + cp(s + eff - 1) % P) % P
      out(s) = h
      s += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    var j = 0
    while (j < count) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, uniq))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of a hashed shingle set in ONE pass per row: for each of
  * k hash functions (splitmix64 finalizer with a per-function seed offset —
  * see [[MinHashFamily.mix]]), the minimum over the input array. Returns
  * array<bigint> of length k.
  *
  * This replaces the explode → shuffle → 48-column min() aggregation
  * formulation of MinHash: per-row work is identical (len·k mixes), but NO
  * shuffle and no 5M-row intermediate — at 100 TB the signature step becomes
  * a map-only pass fused into the scan projection.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
        case ArrayType(LongType, _) => true; case _ => false
      }) && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, foldable int), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(arr: Any, kAny: Any): Any = {
    val xs = arr.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = xs.numElements()
    var e = 0
    while (e < n) {
      val x = xs.getLong(e)
      var i = 0
      while (i < k) {
        val h = MinHashFamily.mix(x, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

/** The shared MinHash hash family: splitmix64's finalizer over the element
  * XOR a per-function seed. Full-avalanche 64-bit mixing — unlike a
  * small-multiplier affine family ((2i+1)·x + c mod P), whose functions are
  * order-preserving for inputs ≪ P/(2i+1) and therefore share their argmin
  * across functions, collapsing the sketch's Jaccard estimate (caught by the
  * PropertySpec estimate-accuracy test). Wrapping Long arithmetic is
  * deterministic on the JVM; minima are taken in signed order, which is fine
  * since the mixed values are uniform over the full Long range.
  */
object MinHashFamily {
  def mix(x: Long, i: Int): Long = {
    var z = x ^ (0x9E3779B97F4A7C15L * (i + 1))
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Random-hyperplane LSH signature: bit j of the result is set iff the
  * embedding's projection onto deterministic integer hyperplane j is ≥ 0,
  * with weight(i, j) = ((i·31 + j·17) mod 7) − 3. Each projection is the
  * SEQUENTIAL left fold Σ w(i,j)·x(i) in double — bit-identical to the
  * `aggregate(zip_with(...))` HOF chain it replaces and to DuckDB's
  * `list_reduce` twin, so swapping it in changes nothing in the oracle
  * compare. One pass computes all nbits projections (nbits·dim FMAs) instead
  * of nbits separate interpreted HOF evaluations per row.
  */
case class HyperplaneSig(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false
      }) && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, foldable int), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(arr: Any, bitsAny: Any): Any = {
    val xs = arr.asInstanceOf[ArrayData]
    val nbits = bitsAny.asInstanceOf[Int]
    val dim = xs.numElements()
    var sig = 0
    var j = 0
    while (j < nbits) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += ((i * 31 + j * 17) % 7 - 3).toDouble * xs.getFloat(i).toDouble
        i += 1
      }
      if (acc >= 0) sig |= 1 << j
      j += 1
    }
    sig
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSig =
    copy(left = newLeft, right = newRight)
}

case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var k = 0
    while (k < n) { sum += x.getFloat(k).toDouble * y.getFloat(k).toDouble; k += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  $sum += (double) $a.getFloat($k) * (double) $b.getFloat($k);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
