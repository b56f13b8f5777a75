package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed outer-product accumulator: folds quantized d-dim vectors into the
  * d·(d−1)/2 upper-triangle cross-moment sums Σ xᵢ·xⱼ in ONE tight loop per
  * row — the `Aggregator` rung of the custom-function ladder applied to the
  * covariance matrix (q149). The buffer is a primitive long array indexed
  * row-major (i ascending, j ascending — consumers generate the matching
  * (i, j) list positionally), merges element-wise, and is therefore
  * map-side combinable: at any scale each partition contributes one
  * 2016-slot array, not millions of exploded pair rows. Inputs are exact
  * integers (pre-quantized), so the sums are order-independent int64.
  */
class CovPairSums(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val m = d * (d - 1) / 2

  override def zero: Array[Long] = new Array[Long](m)

  override def reduce(buf: Array[Long], a: Array[Long]): Array[Long] = {
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = a(i)
      var j = i + 1
      while (j < d) { buf(idx) += xi * a(j); idx += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < m) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
