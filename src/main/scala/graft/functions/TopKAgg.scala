package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator: keeps the k best (score, id) pairs per
  * group in a bounded buffer, merged element-wise — the Aggregator-rung
  * answer to "top k per key" (SURVEY §2b custom-function ladder).
  *
  * Why it exists: the window formulation (`row_number` over
  * (partitionBy key, orderBy score)) SORTS every group's full row set
  * before discarding all but k. This aggregator is map-side combinable —
  * each partition reduces a group's rows into a k-bounded buffer before
  * the shuffle, so only k·partitions candidate rows per group ever move —
  * the same partial-top-k principle `TakeOrderedAndProject` applies
  * globally (q14), lifted to per-group scope.
  *
  * Ordering: best = highest (score, -id) — descending score, ascending id
  * tie-break — so results are deterministic and exactly match the window
  * twin (`row_number` over score DESC, id ASC).
  *
  * Buffer is a plain sorted array (descending): k is small by contract,
  * so insertion is an O(k) shift — allocation-free and encoder-friendly.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] =
    insert(buf, x)

  private def insert(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length >= k && !better(x, buf(buf.length - 1))) buf
    else {
      var pos = buf.length
      var i = 0
      while (i < buf.length) { if (better(x, buf(i))) { pos = i; i = buf.length } else i += 1 }
      val out = new Array[(Double, Long)](math.min(buf.length + 1, k))
      var j = 0
      while (j < pos && j < out.length) { out(j) = buf(j); j += 1 }
      if (pos < out.length) out(pos) = x
      j = pos + 1
      while (j < out.length) { out(j) = buf(j - 1); j += 1 }
      out
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: Array[(Double, Long)]): Array[(Double, Long)] = r

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
