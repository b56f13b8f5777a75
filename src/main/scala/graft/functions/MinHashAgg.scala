package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator — the `Aggregator[IN, BUF, OUT]` rung of
  * the custom-function ladder (SURVEY.md §2b): folds hashed shingles into a
  * K-wide signature of per-hash-function minima. Sketches merge
  * element-wise, so the aggregation is map-side combinable and
  * shuffle-friendly at any scale; `Dedup.q34MinhashLsh` uses the one-pass
  * [[MinHashSig]] expression (same family), while this typed form serves
  * `Dataset[T]` pipelines and is cross-checked against it in tests.
  *
  * Hash family: [[MinHashFamily.mix]] (splitmix64 finalizer, per-function
  * seed) — identical to `minhash_sig`.
  */
class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashFamily.mix(x, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity of two equal-width signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
