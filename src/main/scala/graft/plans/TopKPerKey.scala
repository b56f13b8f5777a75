package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator Catalyst extension: per-key top-k WITHOUT sorting.
  *
  * The built-in way to take the k best rows per key is
  * `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which sorts
  * every group in full — O(n log n) per partition and a sort buffer
  * proportional to the partition, spilling at scale. This operator replaces
  * that with bounded per-key heaps: one pass over the shuffled rows,
  * O(n log k) comparisons, memory O(keys · k) regardless of group size —
  * the aggregation-buffer shape, not the sort shape. It is the
  * SURVEY §2 preference-ladder tier (c): custom LogicalPlan + SparkStrategy
  * + SparkPlan registered through SparkSessionExtensions
  * ([[graft.functions.GraftExtensions]]), used when composition (a) and a
  * custom Expression (b) can't change the EXECUTION shape.
  *
  * Scale notes: the exchange comes from `requiredChildDistribution`
  * (ClusteredDistribution on the keys), so AQE still coalesces/splits it;
  * heaps hold UnsafeRow COPIES (shuffle readers reuse row buffers); a
  * giant-k misuse would degrade toward the sort it replaces, so k is
  * capped at 1024 by the API.
  */
case class TopKPerKeyPlan(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (keyExprs, ordExprs, limit) = (keys, order, k)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      // BaseOrdering: row a "first" (best) when compare(a, b) < 0
      val ord = GenerateOrdering.generate(ordExprs, schema)
      // max-heap by ord: head is the WORST retained row, the eviction candidate
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row.asInstanceOf[InternalRow])
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              Ordering.comparatorToOrdering(ord).asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Keep the k first rows per key under (orderBy, tiebreaks): descending on
    * `orderBy` when `desc`, tiebreaks always ascending (pass enough of them
    * to make the order total, or ties are resolved arbitrarily — same
    * contract as a window rank).
    */
  def topK(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: String,
      desc: Boolean,
      tiebreaks: Seq[String],
      k: Int): DataFrame = {
    require(k > 0 && k <= 1024, s"k must be in [1, 1024], got $k")
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name)}"))
    val order = SortOrder(attr(orderBy), if (desc) Descending else Ascending) +:
      tiebreaks.map(t => SortOrder(attr(t), Ascending))
    GraftSqlShims.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyCols.map(attr), order, k, plan))
  }
}
