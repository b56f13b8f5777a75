package graft.sources.catalog

import org.apache.spark.sql.{GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** ENGINE-ENFORCED BOUNDED MERGE-ON-READ MERGE — the optimizer rule that
  * automates (and polarity-guards) q323's hand-written key envelope.
  *
  * Spark 4.1 gives a DELTA (merge-on-read) MERGE's target scan neither
  * static ON-clause pushdown nor runtime group filtering
  * (`RowLevelOperationRuntimeGroupFiltering` matches only group-based
  * `ReplaceData` plans), so an unbounded MOR merge reads the WHOLE target
  * — the one scale hazard of the deletion-vector write path. The manual
  * fix (q323) appends `AND t.k BETWEEN lo AND hi` to the ON clause with
  * bounds from one source aggregate; its documented hazard is that a user
  * can compose the same conjunct with a `WHEN NOT MATCHED BY SOURCE`
  * clause and silently drop out-of-envelope target rows.
  *
  * This rule moves both the move and the guard into the engine. On the
  * ANALYZER-rewritten plan (`RewriteMergeIntoTable` runs at analysis, so
  * every optimizer rule sees the final `WriteDelta` shape) it:
  *
  *   1. matches the merge join under a `WriteDelta` whose target is a
  *      [[StagingDeltaOperation]] scan relation,
  *   2. fires ONLY when the join does not preserve unmatched target rows
  *      (target-left Inner/RightOuter, target-right Inner/LeftOuter) —
  *      a `NOT MATCHED BY SOURCE` merge plans a target-preserving outer
  *      join, so the polarity hazard is structurally excluded rather
  *      than documented,
  *   3. extracts one orderable equi-key `t.k = <src expr>` from the ON
  *      clause, runs ONE tiny min/max aggregate over the source subplan
  *      (the same trade q323 makes by hand: a metadata-scale job buys
  *      file skipping on a 100 TB target), and
  *   4. injects `Filter(k BETWEEN lo AND hi)` directly above the target
  *      side; ordinary predicate pushdown then hands it to the row-level
  *      scan builder and the zone maps turn it into a file subset.
  *
  * SOUNDNESS: lo/hi span ALL source keys of the join, so every possible
  * matched target row satisfies the envelope by construction; in a
  * target-non-preserving join the out-of-envelope target rows can only
  * produce join rows that contribute nothing to the delta. Rows with a
  * NULL target key match nothing and are droppable (the filter's NULL
  * evaluates to not-kept — same outcome). The rule skips: non-deterministic
  * or subquery-bearing sources (bounds could diverge from the executed
  * join), empty sources (no bounds), and joins it already bounded (tag +
  * structural re-check keep the fixed-point iteration from re-running the
  * bounds job). Any failure in the bounds job falls back to the unbounded
  * — always-correct — plan.
  */
object BoundedMorMerge extends Rule[LogicalPlan] with PredicateHelper {

  private val Injected = TreeNodeTag[Boolean]("graft.bounded.mor.merge")

  private def orderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def stagingDeltaRelation(p: LogicalPlan): Boolean =
    p.collectFirst {
      case r: DataSourceV2Relation if GraftSqlShims.rowLevelOperationOf(r.table)
          .exists(_.isInstanceOf[StagingDeltaOperation]) => r
    }.isDefined

  /** The target subtree already carries a literal range filter on the key —
    * either this rule's own envelope on a prior fixed-point pass or a
    * user-written q323-style bound (in which case the scan is bounded
    * already and a second job buys nothing).
    */
  private def alreadyBounded(side: LogicalPlan, key: Attribute): Boolean =
    side.exists {
      case Filter(cond, _) =>
        splitConjunctivePredicates(cond).exists {
          case GreaterThanOrEqual(a: Attribute, _: Literal) => a.semanticEquals(key)
          case LessThanOrEqual(a: Attribute, _: Literal)    => a.semanticEquals(key)
          case _ => false
        }
      case _ => false
    }

  private def hasSubquery(p: LogicalPlan): Boolean =
    p.exists(n => n.isInstanceOf[CTERelationRef] ||
      n.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression])))

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case wd: WriteDelta =>
      val q2 = wd.query.transformUp {
        case j @ Join(left, right, jt, Some(cond), hint)
            if j.getTagValue(Injected).isEmpty =>
          val (targetSide, sourceSide, safe) =
            if (stagingDeltaRelation(left))
              (Some(left), right, jt == Inner || jt == RightOuter)
            else if (stagingDeltaRelation(right))
              (Some(right), left, jt == Inner || jt == LeftOuter)
            else (None, left, false)
          targetSide match {
            case Some(t) if safe && sourceSide.deterministic && !hasSubquery(sourceSide) =>
              bound(j, t, sourceSide, jt, cond, hint)
            case _ =>
              // target-preserving (BY SOURCE) or foreign join: never bound
              j.setTagValue(Injected, true)
              j
          }
      }
      if (q2 eq wd.query) wd else wd.copy(query = q2)
    case _ => plan
  }

  private def bound(j: Join, target: LogicalPlan, source: LogicalPlan,
      jt: JoinType, cond: Expression, hint: JoinHint): LogicalPlan = {
    val pair = splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(a: Attribute, s)
          if target.outputSet.contains(a) && s.references.subsetOf(source.outputSet) &&
            orderable(a.dataType) && s.deterministic => (a, s)
      case EqualTo(s, a: Attribute)
          if target.outputSet.contains(a) && s.references.subsetOf(source.outputSet) &&
            orderable(a.dataType) && s.deterministic => (a, s)
    }
    pair match {
      case Some((key, _)) if alreadyBounded(target, key) =>
        j.setTagValue(Injected, true); j
      case Some((key, srcKey)) =>
        try {
          val aggs = Seq(
            Alias(AggregateExpression(Min(srcKey), Complete, isDistinct = false), "graft_lo")(),
            Alias(AggregateExpression(Max(srcKey), Complete, isDistinct = false), "graft_hi")())
          val row = GraftSqlShims
            .ofRows(SparkSession.active, Aggregate(Nil, aggs, source)).collect()(0)
          if (row.isNullAt(0) || row.isNullAt(1)) { j.setTagValue(Injected, true); j }
          else {
            val envelope = And(
              GreaterThanOrEqual(key, Literal.create(row.get(0), key.dataType)),
              LessThanOrEqual(key, Literal.create(row.get(1), key.dataType)))
            // inject DIRECTLY above the relation, not above the whole
            // target side: the delta rewrite wraps the target in a
            // non-deterministic Project (monotonically_increasing_id for
            // the cardinality check), which ordinary predicate pushdown
            // refuses to push filters through — above the relation the
            // envelope reaches DSv2 pushdown (and the zone maps) untouched
            val newTarget = target.transformUp {
              case r: DataSourceV2Relation if GraftSqlShims.rowLevelOperationOf(r.table)
                  .exists(_.isInstanceOf[StagingDeltaOperation]) => Filter(envelope, r)
            }
            val bounded =
              if (target eq j.left) j.copy(left = newTarget)
              else j.copy(right = newTarget)
            bounded.setTagValue(Injected, true)
            bounded
          }
        } catch {
          case _: Exception => j.setTagValue(Injected, true); j // unbounded = correct
        }
      case None =>
        j.setTagValue(Injected, true); j
    }
  }
}
