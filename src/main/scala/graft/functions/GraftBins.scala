package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range}
import org.apache.spark.sql.types.LongType

/** Table-valued function `graft_bins(lo, hi, width)` → rows
  * `(bin_id BIGINT, bin_lo BIGINT, bin_hi BIGINT)` covering `[lo, hi)` in
  * `width`-sized bins — the histogram/bin-spine generator (the numeric twin
  * of q62's calendar spine): LEFT JOIN data onto the spine and EMPTY bins
  * appear as zero rows instead of silently vanishing, which a
  * groupBy(floor(x/width)) can never produce.
  *
  * Registered through `SparkSessionExtensions.injectTableFunction` — the
  * TVF face of the extension API (the scalar faces are the codegen kernels,
  * the planner face is TopKPerKey). The plan is pure Catalyst:
  * `Project(arith over Range(0, n))`, so it splits/parallelizes exactly
  * like `range()` and constant-folds into literals.
  *
  * Arguments must be foldable integer literals (a spine is schema, not
  * data): evaluated at resolution time, `n = ceil((hi − lo) / width)`.
  */
object GraftBins {
  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      s"graft_bins(lo, hi, width) takes 3 arguments, got ${args.length}")
    def longArg(i: Int, name: String): Long = {
      val e = args(i)
      require(e.foldable, s"graft_bins: $name must be a literal, got $e")
      Cast(e, LongType).eval(null) match {
        case l: java.lang.Long => l.longValue()
        case other => throw new IllegalArgumentException(
          s"graft_bins: $name must be integral, got $other")
      }
    }
    val lo = longArg(0, "lo")
    val hi = longArg(1, "hi")
    val width = longArg(2, "width")
    require(width > 0, s"graft_bins: width must be positive, got $width")
    require(hi > lo, s"graft_bins: hi ($hi) must exceed lo ($lo)")
    val n = (hi - lo + width - 1) / width
    val range = Range(0, n, 1, None)
    val id = range.output.head
    Project(Seq(
      Alias(id, "bin_id")(),
      Alias(org.apache.spark.sql.catalyst.expressions.Add(
        Literal(lo), org.apache.spark.sql.catalyst.expressions.Multiply(
          id, Literal(width))), "bin_lo")(),
      // the last bin CLAMPS to hi: when (hi-lo) % width != 0 the raw
      // lo + (id+1)*width overruns the documented [lo, hi) coverage, and a
      // range-join consumer would silently aggregate [hi, overrun) into it
      Alias(org.apache.spark.sql.catalyst.expressions.Least(Seq(
        Literal(hi),
        org.apache.spark.sql.catalyst.expressions.Add(
          Literal(lo), org.apache.spark.sql.catalyst.expressions.Multiply(
            org.apache.spark.sql.catalyst.expressions.Add(id, Literal(1L)),
            Literal(width))))), "bin_hi")()), range)
  }
}
