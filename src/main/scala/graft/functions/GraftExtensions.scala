package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the custom codegen expressions as SQL functions through the
  * public extension point (`spark.sql.extensions=graft.functions.GraftExtensions`),
  * so `expr("sorted_intersect_count(a, b)")` resolves in any query plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => HyperplaneSig(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (args: Seq[Expression]) => DamerauLevenshtein(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("char_jaccard"),
      new ExpressionInfo(classOf[CharJaccard].getName, "char_jaccard"),
      (args: Seq[Expression]) => CharJaccard(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (args: Seq[Expression]) => HammingDistance(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("common_prefix_length"),
      new ExpressionInfo(classOf[CommonPrefixLength].getName, "common_prefix_length"),
      (args: Seq[Expression]) => CommonPrefixLength(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (args: Seq[Expression]) => TokenCount(args.head)))
    ext.injectFunction((
      FunctionIdentifier("ahash_bands"),
      new ExpressionInfo(classOf[AHashBands].getName, "ahash_bands"),
      (args: Seq[Expression]) => AHashBands(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (args: Seq[Expression]) => BpeTokenCount(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("norm_text"),
      new ExpressionInfo(classOf[NormText].getName, "norm_text"),
      (args: Seq[Expression]) => NormText(args.head)))
    // Spark's own Bloom-filter probe expression (the machinery behind the
    // runtime bloom-filter join, SPARK-32268) is registered INTERNAL-only;
    // expose it by name so manual guide-§3.2 pre-filters (build a filter
    // over a selective join side, drop non-matching probe rows BEFORE their
    // exchange — q324) are expressible in plain column code. A pure
    // re-export of the builtin expression — no custom evaluation code; the
    // filter bytes come from `DataFrame.stat.bloomFilter` (same sketch
    // class) passed as a constant.
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getName, "might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args.head, args(1))))
    // Table-valued function: graft_bins(lo, hi, width) bin spine (GraftBins)
    ext.injectTableFunction((
      FunctionIdentifier("graft_bins"),
      new ExpressionInfo(GraftBins.getClass.getName, "graft_bins"),
      (args: Seq[Expression]) => GraftBins.plan(args)))
    // Engine rewrite: size(split(s, ' ')) → token_count(s) (see RewriteTokenCount)
    ext.injectOptimizerRule(_ => RewriteTokenCount)
    // Engine-enforced bounded merge-on-read MERGE: inject the source-key
    // envelope into the delta merge's target side, polarity-guarded
    // (see graft.sources.catalog.BoundedMorMerge)
    ext.injectOptimizerRule(_ => graft.sources.catalog.BoundedMorMerge)
    // Whole-operator extension: per-key top-k via bounded heaps (no sort) —
    // logical node graft.plans.TopKPerKeyPlan planned to TopKPerKeyExec.
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
