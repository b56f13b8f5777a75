package graft.sources.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** DSv2 `FunctionCatalog` surface of the staging catalog: functions that
  * live IN the catalog (`SELECT graft_stage.system.mod_bucket(k, 16)`),
  * resolved by Spark's V2 function resolution rather than session-local
  * registration — the shape that lets every session sharing a catalog share
  * its canonical derivations with no setup code.
  *
  *  - `mod_bucket(k BIGINT, n INT) → INT`: the non-negative hash-bucket
  *    residue ((k % n) + n) % n — the catalog's one canonical bucketing so
  *    writers (CLUSTER BY), readers, and maintenance agree on file
  *    assignment. Implements the MAGIC METHOD (`invoke(long, int)`), so
  *    Spark compiles the call straight into whole-stage codegen as a
  *    static-dispatch method call — no InternalRow boxing on the hot path;
  *    `produceResult` stays as the contractual interpreted fallback.
  *  - `dsum4(x DOUBLE) → DOUBLE`: order-independent money-sum — each value
  *    rounds to DECIMAL(18,4) (HALF_UP, the same rule Spark's
  *    double→decimal cast applies) and accumulates in exact BigDecimal
  *    arithmetic, so partial aggregation is bit-stable under ANY
  *    partitioning. This is [[graft.operators.Det.dsum]] promoted from a
  *    per-query convention to a catalog-level V2 `AggregateFunction`:
  *    Spark plans it with distributed partial/merge states like any
  *    built-in aggregate.
  *
  * Reference tie: the reference exposes no compute, so functions-as-catalog
  * -objects is engine surface (Spark 4's FunctionCatalog); the determinism
  * rules they encode are SURVEY §5's.
  */
private[catalog] object StagingFunctions {

  val names: Seq[String] = Seq("dsum4", "mod_bucket", "bucket")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "mod_bucket" => Some(ModBucket)
    case "bucket"     => Some(Bucket)
    case "dsum4"      => Some(DSum4)
    case _            => None
  }

  object ModBucket extends UnboundFunction {
    override def name(): String = "mod_bucket"
    override def description(): String =
      "mod_bucket(k BIGINT, n INT): non-negative residue of k modulo n — " +
        "the catalog's canonical bucket assignment"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 2)
        throw new UnsupportedOperationException("mod_bucket expects (k BIGINT, n INT)")
      Bound
    }
    object Bound extends ScalarFunction[Integer] {
      override def name(): String = "mod_bucket"
      override def canonicalName(): String = "graft.mod_bucket"
      override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
      override def resultType(): DataType = IntegerType
      override def isResultNullable: Boolean = false
      // magic method: codegen calls this directly, primitives in and out.
      // n must be positive: raw % would throw an opaque codegen
      // ArithmeticException on 0 and yield NEGATIVE residues for negative
      // n, both violating the documented non-negative-bucket contract — so
      // reject bad bucket counts loudly here (the interpreted
      // produceResult path funnels through the same guard).
      def invoke(k: Long, n: Int): Int = {
        if (n <= 0) throw new IllegalArgumentException(
          s"mod_bucket: bucket count must be a positive INT, got $n")
        (((k % n) + n) % n).toInt
      }
      override def produceResult(input: InternalRow): Integer =
        invoke(input.getLong(0), input.getInt(1))
    }
  }

  /** The TRANSFORM-RESOLUTION face of [[ModBucket]]: Spark's
    * storage-partitioned-join machinery resolves a table's declared
    * `bucket(n, c)` partition transform by loading a function literally
    * named `bucket` from the table's own catalog with argument shape
    * (numBuckets INT, key) — `V2ExpressionUtils.loadV2FunctionOpt`. The
    * bound semantics ARE mod_bucket's ((k % n) + n) % n — the same residue
    * the OPTIMIZE bucket layout derives with `pmod` — so the
    * KeyGroupedPartitioning the scan reports agrees bit-for-bit with file
    * placement, and two tables laid out by the same spec compare
    * SPJ-compatible (equal `canonicalName`, equal bucket count).
    */
  object Bucket extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n INT, k): the catalog's canonical bucket transform — " +
        "non-negative residue of k modulo n (mod_bucket with transform " +
        "argument order)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 2 || inputType.fields(0).dataType != IntegerType)
        throw new UnsupportedOperationException(
          s"bucket expects (numBuckets INT, k BIGINT|INT), got $inputType")
      inputType.fields(1).dataType match {
        case LongType    => BoundLong
        case IntegerType => BoundInt
        case other => throw new UnsupportedOperationException(
          s"bucket key must be integral, got $other")
      }
    }
    /** One shared canonical name: INT and BIGINT keys bucket identically,
      * so a mixed-width join pair still reports as the same function.
      */
    private def residue(n: Int, k: Long): Int = {
      if (n <= 0) throw new IllegalArgumentException(
        s"bucket: bucket count must be a positive INT, got $n")
      (((k % n) + n) % n).toInt
    }
    /** COMPATIBLE BUCKET COUNTS (r12 — SPARK-47094's `ReducibleFunction`
      * face): with `spark.sql.sources.v2.bucketing
      * .allowCompatibleTransforms.enabled`, a `bucket(8,k)` side of an SPJ
      * can REDUCE its residues onto a `bucket(4,k)` partner — sound
      * because mod_bucket composes: ((k mod 8) mod 4) == k mod 4 whenever
      * 4 divides 8. The finer layout's groups then coarsen to the
      * partner's grain and the join still plans with ZERO Exchange; a
      * non-divisible pair (4⋈6) returns no reducer and Spark shuffles as
      * before. Only graft's own bucket family reduces (another catalog's
      * `bucket` may hash first — residue composition would not hold).
      */
    private[catalog] trait BucketReducible
        extends org.apache.spark.sql.connector.catalog.functions
          .ReducibleFunction[Integer, Integer] {
      override def reducer(thisNumBuckets: Int,
          otherFunction: org.apache.spark.sql.connector.catalog.functions
            .ReducibleFunction[_, _],
          otherNumBuckets: Int)
          : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
        if (otherFunction.isInstanceOf[BucketReducible] &&
            otherNumBuckets > 0 && thisNumBuckets > otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0)
          BucketReducer(otherNumBuckets)
        else null // equal counts, non-divisible, or a foreign bucket family
    }
    object BoundLong extends ScalarFunction[Integer] with BucketReducible {
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
      override def resultType(): DataType = IntegerType
      def invoke(n: Int, k: Long): Int = residue(n, k)
      override def produceResult(input: InternalRow): Integer =
        residue(input.getInt(0), input.getLong(1))
    }
    object BoundInt extends ScalarFunction[Integer] with BucketReducible {
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
      override def resultType(): DataType = IntegerType
      def invoke(n: Int, k: Int): Int = residue(n, k.toLong)
      override def produceResult(input: InternalRow): Integer =
        residue(input.getInt(0), input.getInt(1).toLong)
    }
  }

  /** Residue coarsening for [[Bucket]]'s compatible-count SPJ: a finer
    * bucket value reduces to the coarser count by plain mod (non-negative
    * in → non-negative out). Serializable case class: rides into Spark's
    * key-grouped partitioning values.
    */
  private[catalog] final case class BucketReducer(coarser: Int)
      extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] {
    override def reduce(bucket: Integer): Integer = Integer.valueOf(bucket % coarser)
  }

  object DSum4 extends UnboundFunction {
    override def name(): String = "dsum4"
    override def description(): String =
      "dsum4(x DOUBLE): sum of x rounded per-value to DECIMAL(18,4) — " +
        "order-independent (exact decimal accumulation), returned as DOUBLE"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 1)
        throw new UnsupportedOperationException("dsum4 expects (x DOUBLE)")
      Bound
    }
    object Bound extends AggregateFunction[java.math.BigDecimal, java.lang.Double] {
      override def name(): String = "dsum4"
      override def canonicalName(): String = "graft.dsum4"
      override def inputTypes(): Array[DataType] = Array(DoubleType)
      override def resultType(): DataType = DoubleType
      override def isResultNullable: Boolean = false
      override def newAggregationState(): java.math.BigDecimal = java.math.BigDecimal.ZERO
      override def update(state: java.math.BigDecimal,
          input: InternalRow): java.math.BigDecimal =
        if (input.isNullAt(0)) state
        else state.add(java.math.BigDecimal.valueOf(input.getDouble(0))
          .setScale(4, java.math.RoundingMode.HALF_UP))
      override def merge(a: java.math.BigDecimal,
          b: java.math.BigDecimal): java.math.BigDecimal = a.add(b)
      override def produceResult(state: java.math.BigDecimal): java.lang.Double =
        state.doubleValue()
    }
  }
}
