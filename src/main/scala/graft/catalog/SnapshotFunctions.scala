package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The snapshot catalog's V2 function registry — exactly the `bucket`
  * function the bucket partition transform resolves through.
  *
  * Contract: [[BucketBound.produceResult]] must agree bit-for-bit with
  * the WRITER's routing column and the PRUNER's literal evaluation — all
  * three delegate to [[PartitionFields.bucketId]] /
  * [[PartitionFields.routeColumn]], which evaluate the same seed-42
  * [[org.apache.spark.sql.catalyst.expressions.XxHash64]] expression, so
  * a disagreement is impossible by construction. Spark itself only
  * EVALUATES this function when shuffling an un-partitioned join side
  * into the bucket domain (`v2.bucketing.shuffle.enabled`); for plain
  * storage-partitioned joins it is an equality token: both sides bind
  * the same canonical function, so their reported clusterings compare
  * compatible.
  */
object SnapshotFunctions {

  /** Types `bucket(n, col)` accepts — the partitionable set
    * ([[SnapshotTable.validatePartitioning]]); bind refuses anything
    * else so an unsupported transform fails at ANALYSIS, not at runtime.
    */
  private def bucketable(dt: DataType): Boolean = dt match {
    case StringType | DateType | TimestampType | TimestampNTZType | BooleanType |
         ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(xxhash64(col), n) — the snapshot bucket-partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket takes (numBuckets INT, value); got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument is the INT bucket count; got ${inputType.catalogString}")
      val vt = inputType.fields(1).dataType
      require(bucketable(vt),
        s"bucket does not support ${vt.catalogString} values (hash-ambiguous types " +
          "float/double/decimal and nested types are refused)")
      BucketBound(vt)
    }
  }

  case class BucketBound(valueType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${valueType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, valueType)
      Integer.valueOf(PartitionFields.bucketId(v, valueType, n))
    }
  }
}
