package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** The catalog's `bucket(numBuckets, col)` function — the hash behind
  * bucketed manifest tables.
  *
  * It MUST agree bit-for-bit with how the write path placed rows:
  * [[graft.core.ManifestTable.stagePoolBucketed]] repartitions with
  * Spark's `HashPartitioning`, whose partition id is
  * `pmod(murmur3(col, seed=42), n)` — so this function computes exactly
  * that (via Catalyst's own `Murmur3HashFunction`). Spark uses it to
  * translate the scan's reported KeyGroupedPartitioning and, with
  * `spark.sql.sources.v2.bucketing.shuffle.enabled`, to hash the
  * unbucketed side of a join INTO this table's bucket space instead of
  * shuffling both sides. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3(col, 42), numBuckets) — " +
      "the manifest bucketed-write placement hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket wants (numBuckets INT, col), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case StringType | LongType | IntegerType => new GraftBucketBound(keyType)
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type ${other.simpleString} (string/bigint/int)")
    }
  }
}

class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.simpleString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val value: Any = keyType match {
      case StringType  => if (input.isNullAt(1)) null else input.getUTF8String(1)
      case LongType    => if (input.isNullAt(1)) null else input.getLong(1)
      case IntegerType => if (input.isNullAt(1)) null else input.getInt(1)
    }
    // HashPartitioning of a null key: murmur3 leaves the seed unchanged
    // (Catalyst's null contribution), matching Murmur3HashFunction.hash
    // over a null literal — delegate uniformly so placement and function
    // can never drift
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(value, keyType, 42L)
    val m = (h % n).toInt
    if (m < 0) m + n else m
  }
}
