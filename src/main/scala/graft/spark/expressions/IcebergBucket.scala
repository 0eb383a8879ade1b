package graft.spark.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Murmur3, ValueCodec}

/** Static bucket-hash kernel shared by the interpreted and generated paths.
  * Hashing matches the reference exactly: murmur3_32 seed 0 over the Iceberg
  * single-value binary encoding (values.rs:360-364 + 102-127), with the
  * unsigned remainder (`hash % n` on u32). NOT Spark's `hash()` (murmur3
  * seed 42 over Spark's own encoding).
  */
object BucketKernel {
  def bucketInt(v: Int, n: Int): Int =
    Integer.remainderUnsigned(Murmur3.hash32(ValueCodec.toBytes(v)), n)
  def bucketLong(v: Long, n: Int): Int =
    Integer.remainderUnsigned(Murmur3.hash32(ValueCodec.toBytes(v)), n)
  def bucketUtf8(v: UTF8String, n: Int): Int =
    Integer.remainderUnsigned(Murmur3.hash32(v.getBytes), n)
  def bucketBinary(v: Array[Byte], n: Int): Int =
    Integer.remainderUnsigned(Murmur3.hash32(v), n)
}

/** Native Catalyst expression for the Iceberg bucket transform: runs inside
  * whole-stage codegen (one static call per row — no UDF row conversion or
  * closure serialization on the write/prune hot path). Input is the
  * PHYSICAL value of the column: int days for dates, long µs for
  * timestamps — matching the Iceberg single-value encodings the reference
  * hashes.
  */
case class IcebergBucket(child: Expression, numBuckets: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType => BucketKernel.bucketInt(input.asInstanceOf[Int], numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      BucketKernel.bucketLong(input.asInstanceOf[Long], numBuckets)
    case StringType => BucketKernel.bucketUtf8(input.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => BucketKernel.bucketBinary(input.asInstanceOf[Array[Byte]], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Static forwarder class of the Scala object: Janino can resolve
    // `BucketKernel.bucketInt(...)` but NOT `BucketKernel.MODULE$` (MODULE$
    // lives on the BucketKernel$ class, not the forwarder).
    val kernel = BucketKernel.getClass.getName.stripSuffix("$")
    val fn = child.dataType match {
      case IntegerType | DateType => "bucketInt"
      case LongType | TimestampType | TimestampNTZType => "bucketLong"
      case StringType => "bucketUtf8"
      case BinaryType => "bucketBinary"
    }
    defineCodeGen(ctx, ev, c => s"$kernel.$fn($c, $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)

  override def prettyName: String = "iceberg_bucket"
}
