package graft.spark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static z-order kernel shared by the interpreted and generated paths. */
object ZOrderKernel {
  /** Order-preserving unsigned mapping of a signed long (flip the sign bit). */
  def rankLong(v: Long): Long = v ^ Long.MinValue

  /** Order-preserving unsigned mapping of an IEEE double: non-negative
    * doubles order like their bit patterns with the sign flipped; negative
    * doubles need all bits flipped. Total order matches `java.lang.Double
    * .compare` (NaN sorts above +Inf). */
  def rankDouble(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    if (bits >= 0) bits ^ Long.MinValue else ~bits
  }

  /** Interleaves ALL 64 bits of each unsigned rank round-robin from the most
    * significant bit into an 8n-byte key — the full-fidelity Morton
    * (z-order) key. Bytes compare unsigned lexicographically, which is
    * exactly the interleaved-bit order; keeping every bit avoids the classic
    * truncation trap where small values (whose entropy lives in the LOW
    * bits) all collapse onto one key.
    */
  def interleave(ranks: Array[Long]): Array[Byte] = {
    val n = ranks.length
    val out = new Array[Byte](8 * n)
    var k = 0
    val total = 64 * n
    while (k < total) {
      val bit = (ranks(k % n) >>> (63 - k / n)) & 1L
      if (bit != 0L) out(k >> 3) = (out(k >> 3) | (1 << (7 - (k & 7)))).toByte
      k += 1
    }
    out
  }
}

/** Morton (z-order) clustering key over 2..8 numeric/temporal columns: the
  * bit-interleaved key linearizes a multi-dimensional space so that range
  * sorting on ONE derived column co-locates rows that are close in EVERY
  * input dimension — files then carry tight min/max bounds on all of them,
  * and statistics pruning works for filters on any clustered column (the
  * standard multi-dimensional file-skipping layout). NULLs rank lowest.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2 || children.size > 8)
      return TypeCheckResult.TypeCheckFailure("zorder takes 2 to 8 columns")
    val bad = children.map(_.dataType).filterNot {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType | DoubleType | FloatType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"zorder does not support ${bad.mkString(", ")}")
  }

  private def rankOf(e: Expression, v: Any): Long =
    if (v == null) 0L
    else e.dataType match {
      case LongType | TimestampType | TimestampNTZType => ZOrderKernel.rankLong(v.asInstanceOf[Long])
      case IntegerType | DateType => ZOrderKernel.rankLong(v.asInstanceOf[Int].toLong)
      case ShortType => ZOrderKernel.rankLong(v.asInstanceOf[Short].toLong)
      case ByteType => ZOrderKernel.rankLong(v.asInstanceOf[Byte].toLong)
      case DoubleType => ZOrderKernel.rankDouble(v.asInstanceOf[Double])
      case FloatType => ZOrderKernel.rankDouble(v.asInstanceOf[Float].toDouble)
      case other => throw new IllegalStateException(s"unsupported zorder type $other")
    }

  override def eval(input: InternalRow): Any =
    ZOrderKernel.interleave(children.map(c => rankOf(c, c.eval(input))).toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    // Static forwarder class, not `.MODULE$` — Janino rejects MODULE$ on the
    // forwarder class and the whole stage silently falls back to interpreted.
    val kernel = ZOrderKernel.getClass.getName.stripSuffix("$")
    val arr = ctx.freshName("ranks")
    val evals = children.map(_.genCode(ctx))
    val fills = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val rank = c.dataType match {
        case DoubleType => s"$kernel.rankDouble(${e.value})"
        case FloatType => s"$kernel.rankDouble((double) ${e.value})"
        case _ => s"$kernel.rankLong((long) ${e.value})"
      }
      code"""
         |${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : $rank;
       """.stripMargin
    }.reduce(_ + _)
    ev.copy(
      code = code"""
         |long[] $arr = new long[${children.size}];
         |$fills
         |byte[] ${ev.value} = $kernel.interleave($arr);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)

  override def prettyName: String = "zorder"
}

object ZOrderFunctions {
  /** Morton z-order clustering key over the given columns. */
  def zorder(cols: Column*): Column =
    GraftShim.column(ZOrderKey(cols.map(GraftShim.expression)))
}
