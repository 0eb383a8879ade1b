package graft.spark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two Array[Long] columns — the hot kernel
  * of every similarity-search operator (reference capability: embedding
  * scoring; see SURVEY §2 pipeline ops). A lambda formulation
  * (`aggregate(zip_with(...))`) is a Catalyst higher-order function, which
  * has no code generation and evaluates one boxed element at a time; on an
  * all-pairs scoring loop that interpretation overhead dominates the whole
  * query. This expression compiles to a tight primitive `long` loop inside
  * whole-stage codegen.
  *
  * Inputs are the int64-QUANTIZED vectors produced by
  * [[graft.pipeline.Embeddings.quantize]], so the accumulation is exact and
  * engine-portable (no float summation-order dependence).
  */
case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dotq expects two array<bigint> inputs, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dotq"
}

/** Column-level entry points for graft's native expressions. */
object VectorFunctions {
  /** Exact dot product of two quantized (array<bigint>) vectors. */
  def dotq(a: Column, b: Column): Column =
    GraftShim.column(LongArrayDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Exact squared L2 norm of a quantized vector. */
  def normSq(a: Column): Column = dotq(a, a)
}
