package graft.spark.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static percent-escape normalization kernel (RFC 3986 §6.2.2.1-2),
  * shared by the interpreted and generated paths:
  *   - `%XX` escapes of UNRESERVED characters (ALPHA / DIGIT / `-` `.`
  *     `_` `~`) decode to the character — `%7E` and `~` are the same
  *     resource and must dedup together;
  *   - every other valid escape keeps its meaning but uppercases its hex
  *     digits (`%3f` → `%3F`) — case-insensitive equivalence made
  *     canonical;
  *   - a `%` not followed by two hex digits is copied verbatim (real
  *     crawl URLs carry bare percents; normalization must never corrupt).
  * Needs a per-character scan, which no composition of built-in string
  * functions expresses — hence a native kernel, not a UDF (no row
  * conversion, runs inside whole-stage codegen via one static call).
  */
object PercentKernel {
  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('%') < 0) return s // common fast path: nothing to do
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c == '%' && i + 2 < n &&
        hexVal(str.charAt(i + 1)) >= 0 && hexVal(str.charAt(i + 2)) >= 0) {
        val v = hexVal(str.charAt(i + 1)) * 16 + hexVal(str.charAt(i + 2))
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(str.charAt(i + 1)))
          .append(Character.toUpperCase(str.charAt(i + 2)))
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression over [[PercentKernel.normalize]]: one static
  * call per row inside whole-stage codegen (the [[IcebergBucket]]
  * pattern). */
case class NormalizePercentEscapes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_percent_escapes does not support ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PercentKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PercentKernel.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizePercentEscapes =
    copy(child = newChild)

  override def prettyName: String = "normalize_percent_escapes"
}
