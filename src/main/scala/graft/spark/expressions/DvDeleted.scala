package graft.spark.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}

import graft.table.{Puffin, Roaring}

/** Executor-side index over a snapshot's deletion vectors: serialized
  * `deletion-vector-v1` blob bytes keyed by referenced data-file path
  * (the `_metadata.file_path` rendering). Ships ONCE per executor inside a
  * broadcast; bitmaps decode lazily on first probe and are memoized for the
  * executor's lifetime (`@transient lazy` — re-derived per JVM, never
  * serialized).
  */
final class DvIndex(val blobs: Map[String, Array[Byte]]) extends Serializable {
  @transient private lazy val decoded: java.util.concurrent.ConcurrentHashMap[String, Roaring.Bitmap64] =
    new java.util.concurrent.ConcurrentHashMap[String, Roaring.Bitmap64]()

  def deleted(path: String, pos: Long): Boolean = {
    val bm = decoded.get(path)
    if (bm != null) return bm.contains(pos)
    blobs.get(path) match {
      case None => false
      case Some(bytes) =>
        val fresh = Puffin.dvFromBlob(bytes)
        val prior = decoded.putIfAbsent(path, fresh)
        (if (prior != null) prior else fresh).contains(pos)
    }
  }
}

/** TRUE iff the row at (`path`, `pos`) is masked by a deletion vector in the
  * broadcast index — the V3 merge-on-read positional layer as a FILTER
  * inside the scan stage, replacing the parquet-position-delete anti-join
  * (no join, no shuffle, plan width constant in the number of vectors).
  *
  * CodegenFallback is deliberate: the per-row work is one hash probe + one
  * bitmap membership test on primitive longs, and keeping the expression
  * out of codegen leaves the surrounding scan/filter stages fused by
  * whole-stage codegen with this as a leaf predicate call.
  */
case class DvDeleted(path: Expression, pos: Expression, index: Broadcast[DvIndex])
    extends Expression with Predicate with CodegenFallback {

  override def children: Seq[Expression] = Seq(path, pos)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (path.dataType, pos.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dv_deleted expects (string, bigint), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val x = pos.eval(input)
    if (p == null || x == null) false
    else index.value.deleted(p.toString, x.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DvDeleted =
    copy(path = newChildren(0), pos = newChildren(1))
}
