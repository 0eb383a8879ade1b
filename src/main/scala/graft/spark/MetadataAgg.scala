package graft.spark

import scala.util.Try

import graft.core.ValueCodec
import graft.spec.IceType
import graft.table.IceTable
import graft.table.ManifestModel.ContentData

/** Metadata-only global aggregates: answers `count(*)` / `count(col)` /
  * `min(col)` / `max(col)` over a graft table from MANIFEST STATISTICS
  * alone — zero data files opened, O(manifests) driver work (the same cost
  * class as scan planning). At 100 TB this turns `SELECT count(*) FROM t`
  * from a full-table scan into a millisecond metadata read; it is the
  * manifest-stats analogue of Spark's DSv2 `SupportsPushDownAggregates`
  * path, answered at optimizer time by [[org.apache.spark.sql.GraftReadRule]]
  * (reference stats surface: iceberg-rust-spec manifest `record_count` /
  * `null_value_counts` / `lower_bounds` / `upper_bounds`, manifest.rs).
  *
  * EXACTNESS is the contract — the rewrite must be invisible. `answer`
  * therefore returns None (caller falls back to a real scan) unless every
  * prerequisite is PROVEN from metadata:
  *
  *  - the snapshot holds NO live delete files (an equality delete masks an
  *    unknown number of rows; a positional delete can remove the extreme
  *    row — either makes every stat an upper bound, not an answer);
  *  - `count(col)` needs a null count recorded for the column in EVERY
  *    live data file (a pre-evolution file that never wrote the column has
  *    no entry and bails the rewrite — conservative, never wrong);
  *  - `min`/`max(col)` need a decodable bound in every file, or a proof
  *    the file is all-null for the column (`null_count == record_count`);
  *  - `min`/`max` types are restricted to int / long / date / time /
  *    timestamp / decimal: float and double bounds are unreliable under
  *    NaN (parquet writers disagree on NaN ordering), and string bounds
  *    may be TRUNCATED by foreign parquet writers on imported files —
  *    both families scan instead.
  *
  * Returned values are CATALYST-INTERNAL (Int days for date, Long micros
  * for timestamps, [[org.apache.spark.sql.types.Decimal]] for decimals) so
  * the rule can build a `LocalRelation` row directly.
  */
object MetadataAgg {

  sealed trait AggSpec
  case object CountStar extends AggSpec
  final case class CountCol(name: String) extends AggSpec
  final case class MinCol(name: String) extends AggSpec
  final case class MaxCol(name: String) extends AggSpec
  /** The grouping column's own value (grouped form only). */
  final case class GroupVal(name: String) extends AggSpec

  /** Types whose manifest bounds are exact end-to-end (see scaladoc). */
  private def boundExact(t: IceType): Boolean = t match {
    case IceType.IntT | IceType.LongT | IceType.DateT | IceType.TimeT |
         IceType.TimestampT | IceType.TimestamptzT => true
    case IceType.DecimalT(_, _) => true
    case _ => false
  }

  /** Exact total-order compare for the [[boundExact]] value families —
    * decimals compare exactly (never through a lossy double round-trip).
    * Anything else throws and bails the rewrite via the enclosing Try.
    */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case _ => throw new IllegalStateException(s"uncomparable bounds: $a / $b")
  }

  /** Decoded manifest value → catalyst-internal value. */
  private def toInternal(t: IceType, v: Any): Any = (t, v) match {
    case (IceType.DecimalT(p, s), d: java.math.BigDecimal) =>
      org.apache.spark.sql.types.Decimal(d, p, s)
    case _ => v // Int/Long families decode straight to their internal form
  }

  /** Answers `specs` globally (no grouping) from manifest stats at the
    * (possibly pinned) snapshot, or None when exactness cannot be proven.
    * Mirrors the SQL read path's snapshot handling: a pinned id reads the
    * schema-at-snapshot.
    */
  def answer(table: IceTable, snapshotId: Option[Long],
             specs: Seq[AggSpec]): Option[Seq[Any]] =
    answerGrouped(table, snapshotId, Nil, specs).flatMap {
      case Seq(row) => Some(row)
      case _ => None // zero groups can't happen with Nil grouping
    }

  /** Grouped form: `GROUP BY` columns that are IDENTITY partition sources
    * of the current spec are answered from per-file partition tuples — the
    * per-partition stats path (`SELECT lang, count(*) … GROUP BY lang` at
    * 100 TB = one manifest read, zero data IO). Identity partitioning
    * guarantees every row of a file carries the file's own tuple value, so
    * file-level stats aggregate exactly within each group; a file whose
    * tuple lacks a grouping field (pre-evolution spec) bails the rewrite.
    * Group value types are restricted to int/long/boolean/string/date/
    * timestamp (decimal and binary tuples round-trip as raw bytes —
    * ambiguous, so they scan). With `groupCols` empty this degenerates to
    * the one-row global form (an empty table then answers count 0 /
    * min NULL; with grouping it answers zero rows, exactly like SQL).
    * Returns one row per group, columns ordered as `specs`.
    */
  def answerGrouped(table: IceTable, snapshotId: Option[Long],
                    groupCols: Seq[String],
                    specs: Seq[AggSpec]): Option[Seq[Seq[Any]]] = Try {
    val snap = snapshotId.flatMap(table.snapshotById)
      .orElse(table.currentSnapshot(None))
    val schema =
      if (snapshotId.isDefined) table.metadata.schemaAt(snap)
      else table.metadata.currentSchema
    val entries = snap.map(table.entries(_)).getOrElse(Nil)
    if (entries.exists(_.dataFile.content != ContentData)) None
    else {
      // grouping col -> (partition tuple key, iceberg type); every grouping
      // col must be an identity field of the DEFAULT spec with a groupable
      // type, else bail
      val spec = table.metadata.partitionSpecs.get(table.metadata.defaultSpecId)
      val keys: Option[Seq[(String, graft.spec.IceType)]] =
        if (groupCols.isEmpty) Some(Nil)
        else spec.flatMap { sp =>
          // a tuple field NAME only identifies a meaning when every spec in
          // history that defines it agrees on (source column, transform) —
          // the rewriteDeletes rule: a re-used name (column dropped,
          // re-added, re-partitioned under the same field name) would
          // attribute OLD files' stats to the new column's values where SQL
          // puts those rows in the NULL group. Entries don't carry their
          // origin spec id, so ambiguity means bail, never guess.
          val defCount: Map[String, Int] = table.metadata.partitionSpecs.values
            .flatMap(_.fields.map(pf => pf.name -> ((pf.sourceId, pf.transform))))
            .toSeq.distinct.groupBy(_._1).map { case (n, ds) => n -> ds.size }
          val resolved = groupCols.map { g =>
            sp.fields.collectFirst {
              case pf if pf.transform == graft.core.Transform.Identity &&
                schema.fieldById(pf.sourceId).exists(_.name == g) &&
                defCount.getOrElse(pf.name, 1) == 1 =>
                (pf.name, schema.fieldById(pf.sourceId).get.fieldType)
            }.filter { case (_, t) => groupable(t) }
          }
          if (resolved.contains(None)) None else Some(resolved.map(_.get))
        }

      keys.flatMap { ks =>
        val files = entries.map(_.dataFile)
        // every file must carry every grouping field in its tuple
        val grouped: Option[Map[Seq[Any], Seq[graft.table.ManifestModel.DataFile]]] =
          if (ks.isEmpty) Some(Map(Seq.empty[Any] -> files))
          else {
            val keyed = files.map { f =>
              val tuple = f.partition.toMap
              val gv = ks.map { case (k, _) =>
                if (tuple.contains(k)) Some(tuple(k)) else None
              }
              if (gv.contains(None)) None else Some(gv.map(_.get) -> f)
            }
            if (keyed.contains(None)) None
            else Some(keyed.flatten.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
          }

        grouped.flatMap { groups =>
          val rows = groups.toSeq.map { case (gv, gfiles) =>
            val totalRows = gfiles.map(_.recordCount).sum
            val answers: Seq[Option[Any]] = specs.map {
              case CountStar => Some(totalRows: java.lang.Long)

              case GroupVal(name) =>
                val i = groupCols.indexOf(name)
                if (i < 0) None else Some(groupInternal(ks(i)._2, gv(i)))

              case CountCol(name) =>
                schema.fieldByName(name).flatMap { f =>
                  val nulls = gfiles.map(_.nullValueCounts.get(f.id))
                  if (nulls.exists(_.isEmpty)) None
                  else Some((totalRows - nulls.flatten.sum): java.lang.Long)
                }

              case MinCol(name) => bound(schema, gfiles, name, isMin = true)
              case MaxCol(name) => bound(schema, gfiles, name, isMin = false)
            }
            if (answers.contains(None)) None
            else Some(answers.map(_.get match {
              case BoundValue(t, v) => toInternal(t, v)
              case NullBound => null
              case other => other
            }))
          }
          if (rows.contains(None)) None else Some(rows.map(_.get))
        }
      }
    }
  }.toOption.flatten

  /** Types a partition tuple value can serve as a GROUP key: the Avro
    * round-trip is unambiguous (decimal/binary come back as raw bytes). */
  private def groupable(t: IceType): Boolean = t match {
    case IceType.BooleanT | IceType.IntT | IceType.LongT | IceType.StringT |
         IceType.DateT | IceType.TimeT | IceType.TimestampT | IceType.TimestamptzT => true
    case _ => false
  }

  /** Partition tuple value → catalyst-internal group value. */
  private def groupInternal(t: IceType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (IceType.StringT, s) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s.toString)
    case _ => v // Int/Long/Boolean families are already internal
  }

  // wrappers distinguishing "answerable, value v" / "answerable, SQL NULL"
  private final case class BoundValue(t: IceType, v: Any)
  private case object NullBound

  /** Per-column min/max from file bounds: None = not answerable; Some of a
    * wrapper = answerable (possibly a SQL NULL for an all-null / empty
    * table). An all-null file (null_count == record_count) and an empty
    * file contribute nothing; any other file without a decodable bound
    * bails.
    */
  private def bound(schema: graft.spec.IceSchema,
                    files: Seq[graft.table.ManifestModel.DataFile],
                    name: String, isMin: Boolean): Option[Any] =
    schema.fieldByName(name).filter(f => boundExact(f.fieldType)).flatMap { f =>
      val per: Seq[Option[Option[Any]]] = files.map { df =>
        (if (isMin) df.lowerBounds else df.upperBounds).get(f.id) match {
          case Some(bytes) =>
            Try(ValueCodec.fromBytes(f.fieldType, bytes)).toOption.map(Some(_))
          case None =>
            val allNull = df.recordCount == 0L ||
              df.nullValueCounts.get(f.id).contains(df.recordCount)
            if (allNull) Some(None) else None
        }
      }
      if (per.exists(_.isEmpty)) None
      else {
        val vals = per.flatten.flatten
        if (vals.isEmpty) Some(NullBound)
        else Some(BoundValue(f.fieldType, vals.reduce { (a, b) =>
          if ((cmp(a, b) <= 0) == isMin) a else b
        }))
      }
    }
}
