package graft.spark

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions._

import graft.core.{Pruning, ValueCodec}
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
  /** A constant output column (e.g. a label literal next to a count) —
    * carried through verbatim; `v` is already catalyst-internal. */
  final case class LitVal(v: Any) extends AggSpec

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

  /** [[answerGrouped]] without a residual predicate. */
  def answerGrouped(table: IceTable, snapshotId: Option[Long],
                    groupCols: Seq[String],
                    specs: Seq[AggSpec]): Option[Seq[Seq[Any]]] =
    answerGrouped(table, snapshotId, groupCols, specs, None)

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
    *
    * `filter` (the filter-aware form — the `WHERE lang = 'en'` dashboard
    * shape): a residual predicate whose columns are identity partition
    * sources — or, for `IS [NOT] NULL` residuals only, ANY schema column
    * whose per-file null count proves the test file-wide (0 nulls or all
    * nulls; a mixed file bails). Identity partitioning makes every row of
    * a file carry the file's own tuple value, so the predicate is CONSTANT
    * per file — it either keeps every row or none, and selecting whole
    * files is EXACT, not pruning. Evaluated with SQL three-valued logic
    * ([[evalExact]]); any node/column/type the evaluator can't decide
    * exactly bails the whole rewrite to a real scan. Excluded files drop
    * out before grouping, so filtered groups disappear exactly as SQL's do.
    */
  def answerGrouped(table: IceTable, snapshotId: Option[Long],
                    groupCols: Seq[String],
                    specs: Seq[AggSpec],
                    filter: Option[Expression]): Option[Seq[Seq[Any]]] = Try {
    val snap = snapshotId.flatMap(table.snapshotById)
      .orElse(table.currentSnapshot(None))
    val schema =
      if (snapshotId.isDefined) table.metadata.schemaAt(snap)
      else table.metadata.currentSchema
    val entries = snap.map(table.entries(_)).getOrElse(Nil)
    if (entries.exists(_.dataFile.content != ContentData)) None
    else {
      // column name -> (partition tuple key, iceberg type); a grouping or
      // filter col must be an identity field of the DEFAULT spec with a
      // groupable type, else bail.
      //
      // A tuple field NAME only identifies a meaning when every spec in
      // history that defines it agrees on (source column, transform) —
      // the rewriteDeletes rule: a re-used name (column dropped,
      // re-added, re-partitioned under the same field name) would
      // attribute OLD files' stats to the new column's values where SQL
      // puts those rows in the NULL group. Entries don't carry their
      // origin spec id, so ambiguity means bail, never guess.
      val spec = table.metadata.partitionSpecs.get(table.metadata.defaultSpecId)
      lazy val defCount: Map[String, Int] = table.metadata.partitionSpecs.values
        .flatMap(_.fields.map(pf => pf.name -> ((pf.sourceId, pf.transform))))
        .toSeq.distinct.groupBy(_._1).map { case (n, ds) => n -> ds.size }
      def resolveIdentity(g: String): Option[(String, IceType)] =
        spec.flatMap { sp =>
          sp.fields.collectFirst {
            case pf if pf.transform == graft.core.Transform.Identity &&
              schema.fieldById(pf.sourceId).exists(_.name == g) &&
              defCount.getOrElse(pf.name, 1) == 1 =>
              (pf.name, schema.fieldById(pf.sourceId).get.fieldType)
          }.filter { case (_, t) => groupable(t) }
        }
      // bucket[n] partition fields give a PARTIAL per-file fact: every row
      // of the file hashes its source column to the file's tuple value, so
      // bucket(lit) ≠ tuple proves x ≠ lit for EVERY row (exact False /
      // NOT-True), and a NULL tuple proves x IS NULL file-wide — but a
      // bucket MATCH proves nothing (other values share the bucket), so
      // equality can never decide True and ranges never decide at all
      // (VERDICT r17 #8: exclusion only; the aggregate still bails to a
      // scan whenever any file stays undecided)
      def resolveBucket(g: String): Option[(String, Int, IceType)] =
        spec.flatMap { sp =>
          sp.fields.collectFirst {
            case pf if pf.transform.isInstanceOf[graft.core.Transform.Bucket] &&
              schema.fieldById(pf.sourceId).exists(_.name == g) &&
              defCount.getOrElse(pf.name, 1) == 1 =>
              (pf.name, pf.transform.asInstanceOf[graft.core.Transform.Bucket].n,
                schema.fieldById(pf.sourceId).get.fieldType)
          }
        }
      val keys: Option[Seq[(String, graft.spec.IceType)]] = {
        val resolved = groupCols.map(resolveIdentity)
        if (resolved.contains(None)) None else Some(resolved.map(_.get))
      }

      // exact per-file predicate: keep iff the tuple evaluates True; False
      // or NULL excludes the whole file (WHERE drops NULLs); any
      // undecidable column/node/type bails the rewrite. Columns that are
      // NOT identity partition sources can still serve `IS [NOT] NULL`
      // residuals through per-file null counts: null_count = 0 proves the
      // predicate for EVERY row of the file, null_count = record_count
      // refutes it for every row — whole-file selection stays EXACT; a
      // mixed or unrecorded count leaves the column undecidable and bails
      // (VERDICT r17 #5).
      def filterFiles(allFiles: Seq[graft.table.ManifestModel.DataFile])
          : Option[Seq[graft.table.ManifestModel.DataFile]] = filter match {
        case None => Some(allFiles)
        case Some(cond) =>
          val refNames = cond.references.map(_.name).toSeq.distinct
          val resolved = refNames.flatMap(n => resolveIdentity(n).map(n -> _)).toMap
          // a column that is not identity-partitioned may still be
          // bucket-partitioned (partial facts) …
          val bucketResolved: Map[String, (String, Int, IceType)] = refNames
            .filterNot(resolved.contains)
            .flatMap(n => resolveBucket(n).map(n -> _)).toMap
          // … and any other reference resolves to a schema field id for the
          // null-count fact path; an unresolvable column bails outright
          val nullFactFields: Map[String, Int] = refNames
            .filterNot(n => resolved.contains(n) || bucketResolved.contains(n))
            .flatMap(n => schema.fieldByName(n).map(f => n -> f.id)).toMap
          if (resolved.size + bucketResolved.size + nullFactFields.size
              != refNames.size) None
          else {
            val types = resolved.map { case (n, (_, t)) => n -> t }
            val kept = allFiles.map { f =>
              val tuple = f.partition.toMap
              if (resolved.values.exists { case (k, _) => !tuple.contains(k) } ||
                  bucketResolved.values.exists { case (k, _, _) => !tuple.contains(k) })
                None
              else {
                val vals = resolved.map { case (n, (k, t)) =>
                  n -> canonTuple(t, tuple(k))
                }
                val bucketFacts: Map[String, (Any, Int, IceType)] =
                  bucketResolved.map { case (n, (k, nb, t)) => n -> ((tuple(k), nb, t)) }
                // column → all rows NULL? (an empty file is vacuously
                // decidable either way; true keeps IS NULL exact)
                val nullFacts: Map[String, Boolean] = nullFactFields.flatMap {
                  case (n, id) =>
                    if (f.recordCount == 0L) Some(n -> true)
                    else f.nullValueCounts.get(id) match {
                      case Some(0L) => Some(n -> false)
                      case Some(c) if c == f.recordCount => Some(n -> true)
                      case _ => None // mixed or unrecorded: undecidable
                    }
                }
                evalExact(cond, vals, types, nullFacts, bucketFacts)
                  .map(tri => f -> (tri == Pruning.True))
                  // exact Tri undecidable, but the file may still be
                  // provably NEVER-True (e.g. False ∧ undecidable on one
                  // branch while another file's branch stays open) —
                  // exclusion is then exact even without the full value
                  .orElse(
                    if (neverTrue(cond, vals, types, nullFacts, bucketFacts))
                      Some(f -> false)
                    else None)
              }
            }
            if (kept.contains(None)) None
            else Some(kept.flatten.filter(_._2).map(_._1))
          }
      }

      keys.flatMap { ks =>
        filterFiles(entries.map(_.dataFile)).flatMap { files =>
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

              case LitVal(v) => Some(v)
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
      }}
    }
  }.toOption.flatten

  /** Partition tuple value → the canonical JVM form [[cmpExact]] compares
    * (Avro Utf8 strings normalize to java.lang.String; the Int/Long/Boolean
    * families are already canonical). */
  private def canonTuple(t: IceType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (IceType.StringT, s) => s.toString
    case _ => v
  }

  /** Exact total-order compare for filter evaluation. Strings compare by
    * unsigned UTF-8 bytes — Spark's UTF8_BINARY order — NOT Java's UTF-16
    * `compareTo`, which disagrees for supplementary characters vs
    * [U+E000, U+FFFF]; DuckDB's memcmp agrees with the byte order too.
    * None bails the rewrite (never guesses across type families). */
  private def cmpExact(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Int, y: Int) => Some(java.lang.Integer.compare(x, y))
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: String, y: String) => Some(java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case _ => None
  }

  /** EXACT three-valued evaluation of a residual predicate against one
    * file's identity partition tuple (`vals`: column → tuple value, null
    * allowed) plus per-file null facts (`nullFacts`: column → all rows
    * NULL?) for `IS [NOT] NULL` on non-partition columns, plus PARTIAL
    * bucket facts (`bucketFacts`: column → (bucket tuple value, n, source
    * type)) that decide equality NEGATIVELY only — bucket(lit) ≠ tuple
    * proves x ≠ lit for every row; a match proves nothing and a range
    * never decides (VERDICT r17 #8) — and nullness exactly (bucket(x) is
    * NULL iff x is). Returns None when
    * any node, column, literal, or type cannot be decided exactly — the
    * caller then scans instead. This is NOT the conservative interval logic
    * of [[graft.core.Pruning]]: a True here asserts EVERY row of the file
    * satisfies the predicate, False/Unknown assert NO row does (identity
    * transform ⇒ the predicate is constant per file; a 0-or-all null count
    * makes the null test equally file-constant), so whole-file selection
    * preserves SQL semantics exactly.
    */
  private def evalExact(e: Expression, vals: Map[String, Any],
                        types: Map[String, IceType],
                        nullFacts: Map[String, Boolean] = Map.empty,
                        bucketFacts: Map[String, (Any, Int, IceType)] = Map.empty)
      : Option[Pruning.Tri] = {
    import Pruning.{False, Tri, True, Unknown}
    def lift(b: Boolean): Tri = if (b) True else False
    def rec(x: Expression): Option[Tri] =
      evalExact(x, vals, types, nullFacts, bucketFacts)
    // all-rows-NULL fact for a non-tuple column (None = mixed/unknown: bail)
    def nullFactOf(x: Expression): Option[Boolean] = x match {
      case a: AttributeReference => nullFacts.get(a.name)
      case _ => None
    }
    def attr(x: Expression): Option[String] = x match {
      case a: AttributeReference if vals.contains(a.name) => Some(a.name)
      case _ => None
    }
    def battr(x: Expression): Option[String] = x match {
      case a: AttributeReference if bucketFacts.contains(a.name) => Some(a.name)
      case _ => None
    }
    def litOf(x: Expression): Option[Any] = x match {
      case Literal(v, _) => Some(v) // Some(null) is a NULL literal
      case _ => None
    }
    // bucket-partial equality fact: Some(Some(matches?)) when the literal's
    // bucket is computable, Some(None) for a NULL side (SQL NULL compare),
    // None = bail (uncanonical literal / non-int tuple)
    def bucketEq(name: String, rawLit: Any): Option[Option[Boolean]] = {
      val (tupleV, nb, t) = bucketFacts(name)
      if (rawLit == null || tupleV == null) Some(None)
      else Pruning.canonLit(rawLit, t).flatMap { lv =>
        val b = try Some(graft.core.Transform.Bucket(nb)(lv))
                catch { case _: Exception => None }
        b.flatMap {
          case bv: Int => tupleV match {
            case ti: Int => Some(Some(ti == bv))
            case _ => None
          }
          case _ => None
        }
      }
    }
    def bucketPair(l: Expression, r: Expression): Option[(String, Any)] =
      (battr(l), litOf(r)) match {
        case (Some(n), Some(v)) => Some((n, v))
        case _ => (battr(r), litOf(l)) match {
          case (Some(n), Some(v)) => Some((n, v))
          case _ => None
        }
      }
    // x IN (...) through the bucket fact: decidable only when NO element's
    // bucket matches (False, or Unknown with a NULL element); any possible
    // match is undecidable
    def bucketIn(name: String, rawVals: Seq[Any]): Option[Tri] = {
      val tupleV = bucketFacts(name)._1
      if (rawVals.isEmpty) Some(False)
      else if (tupleV == null) Some(Unknown) // all rows NULL: NULL IN (…)
      else {
        val hasNull = rawVals.contains(null)
        val eqs = rawVals.filterNot(_ == null).map(v => bucketEq(name, v))
        if (eqs.exists(_.isEmpty)) None
        else if (eqs.exists(_ == Some(Some(true)))) None
        else if (hasNull) Some(Unknown)
        else Some(False)
      }
    }
    // attr OP lit in either orientation; flipped = the literal was on the left
    def cmpPair(l: Expression, r: Expression): Option[(String, Any, Boolean)] =
      (attr(l), litOf(r)) match {
        case (Some(n), Some(v)) => Some((n, v, false))
        case _ => (attr(r), litOf(l)) match {
          case (Some(n), Some(v)) => Some((n, v, true))
          case _ => None
        }
      }
    // Some(None) = SQL NULL comparison; Some(Some(c)) = decided; None = bail
    def compare(name: String, rawLit: Any): Option[Option[Int]] = {
      val fv = vals(name)
      if (rawLit == null || fv == null) Some(None)
      else Pruning.canonLit(rawLit, types(name))
        .flatMap(lv => cmpExact(fv, lv)).map(Some(_))
    }
    def cmp3(l: Expression, r: Expression)(decide: (Int, Boolean) => Tri): Option[Tri] =
      cmpPair(l, r).flatMap { case (n, v, flipped) =>
        compare(n, v).map {
          case None => Unknown
          case Some(c) => decide(c, flipped)
        }
      }
    e match {
      // Kleene with a decidability short-circuit: False AND anything is
      // False for EVERY row of the file even when the other side is
      // undecidable (likewise True OR) — so a file excluded by its
      // identity tuple doesn't bail the rewrite over a mixed null count
      case And(l, r) => (rec(l), rec(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (Some(False), _) | (_, Some(False)) => Some(False)
        case _ => None
      }
      case Or(l, r) => (rec(l), rec(r)) match {
        case (Some(a), Some(b)) => Some(a || b)
        case (Some(True), _) | (_, Some(True)) => Some(True)
        case _ => None
      }
      case Not(i) => rec(i).map(_.not)
      case Literal(null, t) if t == org.apache.spark.sql.types.BooleanType =>
        Some(Unknown)
      case Literal(b: Boolean, _) => Some(lift(b))

      case EqualTo(l, r) => cmp3(l, r)((c, _) => lift(c == 0)).orElse(
        bucketPair(l, r).flatMap { case (n, v) =>
          bucketEq(n, v) match {
            case Some(None) => Some(Unknown)        // NULL side, or all-NULL file
            case Some(Some(false)) => Some(False)   // bucket mismatch: no row equals
            case _ => None                          // bucket match proves nothing
          }
        })
      case EqualNullSafe(l, r) => cmpPair(l, r).flatMap { case (n, v, _) =>
        val fv = vals(n)
        if (v == null || fv == null) Some(lift(v == null && fv == null))
        else Pruning.canonLit(v, types(n))
          .flatMap(lv => cmpExact(fv, lv)).map(c => lift(c == 0))
      }.orElse(bucketPair(l, r).flatMap { case (n, v) =>
        val tupleV = bucketFacts(n)._1
        if (v == null) Some(lift(tupleV == null)) // x <=> NULL ⟺ all rows NULL
        else if (tupleV == null) Some(False)      // all rows NULL vs non-null lit
        else bucketEq(n, v) match {
          case Some(Some(false)) => Some(False)
          case _ => None
        }
      })
      case LessThan(l, r) => cmp3(l, r)((c, f) => lift(if (f) c > 0 else c < 0))
      case LessThanOrEqual(l, r) => cmp3(l, r)((c, f) => lift(if (f) c >= 0 else c <= 0))
      case GreaterThan(l, r) => cmp3(l, r)((c, f) => lift(if (f) c < 0 else c > 0))
      case GreaterThanOrEqual(l, r) => cmp3(l, r)((c, f) => lift(if (f) c <= 0 else c >= 0))

      case In(a, list) => attr(a).flatMap { n =>
        val lits = list.map(litOf)
        if (lits.contains(None)) None
        else inSemantics(n, lits.map(_.get), vals, types)
      }.orElse(battr(a).flatMap { n =>
        val lits = list.map(litOf)
        if (lits.contains(None)) None else bucketIn(n, lits.map(_.get))
      })
      case InSet(a, hset) => attr(a).flatMap(n => inSemantics(n, hset.toSeq, vals, types))
        .orElse(battr(a).flatMap(n => bucketIn(n, hset.toSeq)))

      // the bucket tuple decides nullness EXACTLY: bucket(x) is NULL iff x
      // is, and every row of the file shares the tuple value
      case IsNull(a) => attr(a).map(n => lift(vals(n) == null))
        .orElse(battr(a).map(n => lift(bucketFacts(n)._1 == null)))
        .orElse(nullFactOf(a).map(allNull => lift(allNull)))
      case IsNotNull(a) => attr(a).map(n => lift(vals(n) != null))
        .orElse(battr(a).map(n => lift(bucketFacts(n)._1 != null)))
        .orElse(nullFactOf(a).map(allNull => lift(!allNull)))
      case _ => None
    }
  }

  /** Sound-but-incomplete proof that NO row of the file satisfies `e` —
    * the whole-file EXCLUSION test. Unlike [[evalExact]] it tolerates
    * sub-expressions whose exact Tri is undecidable, because a conjunction
    * is never-True as soon as ONE side is never-True (a row passes a WHERE
    * only on True; False and Unknown both exclude). Polarity-safe: `Not`
    * does not recurse here (never-True of `NOT x` needs x True for every
    * row, which only [[evalExact]] can assert) — collapsing a mixed
    * False/Unknown file to one Tri under a negation would flip rows. */
  private def neverTrue(e: Expression, vals: Map[String, Any],
                        types: Map[String, IceType],
                        nullFacts: Map[String, Boolean],
                        bucketFacts: Map[String, (Any, Int, IceType)]): Boolean = {
    def nt(x: Expression): Boolean = neverTrue(x, vals, types, nullFacts, bucketFacts)
    def exact(x: Expression): Option[Pruning.Tri] =
      evalExact(x, vals, types, nullFacts, bucketFacts)
    e match {
      case And(l, r) => nt(l) || nt(r)
      case Or(l, r) => nt(l) && nt(r)
      case Not(x) => exact(x).contains(Pruning.True)
      case other => exact(other).exists(_ != Pruning.True)
    }
  }

  /** SQL `x IN (…)`: TRUE on any match, else NULL if x or any element is
    * NULL, else FALSE (empty list → FALSE). */
  private def inSemantics(name: String, rawVals: Seq[Any],
                          vals: Map[String, Any],
                          types: Map[String, IceType]): Option[Pruning.Tri] = {
    import Pruning.{False, True, Unknown}
    val fv = vals(name)
    if (rawVals.isEmpty) Some(False)
    else if (fv == null) Some(Unknown)
    else {
      val hasNull = rawVals.contains(null)
      val nonNull = rawVals.filterNot(_ == null)
      val cmps = nonNull.map(v =>
        Pruning.canonLit(v, types(name)).flatMap(lv => cmpExact(fv, lv)))
      if (cmps.contains(None)) None
      else if (cmps.flatten.contains(0)) Some(True)
      else if (hasNull) Some(Unknown)
      else Some(False)
    }
  }

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
