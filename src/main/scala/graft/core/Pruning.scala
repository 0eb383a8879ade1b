package graft.core

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

import graft.spec.IceType

/** Driver-side interval pruning over manifest/file statistics
  * (reference: datafusion_iceberg/src/pruning_statistics.rs — PruneManifests
  * :47-142, PruneDataFiles :144-234, partition-space predicate rewrite
  * `transform_predicate` :285-350).
  *
  * Spark has no PruningStatistics trait, so this is the ~150 LoC interval
  * evaluator SURVEY §4 calls for: tri-state logic where False means "no row
  * in this file/manifest can match" → prune. Catalyst still re-applies the
  * full filter on the surviving files (filters are Inexact, table.rs:253-261),
  * so pruning bugs can cost speed, never correctness.
  */
object Pruning {

  /** Per-column interval stats in canonical JVM values. */
  final case class ColStats(lower: Option[Any], upper: Option[Any],
                            nullCount: Option[Long], valueCount: Option[Long])

  sealed trait Tri { def &&(o: Tri): Tri; def ||(o: Tri): Tri; def not: Tri }
  case object True extends Tri {
    def &&(o: Tri): Tri = o; def ||(o: Tri): Tri = True; def not: Tri = False
  }
  case object False extends Tri {
    def &&(o: Tri): Tri = False; def ||(o: Tri): Tri = o; def not: Tri = True
  }
  case object Unknown extends Tri {
    def &&(o: Tri): Tri = if (o == False) False else Unknown
    def ||(o: Tri): Tri = if (o == True) True else Unknown
    def not: Tri = Unknown
  }

  /** True iff the predicate may match some row given the stats — the file
    * survives pruning.
    */
  def mayMatch(exprs: Seq[Expression], stats: String => Option[ColStats],
               typeOf: String => Option[IceType]): Boolean =
    exprs.forall(e => eval(e, stats, typeOf) != False)

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case Cast(inner, _, _, _) => attrName(inner)
    case _ => None
  }

  private def litValue(e: Expression): Option[Any] = e match {
    case Literal(v, _) => Some(v)
    case Cast(inner, _, _, _) => litValue(inner)
    case _ => None
  }

  /** Catalyst literal → canonical JVM value in the column's type domain. */
  def canonLit(v: Any, t: IceType): Option[Any] = {
    val raw = v match {
      case u: UTF8String => u.toString
      case x => x
    }
    (raw, t) match {
      case (null, _) => None
      case (s: String, IceType.DateT) => parseDate(s).map(_.toEpochDay.toInt)
      case (s: String, IceType.TimestampT | IceType.TimestamptzT) => parseMicros(s)
      case (s: String, IceType.StringT | IceType.UuidT) => Some(s)
      case (n: Number, IceType.IntT) => Some(n.intValue())
      case (n: Number, IceType.LongT | IceType.TimestampT | IceType.TimestamptzT | IceType.TimeT) =>
        Some(n.longValue())
      case (n: Number, IceType.FloatT) => Some(n.floatValue())
      case (n: Number, IceType.DoubleT) => Some(n.doubleValue())
      case (n: Number, IceType.DateT) => Some(n.intValue())
      case (d: java.math.BigDecimal, _) => Some(d)
      case (d: org.apache.spark.sql.types.Decimal, _) => Some(d.toJavaBigDecimal)
      case (b: Boolean, IceType.BooleanT) => Some(b)
      case (s: String, IceType.IntT) => s.toIntOption
      case (s: String, IceType.LongT) => s.toLongOption
      case (s: String, IceType.DoubleT) => s.toDoubleOption
      case _ => None
    }
  }

  private def parseDate(s: String): Option[LocalDate] =
    try Some(LocalDate.parse(s.take(10))) catch { case _: Exception => None }

  private def parseMicros(s: String): Option[Long] = {
    val dt =
      try Some(LocalDateTime.parse(s.replace(' ', 'T')))
      catch {
        case _: Exception => parseDate(s).map(_.atStartOfDay())
      }
    dt.map(d => d.toEpochSecond(ZoneOffset.UTC) * 1000000L + d.getNano / 1000L)
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Number, y: Number) => Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private def eval(e: Expression, stats: String => Option[ColStats],
                   typeOf: String => Option[IceType]): Tri = e match {
    case And(l, r) => eval(l, stats, typeOf) && eval(r, stats, typeOf)
    case Or(l, r) => eval(l, stats, typeOf) || eval(r, stats, typeOf)
    case Not(inner) => eval(inner, stats, typeOf).not
    case Literal(true, _) => True
    case Literal(false, _) => False

    case EqualTo(l, r) => comparison(l, r, stats, typeOf) {
      case (lo, hi, v) =>
        if (cmp(v, lo).exists(_ < 0) || cmp(v, hi).exists(_ > 0)) False else Unknown
    }
    case LessThan(l, r) => rangeCmp(l, r, stats, typeOf, ltStrict = true)
    case LessThanOrEqual(l, r) => rangeCmp(l, r, stats, typeOf, ltStrict = false)
    case GreaterThan(l, r) => rangeCmp(r, l, stats, typeOf, ltStrict = true)
    case GreaterThanOrEqual(l, r) => rangeCmp(r, l, stats, typeOf, ltStrict = false)

    case In(a, list) =>
      (attrName(a), typeOf(attrName(a).getOrElse(""))) match {
        case (Some(name), Some(t)) =>
          stats(name) match {
            case Some(cs) if cs.lower.isDefined && cs.upper.isDefined =>
              val anyMay = list.flatMap(litValue).flatMap(canonLit(_, t)).exists { v =>
                !(cmp(v, cs.lower.get).exists(_ < 0) || cmp(v, cs.upper.get).exists(_ > 0))
              }
              if (anyMay) Unknown else False
            case _ => Unknown
          }
        case _ => Unknown
      }

    case IsNull(a) =>
      attrName(a).flatMap(stats(_)) match {
        case Some(cs) if cs.nullCount.contains(0L) => False
        case _ => Unknown
      }
    case IsNotNull(a) =>
      attrName(a).flatMap(stats(_)) match {
        case Some(cs) if cs.nullCount.isDefined && cs.valueCount.isDefined &&
          cs.nullCount.get >= cs.valueCount.get && cs.valueCount.get > 0 => False
        case _ => Unknown
      }
    case _ => Unknown
  }

  /** attr-vs-literal in either orientation; `f(lower, upper, lit)`. */
  private def comparison(l: Expression, r: Expression, stats: String => Option[ColStats],
                         typeOf: String => Option[IceType])
                        (f: (Any, Any, Any) => Tri): Tri = {
    val pair = (attrName(l), litValue(r)) match {
      case (Some(n), Some(v)) => Some((n, v))
      case _ => (attrName(r), litValue(l)) match {
        case (Some(n), Some(v)) => Some((n, v))
        case _ => None
      }
    }
    pair match {
      case Some((name, rawLit)) =>
        (stats(name), typeOf(name)) match {
          case (Some(cs), Some(t)) if cs.lower.isDefined && cs.upper.isDefined =>
            canonLit(rawLit, t).map(v => f(cs.lower.get, cs.upper.get, v)).getOrElse(Unknown)
          case _ => Unknown
        }
      case None => Unknown
    }
  }

  /** Evaluates `left < lit` / `left <= lit` (after orientation flip). */
  private def rangeCmp(l: Expression, r: Expression, stats: String => Option[ColStats],
                       typeOf: String => Option[IceType], ltStrict: Boolean): Tri = {
    (attrName(l), litValue(r)) match {
      case (Some(name), Some(rawLit)) =>
        (stats(name), typeOf(name)) match {
          case (Some(cs), Some(t)) if cs.lower.isDefined =>
            canonLit(rawLit, t) match {
              case Some(v) =>
                val lo = cs.lower.get
                // attr < v prunes when lower >= v (strict) or lower > v
                val c = cmp(lo, v)
                if (c.exists(x => if (ltStrict) x >= 0 else x > 0)) False else Unknown
              case None => Unknown
            }
          case _ => Unknown
        }
      case _ =>
        // lit < attr  → prunes when upper <= lit / upper < lit
        (litValue(l), attrName(r)) match {
          case (Some(rawLit), Some(name)) =>
            (stats(name), typeOf(name)) match {
              case (Some(cs), Some(t)) if cs.upper.isDefined =>
                canonLit(rawLit, t) match {
                  case Some(v) =>
                    val c = cmp(cs.upper.get, v)
                    if (c.exists(x => if (ltStrict) x <= 0 else x < 0)) False else Unknown
                  case None => Unknown
                }
              case _ => Unknown
            }
          case _ => Unknown
        }
    }
  }

  /** Partition-space predicate rewrite (pruning_statistics.rs:285-350):
    * `c OP lit` where c is a partition source column becomes
    * `partitionField OP' transform(lit)`; monotonic transforms widen strict
    * comparisons to be conservative; bucket only supports equality.
    * Returns rewritten expressions evaluable against partition-field stats.
    */
  def transformPredicate(e: Expression,
                         partBySource: Map[String, (Transform, String, IceType)]): Expression = {
    def rw(x: Expression): Expression = x match {
      case And(l, r) => And(rw(l), rw(r))
      case Or(l, r) => Or(rw(l), rw(r))
      case cmp: BinaryComparison =>
        val direct = attrName(cmp.left).flatMap(n => partBySource.get(n))
          .map(p => (p, litValue(cmp.right), false))
        val flipped = attrName(cmp.right).flatMap(n => partBySource.get(n))
          .map(p => (p, litValue(cmp.left), true))
        direct.orElse(flipped) match {
          case Some(((transform, partName, srcType), Some(rawLit), isFlipped)) =>
            canonLit(rawLit, srcType).flatMap { v =>
              val tv = try Some(transform(v)) catch { case _: Exception => None }
              tv.map { transformed =>
                val attr = UnresolvedAttribute(partName)
                val litE = Literal(transformed match {
                  case s: String => UTF8String.fromString(s)
                  case o => o
                })
                transform match {
                  case Transform.Identity =>
                    if (isFlipped) cmp.withNewChildren(Seq(litE, attr))
                    else cmp.withNewChildren(Seq(attr, litE))
                  case Transform.Bucket(_) => cmp match {
                    case _: EqualTo => EqualTo(attr, litE)
                    case _ => Literal(true)
                  }
                  case _ => // monotonic: widen strict to inclusive
                    val (a, b) = if (isFlipped) (litE, attr) else (attr, litE)
                    cmp match {
                      case _: EqualTo => EqualTo(a, b)
                      case _: LessThan | _: LessThanOrEqual => LessThanOrEqual(a, b)
                      case _: GreaterThan | _: GreaterThanOrEqual => GreaterThanOrEqual(a, b)
                      case _ => Literal(true)
                    }
                }
              }
            }.getOrElse(Literal(true))
          case _ => Literal(true)
        }
      case _ => Literal(true)
    }
    rw(e)
  }
}
