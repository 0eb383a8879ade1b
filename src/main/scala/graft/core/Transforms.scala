package graft.core

import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec.IceType

/** Murmur3 x86 32-bit, seed 0 — the bucket-transform hash
  * (reference: iceberg-rust-spec/src/spec/values.rs:360-364 uses
  * murmur3::murmur3_32 with seed 0; NOT Spark's hash(), which seeds 42
  * and uses Spark's own value encoding).
  */
object Murmur3 {
  def hash32(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35; h1 ^= h1 >>> 16
    h1
  }
}

/** Single-value binary encoding (values.rs:102-127): LE for numerics and
  * temporal types, UTF-8 for strings, BE two's-complement unscaled for
  * decimals, raw bytes for fixed/binary. Used by the bucket transform and
  * by manifest lower/upper bounds.
  */
object ValueCodec {
  import java.nio.{ByteBuffer, ByteOrder}

  private def le(n: Int, f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
  }

  /** Canonical JVM repr per type: Boolean; Int (date = epoch days);
    * Long (time/timestamp = µs); Float; Double; BigDecimal; String;
    * Array[Byte].
    */
  def toBytes(v: Any): Array[Byte] = v match {
    case b: Boolean => Array[Byte](if (b) 1 else 0)
    case i: Int => le(4, _.putInt(i))
    case l: Long => le(8, _.putLong(l))
    case f: Float => le(4, _.putFloat(f))
    case d: Double => le(8, _.putDouble(d))
    case s: String => s.getBytes(StandardCharsets.UTF_8)
    case d: java.math.BigDecimal => d.unscaledValue().toByteArray  // BE two's complement
    case d: BigDecimal => d.underlying().unscaledValue().toByteArray
    case a: Array[Byte] => a
    case other => throw new IllegalArgumentException(s"no single-value encoding for $other")
  }

  def fromBytes(t: IceType, bytes: Array[Byte]): Any = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case IceType.BooleanT => bytes.nonEmpty && bytes(0) != 0
      case IceType.IntT | IceType.DateT => b.getInt
      case IceType.LongT | IceType.TimeT | IceType.TimestampT | IceType.TimestamptzT => b.getLong
      case IceType.FloatT => b.getFloat
      case IceType.DoubleT => b.getDouble
      case IceType.StringT | IceType.UuidT => new String(bytes, StandardCharsets.UTF_8)
      case IceType.DecimalT(_, s) => new java.math.BigDecimal(new java.math.BigInteger(bytes), s)
      case IceType.FixedT(_) | IceType.BinaryT => bytes
      case other => throw new IllegalArgumentException(s"no single-value decoding for $other")
    }
  }
}

/** Partition transforms (reference: values.rs:357-428 row-level,
  * iceberg-rust/src/arrow/transform.rs:44-104 vectorized;
  * serde partition.rs:55-126). Result type of the temporal transforms is
  * Int (types.rs:445-459); month counts Jan-1970 as 1, replicating the
  * reference's datetime_to_months formula (transform.rs:48-56).
  */
sealed trait Transform {
  import Transform._

  /** Wire name (partition.rs:55-126). */
  def name: String = this match {
    case Identity => "identity"
    case Void => "void"
    case Year => "year"
    case Month => "month"
    case Day => "day"
    case Hour => "hour"
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
  }

  /** Result type given a source type (types.rs:445-459). */
  def resultType(source: IceType): IceType = this match {
    case Identity => source
    case Void => source
    case Bucket(_) => IceType.IntT
    case Truncate(_) => source
    case Year | Month | Day | Hour => IceType.IntT
  }

  /** Row-level transform over canonical JVM values (values.rs:357-428). */
  def apply(v: Any): Any = if (v == null) null else this match {
    case Identity => v
    case Void => null
    case Bucket(n) =>
      // hash is u32 in the reference; `hash % n` is unsigned arithmetic
      Integer.remainderUnsigned(Murmur3.hash32(ValueCodec.toBytes(v)), n)
    case Truncate(w) => v match {
      case i: Int => i - Math.floorMod(i, w)
      case l: Long => l - Math.floorMod(l, w.toLong)
      case s: String => if (s.length <= w) s else s.substring(0, w)
      case other => throw new IllegalArgumentException(s"truncate unsupported for $other")
    }
    case Year => Year.ofValue(v)
    case Month => Month.ofValue(v)
    case Day => Day.ofValue(v)
    case Hour => v match {
      case micros: Long => Math.floorDiv(micros, 3600L * 1000000L).toInt
      case other => throw new IllegalArgumentException(s"hour unsupported for $other")
    }
  }

  /** Column-level transform — the Spark-native path used at write/prune time
    * (SURVEY.md §2.3 Spark mapping column). `sourceType` is the Spark type of
    * the input column.
    */
  def column(c: Column, sourceType: DataType): Column = this match {
    case Identity => c
    case Void => lit(null)
    case Year => year(c) - lit(1970)
    case Month => (year(c) - lit(1970)) * lit(12) + month(c)
    case Day => datediff(c.cast(DateType), to_date(lit("1970-01-01")))
    case Hour => floor(unix_micros(c.cast(TimestampType)) / lit(3600L * 1000000L)).cast(IntegerType)
    case Truncate(w) => sourceType match {
      case StringType => substring(c, 1, w)
      case _ => (c - pmod(c, lit(w))).cast(sourceType)
    }
    case Bucket(n) => bucketColumn(c, sourceType, n)
  }

  private def bucketColumn(c: Column, sourceType: DataType, n: Int): Column = {
    // native Catalyst expression (codegen) — murmur3(seed 0) over the
    // Iceberg single-value encoding; dates hash their int days, timestamps
    // their long µs, exactly as the reference row path does
    sourceType match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           StringType | BinaryType =>
        org.apache.spark.sql.GraftShim.column(
          graft.spark.expressions.IcebergBucket(org.apache.spark.sql.GraftShim.expression(c), n))
      case other => throw new IllegalArgumentException(s"bucket unsupported for $other")
    }
  }
}

object Transform {
  case object Identity extends Transform
  case object Void extends Transform
  case object Year extends Transform {
    def ofValue(v: Any): Int = v match {
      case days: Int => LocalDate.ofEpochDay(days.toLong).getYear - 1970
      case micros: Long => microsToDt(micros).getYear - 1970
      case other => throw new IllegalArgumentException(s"year unsupported for $other")
    }
  }
  case object Month extends Transform {
    def ofValue(v: Any): Int = v match {
      case days: Int =>
        val d = LocalDate.ofEpochDay(days.toLong); (d.getYear - 1970) * 12 + d.getMonthValue
      case micros: Long =>
        val d = microsToDt(micros); (d.getYear - 1970) * 12 + d.getMonthValue
      case other => throw new IllegalArgumentException(s"month unsupported for $other")
    }
  }
  case object Day extends Transform {
    def ofValue(v: Any): Int = v match {
      case days: Int => days
      case micros: Long => microsToDt(micros).toLocalDate.toEpochDay.toInt
      case other => throw new IllegalArgumentException(s"day unsupported for $other")
    }
  }
  case object Hour extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform

  private def microsToDt(micros: Long): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L), ZoneOffset.UTC)

  private val Bracket = """(\w+)\[(\d+)\]""".r
  private val Call = """(\w+)\((\d+)\)""".r

  /** Parses both `bucket[16]` (metadata JSON, partition.rs:55-126) and
    * `bucket(16)` (DDL call form, planner.rs:804-850).
    */
  def parse(s: String): Transform = s.trim.toLowerCase(java.util.Locale.ROOT) match {
    case "identity" => Identity
    case "void" => Void
    case "year" | "years" => Year
    case "month" | "months" => Month
    case "day" | "days" | "date" => Day
    case "hour" | "hours" => Hour
    case Bracket("bucket", n) => Bucket(n.toInt)
    case Bracket("truncate", w) => Truncate(w.toInt)
    case Call("bucket", n) => Bucket(n.toInt)
    case Call("truncate", w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }
}
