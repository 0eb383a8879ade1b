package graft.spec

import org.apache.spark.sql.types._

/** Iceberg-spec type system (reference: iceberg-rust-spec/src/spec/types.rs:34-459).
  *
  * Every field carries a table-unique integer id (types.rs:376-389); ids are
  * what make schema evolution and equality deletes well-defined. The Spark
  * mapping (SURVEY.md §1.3) carries ids in StructField metadata under
  * `parquet.field.id`, which Spark's parquet writer honors when
  * `spark.sql.parquet.fieldId.write.enabled` is set.
  */
sealed trait IceType {
  /** JSON wire form for primitives (types.rs:59-170); nested types override. */
  def jsonName: String = this match {
    case IceType.BooleanT        => "boolean"
    case IceType.IntT            => "int"
    case IceType.LongT           => "long"
    case IceType.FloatT          => "float"
    case IceType.DoubleT         => "double"
    case IceType.DecimalT(p, s)  => s"decimal($p,$s)"
    case IceType.DateT           => "date"
    case IceType.TimeT           => "time"
    case IceType.TimestampT      => "timestamp"
    case IceType.TimestamptzT    => "timestamptz"
    case IceType.StringT         => "string"
    case IceType.UuidT           => "uuid"
    case IceType.FixedT(n)       => s"fixed[$n]"
    case IceType.BinaryT         => "binary"
    case _ => throw new IllegalArgumentException(s"nested type has no primitive name: $this")
  }
  def isPrimitive: Boolean = this match {
    case _: IceType.StructT | _: IceType.ListT | _: IceType.MapT => false
    case _ => true
  }
}

object IceType {
  case object BooleanT extends IceType
  case object IntT extends IceType
  case object LongT extends IceType
  case object FloatT extends IceType
  case object DoubleT extends IceType
  final case class DecimalT(precision: Int, scale: Int) extends IceType
  case object DateT extends IceType
  case object TimeT extends IceType            // µs from midnight (no Spark TimeType → LongType)
  case object TimestampT extends IceType       // µs, no tz → TimestampNTZType
  case object TimestamptzT extends IceType     // µs, UTC-adjusted → TimestampType
  case object StringT extends IceType
  case object UuidT extends IceType            // read as string, like the reference (arrow/schema.rs:99)
  final case class FixedT(length: Int) extends IceType
  case object BinaryT extends IceType
  final case class StructT(fields: Seq[NestedField]) extends IceType {
    @transient lazy val byId: Map[Int, NestedField] = fields.map(f => f.id -> f).toMap
    @transient lazy val byName: Map[String, NestedField] = fields.map(f => f.name -> f).toMap
  }
  final case class ListT(elementId: Int, elementRequired: Boolean, element: IceType) extends IceType
  final case class MapT(keyId: Int, key: IceType, valueId: Int,
                        valueRequired: Boolean, value: IceType) extends IceType

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def fromPrimitiveName(s: String): IceType = s match {
    case "boolean" => BooleanT
    case "int" => IntT
    case "long" => LongT
    case "float" => FloatT
    case "double" => DoubleT
    case DecimalRe(p, sc) => DecimalT(p.toInt, sc.toInt)
    case "date" => DateT
    case "time" => TimeT
    case "timestamp" => TimestampT
    case "timestamptz" => TimestamptzT
    case "string" => StringT
    case "uuid" => UuidT
    case FixedRe(n) => FixedT(n.toInt)
    case "binary" => BinaryT
    case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
  }

  /** Iceberg → Spark (SURVEY.md §1.3). */
  def toSpark(t: IceType): DataType = t match {
    case BooleanT => BooleanType
    case IntT => IntegerType
    case LongT => LongType
    case FloatT => FloatType
    case DoubleT => DoubleType
    case DecimalT(p, s) => DecimalType(p, s)
    case DateT => DateType
    case TimeT => LongType
    case TimestampT => TimestampNTZType
    case TimestamptzT => TimestampType
    case StringT | UuidT => StringType
    case FixedT(_) | BinaryT => BinaryType
    case StructT(fields) => StructType(fields.map(sparkField))
    case ListT(_, req, el) => ArrayType(toSpark(el), containsNull = !req)
    case MapT(_, k, _, vreq, v) => MapType(toSpark(k), toSpark(v), valueContainsNull = !vreq)
  }

  private def sparkField(f: NestedField): StructField = {
    val md = new MetadataBuilder().putLong("parquet.field.id", f.id.toLong)
    f.doc.foreach(d => md.putString("comment", d))
    // Spark's default-column resolution keys: CURRENT_DEFAULT makes
    // `INSERT` statements that omit the column fill the write-default;
    // EXISTS_DEFAULT surfaces the initial-default in DESCRIBE output (the
    // scan applies it itself, per-file — see IceScan)
    f.writeDefault.foreach(v =>
      md.putString("CURRENT_DEFAULT", DefaultValues.toSqlLiteral(f.fieldType, v)))
    f.initialDefault.foreach(v =>
      md.putString("EXISTS_DEFAULT", DefaultValues.toSqlLiteral(f.fieldType, v)))
    StructField(f.name, toSpark(f.fieldType), nullable = !f.required, md.build())
  }

  /** Spark → Iceberg with depth-first id assignment starting at `nextId`
    * (mirrors new_fields_with_ids, arrow/schema.rs:189-241). Returns the
    * struct plus the next unused id.
    */
  def fromSparkAssignIds(st: StructType, nextId: Int = 1): (StructT, Int) = {
    var id = nextId
    def alloc(): Int = { val v = id; id += 1; v }
    def conv(dt: DataType): IceType = dt match {
      case BooleanType => BooleanT
      case IntegerType | ShortType | ByteType => IntT
      case LongType => LongT
      case FloatType => FloatT
      case DoubleType => DoubleT
      case d: DecimalType => DecimalT(d.precision, d.scale)
      case DateType => DateT
      case TimestampNTZType => TimestampT
      case TimestampType => TimestamptzT
      case StringType => StringT
      case BinaryType => BinaryT
      case s: StructType =>
        StructT(s.fields.toSeq.map { f =>
          val fid = alloc()
          NestedField(fid, f.name, required = !f.nullable, conv(f.dataType), None)
        })
      case ArrayType(el, containsNull) =>
        val eid = alloc(); ListT(eid, !containsNull, conv(el))
      case MapType(k, v, vNull) =>
        val kid = alloc(); val vid = alloc(); MapT(kid, conv(k), vid, !vNull, conv(v))
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    // allocate top-level field ids first, then nested (depth-first per field)
    val fields = st.fields.toSeq.map { f =>
      val fid = alloc()
      NestedField(fid, f.name, required = !f.nullable, conv(f.dataType), None)
    }
    (StructT(fields), id)
  }
}

/** types.rs:376-389, plus the Iceberg V3 default-value fields the reference
  * predates: `initialDefault` is the value rows written BEFORE the column
  * existed read back (immutable once set — it defines history), and
  * `writeDefault` fills the column when a writer omits it (mutable via
  * `ALTER COLUMN ... SET DEFAULT`). Canonical JVM values per type:
  * Boolean / Int / Long / Float / Double / String /
  * java.math.BigDecimal (decimal) / Int epoch-days (date) /
  * Long micros (timestamp[tz]). */
final case class NestedField(id: Int, name: String, required: Boolean,
                             fieldType: IceType, doc: Option[String] = None,
                             initialDefault: Option[Any] = None,
                             writeDefault: Option[Any] = None)

/** Schema = StructType + id + identifier fields (schema.rs:31-48). */
final case class IceSchema(schemaId: Int, fields: Seq[NestedField],
                           identifierFieldIds: Seq[Int] = Nil) {
  def struct: IceType.StructT = IceType.StructT(fields)
  def toSpark: StructType = IceType.toSpark(struct).asInstanceOf[StructType]
  /** Projection by field ids (schema.rs:91-108). */
  def project(ids: Seq[Int]): IceSchema =
    copy(fields = fields.filter(f => ids.contains(f.id)))
  def fieldById(id: Int): Option[NestedField] = struct.byId.get(id)
  def fieldByName(name: String): Option[NestedField] = struct.byName.get(name)
  def maxFieldId: Int = {
    def maxIn(t: IceType): Int = t match {
      case IceType.StructT(fs) => (fs.map(_.id) ++ fs.map(f => maxIn(f.fieldType))).foldLeft(0)(_ max _)
      case IceType.ListT(eid, _, el) => eid max maxIn(el)
      case IceType.MapT(kid, k, vid, _, v) => kid max vid max maxIn(k) max maxIn(v)
      case _ => 0
    }
    maxIn(struct)
  }
}

/** Conversions for Iceberg V3 column DEFAULT values: one canonical JVM
  * representation (see [[NestedField]]) with bridges to SQL literal text
  * (Spark's CURRENT_DEFAULT/EXISTS_DEFAULT metadata), Spark `Column`
  * literals (the scan's per-file fill), Catalyst literal values (DDL
  * plumbing), and the Iceberg spec's JSON single-value serialization
  * (`initial-default` / `write-default` in the schema JSON).
  *
  * Supported on top-level primitive columns; nested/complex defaults are
  * rejected loudly.
  */
object DefaultValues {
  import java.time.LocalDate
  import java.time.format.DateTimeFormatter

  private def unsupported(t: IceType): Nothing =
    throw new UnsupportedOperationException(s"DEFAULT values are unsupported for type ${t.jsonName}")

  /** Canonicalizes a Catalyst-internal literal value (UTF8String, Decimal,
    * Int days, Long micros) to the canonical JVM form for `t`. */
  def fromCatalyst(t: IceType, v: Any): Any = {
    require(v != null, "a DEFAULT literal cannot be NULL (omit the default instead)")
    t match {
      case IceType.BooleanT => v.asInstanceOf[Boolean]
      case IceType.IntT => v match { case i: Int => i; case s: Short => s.toInt; case b: Byte => b.toInt }
      case IceType.LongT => v match { case l: Long => l; case i: Int => i.toLong }
      case IceType.FloatT => v.asInstanceOf[Float]
      case IceType.DoubleT => v match { case d: Double => d; case f: Float => f.toDouble }
      case IceType.StringT => v.toString
      case IceType.DecimalT(_, s) =>
        val bd = v match {
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
        }
        bd.setScale(s)
      case IceType.DateT => v.asInstanceOf[Int] // days since epoch
      case IceType.TimestampT | IceType.TimestamptzT => v.asInstanceOf[Long] // micros
      case other => unsupported(other)
    }
  }

  /** SQL literal text (engine-parseable, round-trips through
    * CatalystSqlParser.parseExpression). */
  def toSqlLiteral(t: IceType, v: Any): String = t match {
    case IceType.BooleanT | IceType.IntT | IceType.LongT | IceType.FloatT |
         IceType.DoubleT => v.toString
    case IceType.DecimalT(_, _) => v.toString
    case IceType.StringT => "'" + v.toString.replace("'", "''") + "'"
    case IceType.DateT => s"DATE'${LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)}'"
    case IceType.TimestampT | IceType.TimestamptzT =>
      val micros = v.asInstanceOf[Long]
      val inst = java.time.Instant.EPOCH.plusSeconds(micros / 1000000L)
        .plusNanos((micros % 1000000L) * 1000L)
      s"TIMESTAMP'${java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)}'"
    case other => unsupported(other)
  }

  /** A typed Spark literal Column carrying the default. */
  def toColumn(t: IceType, v: Any): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    t match {
      case IceType.DateT => lit(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case IceType.TimestampT =>
        val micros = v.asInstanceOf[Long]
        lit(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
      case IceType.TimestamptzT =>
        val micros = v.asInstanceOf[Long]
        lit(java.time.Instant.EPOCH.plusSeconds(Math.floorDiv(micros, 1000000L))
          .plusNanos(Math.floorMod(micros, 1000000L) * 1000L))
      case IceType.DecimalT(p, s) =>
        lit(v.asInstanceOf[java.math.BigDecimal]).cast(DecimalType(p, s))
      case IceType.FloatT => lit(v.asInstanceOf[Float])
      case _ => lit(v)
    }
  }

  /** Iceberg JSON single-value serialization (spec: "initial-default" /
    * "write-default" schema fields). */
  def toJson(t: IceType, v: Any,
             nf: com.fasterxml.jackson.databind.node.JsonNodeFactory):
      com.fasterxml.jackson.databind.JsonNode = t match {
    case IceType.BooleanT => nf.booleanNode(v.asInstanceOf[Boolean])
    case IceType.IntT => nf.numberNode(v.asInstanceOf[Int])
    case IceType.LongT => nf.numberNode(v.asInstanceOf[Long])
    case IceType.FloatT => nf.numberNode(v.asInstanceOf[Float])
    case IceType.DoubleT => nf.numberNode(v.asInstanceOf[Double])
    case IceType.StringT => nf.textNode(v.toString)
    case IceType.DecimalT(_, _) => nf.textNode(v.toString)
    case IceType.DateT =>
      nf.textNode(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        .format(DateTimeFormatter.ISO_LOCAL_DATE))
    case IceType.TimestampT | IceType.TimestamptzT => nf.numberNode(v.asInstanceOf[Long])
    case other => unsupported(other)
  }

  def fromJson(t: IceType, n: com.fasterxml.jackson.databind.JsonNode): Any = t match {
    case IceType.BooleanT => n.asBoolean()
    case IceType.IntT => n.asInt()
    case IceType.LongT => n.asLong()
    case IceType.FloatT => n.asDouble().toFloat
    case IceType.DoubleT => n.asDouble()
    case IceType.StringT => n.asText()
    case IceType.DecimalT(_, s) => new java.math.BigDecimal(n.asText()).setScale(s)
    case IceType.DateT => LocalDate.parse(n.asText()).toEpochDay.toInt
    case IceType.TimestampT | IceType.TimestamptzT => n.asLong()
    case other => unsupported(other)
  }
}
