package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Murmur3, Transform, ValueCodec}
import graft.spec.IceType

/** Unit + property tests for the transform core (reference test surface:
  * values.rs transform tests ~:1355-1540, arrow/transform.rs:126-258).
  */
class TransformsSpec extends AnyFunSuite {
  private def forAll[T](gen: scala.util.Random => T)(f: T => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach(_ => f(gen(rnd)))
  }

  test("murmur3_32 seed-0 known vectors") {
    // public murmur3 reference vectors (seed 0)
    assert(Murmur3.hash32("".getBytes) == 0)
    assert(Murmur3.hash32("a".getBytes) == 0x3c2569b2)
    assert(Murmur3.hash32("abc".getBytes) == 0xb3dd93fa)
    assert(Murmur3.hash32("Hello, world!".getBytes) == 0xc0363e43)
  }

  test("bucket is unsigned mod of murmur3 over single-value encoding") {
    val b16 = Transform.Bucket(16)
    forAll(_.nextLong()) { l =>
      val h = Murmur3.hash32(ValueCodec.toBytes(l))
      assert(b16(l) == Integer.remainderUnsigned(h, 16))
    }
    // int hashes its 4-byte LE encoding (reference values.rs:112 quirk:
    // ints are NOT promoted to long before hashing)
    val h42int = Murmur3.hash32(ValueCodec.toBytes(42))
    val h42long = Murmur3.hash32(ValueCodec.toBytes(42L))
    assert(h42int != h42long)
    assert(Transform.Bucket(8)(42) == Integer.remainderUnsigned(h42int, 8))
  }

  test("temporal transforms: 2020-02-02 and epoch edges") {
    val d20200202 = java.time.LocalDate.parse("2020-02-02").toEpochDay.toInt
    assert(Transform.Year(d20200202) == 50)
    assert(Transform.Month(d20200202) == 50 * 12 + 2) // Jan 1970 → 1 (ref formula)
    assert(Transform.Day(d20200202) == d20200202)
    val micros = d20200202.toLong * 86400L * 1000000L + 3661L * 1000000L
    assert(Transform.Year(micros) == 50)
    assert(Transform.Month(micros) == 602)
    assert(Transform.Day(micros) == d20200202)
    assert(Transform.Hour(micros) == d20200202 * 24 + 1)
    // epoch
    assert(Transform.Year(0) == 0)
    assert(Transform.Month(0) == 1)
    assert(Transform.Day(0) == 0)
  }

  test("truncate: euclidean mod for ints, prefix for strings") {
    assert(Transform.Truncate(10)(7) == 0)
    assert(Transform.Truncate(10)(-7) == -10) // rem_euclid semantics
    assert(Transform.Truncate(10)(27L) == 20L)
    assert(Transform.Truncate(3)("iceberg") == "ice")
    assert(Transform.Truncate(10)("ice") == "ice")
    forAll(_.nextInt()) { i =>
      val t = Transform.Truncate(16)(i).asInstanceOf[Int]
      assert(t <= i && i - t < 16 && Math.floorMod(t, 16) == 0)
    }
  }

  test("transform parse round-trip (bracket + call forms)") {
    assert(Transform.parse("bucket[16]") == Transform.Bucket(16))
    assert(Transform.parse("bucket(16)") == Transform.Bucket(16))
    assert(Transform.parse("truncate[4]") == Transform.Truncate(4))
    assert(Transform.parse("months") == Transform.Month)
    Seq(Transform.Identity, Transform.Void, Transform.Year, Transform.Month,
      Transform.Day, Transform.Hour, Transform.Bucket(7), Transform.Truncate(3))
      .foreach(t => assert(Transform.parse(t.name) == t))
  }

  test("single-value codec round-trips") {
    assert(ValueCodec.fromBytes(IceType.IntT, ValueCodec.toBytes(42)) == 42)
    assert(ValueCodec.fromBytes(IceType.LongT, ValueCodec.toBytes(-7L)) == -7L)
    assert(ValueCodec.fromBytes(IceType.DoubleT, ValueCodec.toBytes(3.5)) == 3.5)
    assert(ValueCodec.fromBytes(IceType.StringT, ValueCodec.toBytes("héllo")) == "héllo")
    val dec = new java.math.BigDecimal("123.45")
    assert(ValueCodec.fromBytes(IceType.DecimalT(9, 2), ValueCodec.toBytes(dec)) == dec)
    forAll(_.nextLong()) { l =>
      assert(ValueCodec.fromBytes(IceType.LongT, ValueCodec.toBytes(l)) == l)
    }
  }
}
