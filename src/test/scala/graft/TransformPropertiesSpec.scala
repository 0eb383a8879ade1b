package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Transform, ValueCodec}
import graft.spec.IceType

/** Property-style tests for the partition-transform algebra (SURVEY §5
  * upgrade: the reference has none — these pin the invariants that make
  * pruning and partition routing correct at any scale). Seeded generation
  * keeps runs deterministic.
  */
class TransformPropertiesSpec extends AnyFunSuite {

  private def rng = new scala.util.Random(42)

  test("bucket stays in range and is deterministic for every input type") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val n = 1 + r.nextInt(512)
      val b = Transform.Bucket(n)
      val l = r.nextLong()
      val h = b(l).asInstanceOf[Int]
      assert(h >= 0 && h < n)
      assert(b(l) == h)
      val s = r.alphanumeric.take(r.nextInt(30)).mkString
      val hs = b(s).asInstanceOf[Int]
      assert(hs >= 0 && hs < n)
      val i = r.nextInt()
      val hi = b(i).asInstanceOf[Int]
      assert(hi >= 0 && hi < n)
    }
  }

  test("bucket distributes roughly uniformly over sequential keys") {
    val n = 16
    val counts = (0L until 4096L).groupBy(Transform.Bucket(n)(_)).view.mapValues(_.size)
    // all buckets populated, none more than 2× the ideal share (256)
    assert(counts.size == n)
    assert(counts.values.forall(c => c > 128 && c < 512))
  }

  test("truncate is idempotent, floors within width, and preserves order") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val w = 1 + r.nextInt(1000)
      val t = Transform.Truncate(w)
      val v = r.nextInt(2000001) - 1000000
      val once = t(v).asInstanceOf[Int]
      assert(t(once) == once)            // idempotent
      assert(once <= v && v - once < w)  // floor within width
      val v2 = r.nextInt(2000001) - 1000000
      val (lo, hi) = if (v <= v2) (v, v2) else (v2, v)
      assert(t(lo).asInstanceOf[Int] <= t(hi).asInstanceOf[Int]) // monotone
    }
  }

  test("truncate on strings is a prefix and idempotent") {
    val r = rng
    (1 to 1000).foreach { _ =>
      val w = 1 + r.nextInt(20)
      val t = Transform.Truncate(w)
      val s = r.alphanumeric.take(r.nextInt(40)).mkString
      val once = t(s).asInstanceOf[String]
      assert(s.startsWith(once) && once.length <= w)
      assert(t(once) == once)
    }
  }

  test("temporal transforms are monotone in their input") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val a = r.nextInt(200001) - 100000
      val b = r.nextInt(200001) - 100000
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(Transform.Year(lo).asInstanceOf[Int] <= Transform.Year(hi).asInstanceOf[Int])
      assert(Transform.Month(lo).asInstanceOf[Int] <= Transform.Month(hi).asInstanceOf[Int])
      assert(Transform.Day(lo).asInstanceOf[Int] <= Transform.Day(hi).asInstanceOf[Int])
    }
  }

  test("single-value codec round-trips ints/longs/strings") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val i = r.nextInt()
      assert(ValueCodec.fromBytes(IceType.IntT, ValueCodec.toBytes(i)) == i)
      val l = r.nextLong()
      assert(ValueCodec.fromBytes(IceType.LongT, ValueCodec.toBytes(l)) == l)
      val s = r.alphanumeric.take(r.nextInt(50)).mkString
      assert(ValueCodec.fromBytes(IceType.StringT, ValueCodec.toBytes(s)) == s)
    }
  }
}
