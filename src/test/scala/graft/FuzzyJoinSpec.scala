package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FuzzyJoin

/** Brute-force parity gate for the PassJoin edit-distance join: the blocked
  * plan must return EXACTLY the naive all-pairs answer on adversarial
  * inputs — variable lengths (insertions/deletions, not just the
  * fixed-length substitutions the customer testdata exercises), repeated
  * boilerplate prefixes (hot segment keys), duplicates (distance 0), and
  * tiny strings at/below the edit budget (the pigeonhole partition's
  * degenerate case).
  */
class FuzzyJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("fuzzyjoin-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Classic unit-cost Levenshtein, the test's independent reference. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic corpus over a 3-letter alphabet, lengths 0..9, with a
    * shared boilerplate prefix on a third of the strings. */
  private def corpus(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = (mix(i * 7L + 1) >>> 1).toInt % 10
      val sb = new StringBuilder
      if (i % 3 == 0) sb.append("pre-")
      var j = 0
      while (j < len) {
        sb.append(('a' + ((mix(i * 131L + j) >>> 1) % 3).toInt).toChar)
        j += 1
      }
      (i.toLong, sb.toString)
    }

  private def bruteForce(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet

  private def blocked(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("blocked join equals brute force at k=1 and k=2 on a mixed-length corpus") {
    val rows = corpus(120)
    for (k <- Seq(1, 2)) {
      val expect = bruteForce(rows, k)
      val got = blocked(rows, k)
      assert(got == expect,
        s"k=$k: missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
      assert(expect.nonEmpty, s"k=$k test corpus produced no pairs — not a real gate")
    }
  }

  test("tiny strings (len <= k) pair with each other unconditionally") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "zz", 4L -> "qqqqqq", 5L -> "b")
    val got = blocked(rows, 2)
    val expect = bruteForce(rows, 2)
    assert(got == expect)
    // the degenerate trio ("", "a", "zz", "b") must all inter-match at k=2
    assert(got.contains((1L, 3L, 2L)) && got.contains((2L, 5L, 1L)))
  }

  test("exact duplicates surface with distance 0") {
    val rows = Seq(1L -> "same-string", 2L -> "same-string", 3L -> "same-strong")
    val got = blocked(rows, 2)
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }
}
