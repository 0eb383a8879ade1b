package graft.table

/** 64-bit roaring bitmap over row positions, with the PORTABLE serialization
  * layout published in the public RoaringFormatSpec
  * (github.com/RoaringBitmap/RoaringFormatSpec) — the encoding Iceberg V3
  * deletion vectors mandate for the `deletion-vector-v1` Puffin blob.
  *
  * Reference context: the reference engine PANICS on content=1 delete files
  * (iceberg-rust/src/table/mod.rs via table.rs:422-424) — position deletes,
  * and a fortiori deletion vectors, are beyond-reference surface. The format
  * here follows the public spec so the artifact is what a V3 reader expects:
  *
  *  - 64-bit "portable" layout: an 8-byte little-endian bucket count, then
  *    for each distinct high-32-bit key in ascending unsigned order: the
  *    4-byte little-endian key followed by a complete 32-bit roaring
  *    serialization of the low halves.
  *  - 32-bit layout (we always WRITE the no-run form): 4-byte LE cookie
  *    12346, 4-byte LE container count, the descriptive header (per
  *    container: 2-byte LE high-16 key, 2-byte LE cardinality-1), the
  *    offset header (4-byte LE byte offset of each container from the start
  *    of the 32-bit stream), then container payloads — an ARRAY container
  *    (cardinality ≤ 4096: sorted 2-byte LE values) or a BITMAP container
  *    (1024 little-endian longs). READING additionally accepts the run
  *    cookie 12347 (run containers: 2-byte LE run count, then per run a
  *    2-byte LE start and 2-byte LE length-1) so foreign-written vectors
  *    still load.
  *
  * Positions in a deletion vector are non-negative and unique, but the
  * implementation is correct for the full unsigned 64-bit domain (unsigned
  * key ordering throughout). Immutable: build via [[Bitmap64.fromSorted]],
  * combine via [[Bitmap64.union]].
  */
object Roaring {

  private val ArrayCutoff = 4096
  private val CookieNoRun = 12346
  private val CookieRun = 12347

  /** One 16-bit-keyed container of low-16 values. */
  private[table] sealed trait Container {
    def cardinality: Int
    def contains(low: Int): Boolean
    /** ascending low-16 values */
    def foreach(f: Int => Unit): Unit
    def payloadBytes: Int
  }

  /** Sorted unsigned 16-bit values (cardinality ≤ 4096 when written). */
  private[table] final class ArrayContainer(val values: Array[Char]) extends Container {
    def cardinality: Int = values.length
    def contains(low: Int): Boolean = {
      var lo = 0; var hi = values.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = values(mid).toInt
        if (v == low) return true
        if (v < low) lo = mid + 1 else hi = mid - 1
      }
      false
    }
    def foreach(f: Int => Unit): Unit = { var i = 0; while (i < values.length) { f(values(i).toInt); i += 1 } }
    def payloadBytes: Int = 2 * values.length
  }

  /** 65536-bit bitset (cardinality > 4096 when written). */
  private[table] final class BitmapContainer(val words: Array[Long], val cardinality: Int) extends Container {
    def contains(low: Int): Boolean = (words(low >>> 6) & (1L << (low & 63))) != 0L
    def foreach(f: Int => Unit): Unit = {
      var w = 0
      while (w < 1024) {
        var bits = words(w)
        while (bits != 0L) {
          val t = java.lang.Long.numberOfTrailingZeros(bits)
          f((w << 6) | t)
          bits &= bits - 1
        }
        w += 1
      }
    }
    def payloadBytes: Int = 8192
  }

  /** A 32-bit roaring bitmap: parallel arrays of ascending high-16 keys and
    * their containers (binary-searched — container counts are small). */
  private[table] final class Bitmap32(val keys: Array[Char], val containers: Array[Container]) {
    def contains(v: Int): Boolean = {
      val key = v >>> 16
      var lo = 0; var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid).toInt
        if (k == key) return containers(mid).contains(v & 0xFFFF)
        if (k < key) lo = mid + 1 else hi = mid - 1
      }
      false
    }
    def cardinality: Long = {
      var c = 0L; var i = 0
      while (i < containers.length) { c += containers(i).cardinality; i += 1 }
      c
    }
    /** ascending unsigned 32-bit values, boxed into the caller's long-space. */
    def foreach(f: Int => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        val high = keys(i).toInt << 16
        containers(i).foreach(low => f(high | low))
        i += 1
      }
    }
    def serializedBytes: Int = {
      var n = 4 + 4 + 8 * keys.length // cookie + count + desc header + offsets
      var i = 0
      while (i < containers.length) { n += containers(i).payloadBytes; i += 1 }
      n
    }
    /** Writes the no-run 32-bit layout. `buf` must be LITTLE_ENDIAN — every
      * put below then emits exactly the spec's little-endian fields. */
    def writeTo(buf: java.nio.ByteBuffer): Unit = {
      val start = buf.position()
      buf.putInt(CookieNoRun)
      buf.putInt(keys.length)
      var i = 0
      while (i < keys.length) {
        buf.putChar(keys(i))
        buf.putChar(((containers(i).cardinality - 1) & 0xFFFF).toChar)
        i += 1
      }
      // offset header: container payloads start right after it
      var off = 4 + 4 + 8 * keys.length
      i = 0
      while (i < keys.length) {
        buf.putInt(off)
        off += containers(i).payloadBytes
        i += 1
      }
      i = 0
      while (i < keys.length) {
        containers(i) match {
          case a: ArrayContainer =>
            var j = 0
            while (j < a.values.length) { buf.putChar(a.values(j)); j += 1 }
          case b: BitmapContainer =>
            var w = 0
            while (w < 1024) { buf.putLong(b.words(w)); w += 1 }
        }
        i += 1
      }
      require(buf.position() - start == serializedBytes, "roaring 32-bit size accounting broke")
    }
  }

  /** The 64-bit bitmap: ascending unsigned high-32 keys → 32-bit bitmaps. */
  final class Bitmap64 private[table] (private[table] val highKeys: Array[Int],
                                       private[table] val lows: Array[Bitmap32])
      extends Serializable {

    def contains(v: Long): Boolean = {
      val key = (v >>> 32).toInt
      var lo = 0; var hi = highKeys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = Integer.compareUnsigned(highKeys(mid), key)
        if (c == 0) return lows(mid).contains(v.toInt)
        if (c < 0) lo = mid + 1 else hi = mid - 1
      }
      false
    }

    def cardinality: Long = {
      var c = 0L; var i = 0
      while (i < lows.length) { c += lows(i).cardinality; i += 1 }
      c
    }

    def isEmpty: Boolean = highKeys.length == 0

    /** Ascending unsigned 64-bit traversal. */
    def foreach(f: Long => Unit): Unit = {
      var i = 0
      while (i < highKeys.length) {
        val high = highKeys(i).toLong << 32
        lows(i).foreach(low => f(high | (low.toLong & 0xFFFFFFFFL)))
        i += 1
      }
    }

    def toArray: Array[Long] = {
      val out = new Array[Long](math.toIntExact(cardinality))
      var i = 0
      foreach { v => out(i) = v; i += 1 }
      out
    }

    def union(other: Bitmap64): Bitmap64 = {
      if (other.isEmpty) return this
      if (isEmpty) return other
      val a = toArray; val b = other.toArray
      val merged = new Array[Long](a.length + b.length)
      var i = 0; var j = 0; var k = 0
      while (i < a.length && j < b.length) {
        val c = java.lang.Long.compareUnsigned(a(i), b(j))
        if (c < 0) { merged(k) = a(i); i += 1 }
        else if (c > 0) { merged(k) = b(j); j += 1 }
        else { merged(k) = a(i); i += 1; j += 1 }
        k += 1
      }
      while (i < a.length) { merged(k) = a(i); i += 1; k += 1 }
      while (j < b.length) { merged(k) = b(j); j += 1; k += 1 }
      Bitmap64.fromSorted(java.util.Arrays.copyOf(merged, k))
    }

    /** RoaringFormatSpec 64-bit portable serialization. */
    def serialize: Array[Byte] = {
      var size = 8
      var i = 0
      while (i < lows.length) { size += 4 + lows(i).serializedBytes; i += 1 }
      val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong(highKeys.length.toLong)
      i = 0
      while (i < highKeys.length) {
        buf.putInt(highKeys(i))
        lows(i).writeTo(buf)
        i += 1
      }
      require(!buf.hasRemaining, "roaring 64-bit size accounting broke")
      buf.array()
    }
  }

  object Bitmap64 {

    val empty: Bitmap64 = new Bitmap64(Array.empty, Array.empty)

    /** Builds from positions sorted ascending by UNSIGNED comparison
      * (non-negative longs — the deletion-vector case — are unsigned-sorted
      * by a plain sort). Duplicates collapse. */
    def fromSorted(xs: Array[Long]): Bitmap64 = {
      if (xs.isEmpty) return empty
      var i = 1
      while (i < xs.length) {
        require(java.lang.Long.compareUnsigned(xs(i - 1), xs(i)) <= 0,
          "fromSorted requires ascending unsigned input")
        i += 1
      }
      val highKeys = Array.newBuilder[Int]
      val lowMaps = Array.newBuilder[Bitmap32]
      var start = 0
      while (start < xs.length) {
        val high = (xs(start) >>> 32).toInt
        var end = start + 1
        while (end < xs.length && (xs(end) >>> 32).toInt == high) end += 1
        highKeys += high
        lowMaps += bitmap32FromSorted(xs, start, end)
        start = end
      }
      new Bitmap64(highKeys.result(), lowMaps.result())
    }

    /** Convenience builder for NON-NEGATIVE values (row positions), where a
      * plain signed sort is also the unsigned order. */
    def apply(xs: Iterable[Long]): Bitmap64 = {
      val arr = xs.toArray
      arr.foreach(v => require(v >= 0L, "Bitmap64.apply takes non-negative positions; use fromSorted"))
      java.util.Arrays.sort(arr)
      fromSorted(arr)
    }

    private def bitmap32FromSorted(xs: Array[Long], from: Int, until: Int): Bitmap32 = {
      val keys = Array.newBuilder[Char]
      val containers = Array.newBuilder[Container]
      var start = from
      while (start < until) {
        val key = ((xs(start).toInt >>> 16) & 0xFFFF)
        var end = start + 1
        while (end < until && ((xs(end).toInt >>> 16) & 0xFFFF) == key) end += 1
        // distinct low-16 values of the run
        val lowsB = new Array[Char](end - start)
        var n = 0
        var i = start
        var prev = -1
        while (i < end) {
          val low = xs(i).toInt & 0xFFFF
          if (low != prev) { lowsB(n) = low.toChar; n += 1; prev = low }
          i += 1
        }
        keys += key.toChar
        containers += (
          if (n <= ArrayCutoff) new ArrayContainer(java.util.Arrays.copyOf(lowsB, n))
          else {
            val words = new Array[Long](1024)
            var j = 0
            while (j < n) { val v = lowsB(j).toInt; words(v >>> 6) |= 1L << (v & 63); j += 1 }
            new BitmapContainer(words, n)
          })
        start = end
      }
      new Bitmap32(keys.result(), containers.result())
    }

    def deserialize(bytes: Array[Byte]): Bitmap64 = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val buckets = buf.getLong
      require(buckets >= 0 && buckets <= Int.MaxValue, s"implausible bucket count $buckets")
      val highKeys = new Array[Int](buckets.toInt)
      val lows = new Array[Bitmap32](buckets.toInt)
      var i = 0
      while (i < buckets) {
        highKeys(i) = buf.getInt
        lows(i) = readBitmap32(buf)
        i += 1
      }
      new Bitmap64(highKeys, lows)
    }

    private def readBitmap32(buf: java.nio.ByteBuffer): Bitmap32 = {
      val cookieWord = buf.getInt
      val cookie = cookieWord & 0xFFFF
      val (size, runFlags) =
        if (cookie == CookieRun) {
          val n = ((cookieWord >>> 16) & 0xFFFF) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          buf.get(flags)
          (n, flags)
        } else {
          require(cookieWord == CookieNoRun, s"unknown roaring cookie $cookieWord")
          (buf.getInt, null)
        }
      val keys = new Array[Char](size)
      val cards = new Array[Int](size)
      var i = 0
      while (i < size) {
        keys(i) = buf.getChar
        cards(i) = (buf.getChar.toInt & 0xFFFF) + 1
        i += 1
      }
      // offset header: always present for the no-run cookie; present for the
      // run cookie only when size >= 4. Containers are laid out back to back
      // in key order either way, so sequential parsing is exact — skip it.
      if (runFlags == null || size >= 4) buf.position(buf.position() + 4 * size)
      val containers = new Array[Container](size)
      i = 0
      while (i < size) {
        val isRun = runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
        containers(i) =
          if (isRun) {
            val nRuns = buf.getChar.toInt & 0xFFFF
            val vals = Array.newBuilder[Char]
            var r = 0
            while (r < nRuns) {
              val start = buf.getChar.toInt & 0xFFFF
              val len = buf.getChar.toInt & 0xFFFF
              var v = start
              while (v <= start + len) { vals += v.toChar; v += 1 }
              r += 1
            }
            val arr = vals.result()
            if (arr.length <= ArrayCutoff) new ArrayContainer(arr)
            else {
              val words = new Array[Long](1024)
              arr.foreach(c => { val v = c.toInt; words(v >>> 6) |= 1L << (v & 63) })
              new BitmapContainer(words, arr.length)
            }
          } else if (cards(i) > ArrayCutoff) {
            val words = new Array[Long](1024)
            var w = 0
            while (w < 1024) { words(w) = buf.getLong; w += 1 }
            new BitmapContainer(words, cards(i))
          } else {
            val vals = new Array[Char](cards(i))
            var j = 0
            while (j < cards(i)) { vals(j) = buf.getChar; j += 1 }
            new ArrayContainer(vals)
          }
        i += 1
      }
      new Bitmap32(keys, containers)
    }
  }
}
