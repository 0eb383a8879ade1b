package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec kernels for the multimodal pipeline: PNG encode/decode
  * via the JDK's bundled ImageIO (offline, zero new deps), deterministic
  * synthetic-image fixtures (this container ships no real image corpus),
  * area-average resize on decoded pixels, and a DCT perceptual hash
  * (pHash) for near-duplicate image detection.
  *
  * Everything here is DRIVER/EXECUTOR-LOCAL per payload: these kernels run
  * inside `mapPartitions` over binary columns ([[Multimodal]]), so payloads
  * never leave the executor that read them and the work parallelizes per
  * input split — the 100 TB contract of the multimodal pillar.
  *
  * Determinism: PNG is lossless (decode returns the exact encoded pixels),
  * the PRNG is splitmix64, and the DCT cosine table uses `StrictMath`, so
  * every derived feature — and the q85 golden parquet gating them — is
  * reproducible bit-for-bit across JVMs.
  */
object ImageOps {

  // ImageIO defaults to a DISK-backed stream cache (a temp file per
  // encode/decode) — pure overhead for in-memory byte-array payloads and a
  // temp-dir dependency executors may not want. Memory caching is strictly
  // better for the ≤ a-few-MB payloads this pipeline handles per row.
  ImageIO.setUseCache(false)

  /** splitmix64 — the same finalizer family as [[Dedup.permA]]'s seed mixer:
    * well-distributed streams from tiny sequential seeds. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic PRNG stream: state advances by splitmix64 of a counter. */
  private final class Rng(seed: Long) {
    private var ctr = seed
    def nextLong(): Long = { ctr += 1; mix64(ctr) }
    /** Uniform in [0, n). n is tiny here (image dims / 256), so the modulo
      * bias is negligible and the result stays deterministic. */
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Deterministic synthetic image: a 2-axis color gradient background with
    * a few alpha-blended rectangles — smooth, low-frequency content whose
    * perceptual hash is stable under small perturbations (what a real photo
    * corpus looks like to pHash, unlike iid noise). Packed 0xRRGGBB. */
  def synthPixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val rng = new Rng(mix64(seed))
    val base = Array.fill(3)(64 + rng.nextInt(128))
    // per-channel gradient slopes in [-1.5, 1.5) intensity per pixel step
    val gx = Array.fill(3)((rng.nextInt(192) - 96) / 64.0)
    val gy = Array.fill(3)((rng.nextInt(192) - 96) / 64.0)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var p = 0
        var c = 0
        while (c < 3) {
          val v = clamp8((base(c) + gx(c) * (x - w / 2) + gy(c) * (y - h / 2)).toInt)
          p = (p << 8) | v
          c += 1
        }
        px(y * w + x) = p
        x += 1
      }
      y += 1
    }
    // 3 rectangles, 50% alpha-blended over the gradient
    var r = 0
    while (r < 3) {
      val x0 = rng.nextInt(w - 8)
      val y0 = rng.nextInt(h - 6)
      val rw = 8 + rng.nextInt(math.min(32, w - x0 - 1))
      val rh = 6 + rng.nextInt(math.min(24, h - y0 - 1))
      val cr = rng.nextInt(256); val cg = rng.nextInt(256); val cb = rng.nextInt(256)
      var yy = y0
      while (yy < math.min(y0 + rh, h)) {
        var xx = x0
        while (xx < math.min(x0 + rw, w)) {
          val p = px(yy * w + xx)
          val nr = (((p >> 16) & 0xff) + cr) / 2
          val ng = (((p >> 8) & 0xff) + cg) / 2
          val nb = ((p & 0xff) + cb) / 2
          px(yy * w + xx) = (nr << 16) | (ng << 8) | nb
          xx += 1
        }
        yy += 1
      }
      r += 1
    }
    px
  }

  /** Re-encode-style perturbation: a constant brightness shift (what a
    * lossy re-encode or exposure tweak does to the DC term) plus sparse
    * seeded pixel noise. Byte-identical hashing (md5 dedup) misses the
    * result entirely; pHash does not — the planted-duplicate shape q85
    * exists to catch. */
  def perturbPixels(px: Array[Int], seed: Long, brightness: Int, noisePixels: Int): Array[Int] = {
    val rng = new Rng(mix64(seed) ^ 0x5DEECE66DL)
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i) = (clamp8(((p >> 16) & 0xff) + brightness) << 16) |
        (clamp8(((p >> 8) & 0xff) + brightness) << 8) |
        clamp8((p & 0xff) + brightness)
      i += 1
    }
    var n = 0
    while (n < noisePixels) {
      val i = rng.nextInt(px.length)
      val p = out(i)
      val d = rng.nextInt(17) - 8
      out(i) = (clamp8(((p >> 16) & 0xff) + d) << 16) |
        (clamp8(((p >> 8) & 0xff) + d) << 8) |
        clamp8((p & 0xff) + d)
      n += 1
    }
    out
  }

  /** Packed-RGB pixels → PNG bytes via the JDK encoder (lossless). */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"pixel buffer ${rgb.length} != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** PNG/JPEG/... bytes → (width, height, packed-RGB pixels) via ImageIO.
    * Returns None when no installed reader recognizes the payload — the
    * caller decides whether unknown bytes are an error or a skip. */
  def decodeRgb(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      // strip alpha: features and hashes are defined over RGB
      var i = 0
      while (i < px.length) { px(i) &= 0xffffff; i += 1 }
      Some((w, h, px))
    }
  }

  /** Integer luma (Rec.601 weights ×1000): deterministic, no float color
    * conversion — BufferedImage's own grayscale op is platform-tunable,
    * this is not. Range [0, 255000]. */
  @inline private def luma1000(p: Int): Int =
    299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)

  /** Area-average (box-filter) resize of the LUMA plane to tw×th, exact
    * fractional coverage in doubles — the standard antialiased downscale
    * (each target cell averages the source rectangle it covers, partial
    * edge pixels weighted by overlap). */
  def lumaGrid(w: Int, h: Int, px: Array[Int], tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    val sx = w.toDouble / tw
    val sy = h.toDouble / th
    var ty = 0
    while (ty < th) {
      val y0 = ty * sy; val y1 = (ty + 1) * sy
      var tx = 0
      while (tx < tw) {
        val x0 = tx * sx; val x1 = (tx + 1) * sx
        var acc = 0.0
        var y = math.floor(y0).toInt
        while (y < math.ceil(y1).toInt) {
          val wy = math.min(y + 1.0, y1) - math.max(y.toDouble, y0)
          var x = math.floor(x0).toInt
          while (x < math.ceil(x1).toInt) {
            val wx = math.min(x + 1.0, x1) - math.max(x.toDouble, x0)
            acc += wx * wy * luma1000(px(math.min(y, h - 1) * w + math.min(x, w - 1)))
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = acc / (sx * sy * 1000.0)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Area-average resize of all three channels: REAL pixel resize for
    * [[Multimodal.resizeImages]]. Same box filter as [[lumaGrid]]. */
  def resizeRgb(w: Int, h: Int, px: Array[Int], tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    val sx = w.toDouble / tw
    val sy = h.toDouble / th
    var ty = 0
    while (ty < th) {
      val y0 = ty * sy; val y1 = (ty + 1) * sy
      var tx = 0
      while (tx < tw) {
        val x0 = tx * sx; val x1 = (tx + 1) * sx
        var ar = 0.0; var ag = 0.0; var ab = 0.0
        var y = math.floor(y0).toInt
        while (y < math.ceil(y1).toInt) {
          val wy = math.min(y + 1.0, y1) - math.max(y.toDouble, y0)
          var x = math.floor(x0).toInt
          while (x < math.ceil(x1).toInt) {
            val wx = math.min(x + 1.0, x1) - math.max(x.toDouble, x0)
            val p = px(math.min(y, h - 1) * w + math.min(x, w - 1))
            val wgt = wx * wy
            ar += wgt * ((p >> 16) & 0xff)
            ag += wgt * ((p >> 8) & 0xff)
            ab += wgt * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val a = sx * sy
        out(ty * tw + tx) = (clamp8(math.rint(ar / a).toInt) << 16) |
          (clamp8(math.rint(ag / a).toInt) << 8) | clamp8(math.rint(ab / a).toInt)
        tx += 1
      }
      ty += 1
    }
    out
  }

  private val HashGrid = 32
  /** DCT-II cosine table C(u)(x) = cos((2x+1)·u·π/64), StrictMath so the
    * table — and every hash built on it — is identical on any JVM. */
  private lazy val cosTable: Array[Array[Double]] = {
    val n = HashGrid
    Array.tabulate(n, n)((u, x) => StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n)))
  }

  /** DCT perceptual hash: decoded pixels → 32×32 area-average luma → 2D
    * DCT-II → top-left 8×8 low-frequency block → 64 bits, bit i set when
    * coefficient i exceeds the MEDIAN of the 63 AC coefficients (DC
    * excluded from the threshold: a global brightness shift moves only DC,
    * so re-exposed copies land within Hamming ≤ 1). The classic pHash
    * (Zauner 2010) — robust to re-encode, resize, exposure; byte hashing
    * is robust to none of them. */
  def phash64(w: Int, h: Int, px: Array[Int]): Long = {
    val g = lumaGrid(w, h, px, HashGrid, HashGrid)
    val c = cosTable
    // separable: rows first (only the 8 needed output frequencies)
    val tmp = Array.ofDim[Double](8, HashGrid) // tmp(u)(y) = Σx C(u)(x)·g(x,y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < HashGrid) {
        var acc = 0.0
        var x = 0
        while (x < HashGrid) { acc += c(u)(x) * g(y * HashGrid + x); x += 1 }
        tmp(u)(y) = acc
        y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64) // row-major (v major: coef(v*8+u))
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var acc = 0.0
        var y = 0
        while (y < HashGrid) { acc += c(v)(y) * tmp(u)(y); y += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val threshold = ac(31) // lower median of the 63 AC coefficients
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (coef(i) > threshold) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Convenience: pHash straight from encoded bytes. */
  def phashBytes(bytes: Array[Byte]): Option[Long] =
    decodeRgb(bytes).map { case (w, h, px) => phash64(w, h, px) }
}
