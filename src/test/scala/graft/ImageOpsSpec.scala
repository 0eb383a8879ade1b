package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ImageOps

/** Pure-JVM tests of the REAL image codec kernels: PNG round-trip through
  * ImageIO, area-average resize, and the DCT perceptual hash's core
  * contract — invariant under re-encode, Hamming-close under
  * re-encode-style perturbation, Hamming-far across unrelated images.
  */
class ImageOpsSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("PNG encode/decode round-trips pixels exactly (lossless)") {
    val px = ImageOps.synthPixels(seed = 7L, 64, 48)
    val bytes = ImageOps.encodePng(64, 48, px)
    // PNG magic: the payload is a real PNG, not a stand-in
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val Some((w, h, back)) = ImageOps.decodeRgb(bytes)
    assert(w == 64 && h == 48)
    assert(back.sameElements(px))
  }

  test("decodeRgb returns None for non-image bytes") {
    assert(ImageOps.decodeRgb("not an image".getBytes).isEmpty)
    assert(ImageOps.decodeRgb(Array.emptyByteArray).isEmpty)
  }

  test("pHash is invariant under lossless re-encode") {
    val px = ImageOps.synthPixels(seed = 11L, 64, 48)
    val h1 = ImageOps.phashBytes(ImageOps.encodePng(64, 48, px)).get
    // re-encode the decoded pixels: different byte stream possible, same pixels
    val Some((w, h, back)) = ImageOps.decodeRgb(ImageOps.encodePng(64, 48, px))
    val h2 = ImageOps.phashBytes(ImageOps.encodePng(w, h, back)).get
    assert(h1 == h2)
  }

  test("pHash survives brightness shift within Hamming 1 (DC-only change)") {
    // value range [60, 171]: +12 cannot clamp, so the shift is EXACTLY
    // constant and only the DC coefficient moves
    val px = Array.tabulate(64 * 48) { i =>
      val v = 60 + (i % 64) / 2 + (i / 64) / 2 + ((i % 64) * (i / 64)) % 48
      (v << 16) | (v << 8) | v
    }
    val shifted = ImageOps.perturbPixels(px, seed = 0L, brightness = 12, noisePixels = 0)
    val h1 = ImageOps.phash64(64, 48, px)
    val h2 = ImageOps.phash64(64, 48, shifted)
    // a global shift moves only the DC coefficient; AC bits and the AC-only
    // threshold are untouched, so at most bit 0 can flip
    assert(hamming(h1, h2) <= 1, s"hamming ${hamming(h1, h2)}")
    // while the BYTES differ — byte-level dedup misses this pair
    assert(!ImageOps.encodePng(64, 48, px).sameElements(ImageOps.encodePng(64, 48, shifted)))
  }

  test("pHash is Hamming-close for perturbed copies, far for unrelated images") {
    val seeds = 0L until 40L by 2
    val pairs = seeds.map { s =>
      val base = ImageOps.synthPixels(s, 64, 48)
      val dup = ImageOps.perturbPixels(base, seed = s + 1, brightness = 4, noisePixels = 30)
      (ImageOps.phash64(64, 48, base), ImageOps.phash64(64, 48, dup))
    }
    pairs.foreach { case (a, b) => assert(hamming(a, b) <= 3, s"dup pair hamming ${hamming(a, b)}") }
    // unrelated images: every cross-seed pair far apart
    val hashes = seeds.map(s => ImageOps.phash64(64, 48, ImageOps.synthPixels(s, 64, 48)))
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(hamming(hashes(i), hashes(j)) > 10,
        s"unrelated seeds ${seeds(i)}/${seeds(j)} hamming ${hamming(hashes(i), hashes(j))}")
  }

  test("area-average resize preserves mean luma and emits exact target dims") {
    val px = ImageOps.synthPixels(seed = 33L, 64, 48)
    val resized = ImageOps.resizeRgb(64, 48, px, 32, 24)
    assert(resized.length == 32 * 24)
    def meanLuma(p: Array[Int]): Double =
      p.map(v => 0.299 * ((v >> 16) & 0xff) + 0.587 * ((v >> 8) & 0xff) + 0.114 * (v & 0xff)).sum / p.length
    // a box filter is mean-preserving up to per-pixel rounding (< 1 level)
    assert(math.abs(meanLuma(px) - meanLuma(resized)) < 1.0)
    // the re-encoded resize decodes to the target dimensions
    val Some((w, h, _)) = ImageOps.decodeRgb(ImageOps.encodePng(32, 24, resized))
    assert(w == 32 && h == 24)
  }

  test("pHash is stable across resize (half-size copy stays Hamming-close)") {
    val px = ImageOps.synthPixels(seed = 55L, 64, 48)
    val half = ImageOps.resizeRgb(64, 48, px, 32, 24)
    val h1 = ImageOps.phash64(64, 48, px)
    val h2 = ImageOps.phash64(32, 24, half)
    assert(hamming(h1, h2) <= 6, s"resized-copy hamming ${hamming(h1, h2)}")
  }

  test("constant image has deterministic degenerate hash (all AC ties break low)") {
    val px = Array.fill(64 * 48)(0x808080)
    val h1 = ImageOps.phash64(64, 48, px)
    val h2 = ImageOps.phash64(64, 48, px)
    assert(h1 == h2) // exercise the all-ties path; value itself is pinned by determinism
  }
}
