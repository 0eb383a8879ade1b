package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video container kernels for the multimodal pipeline: AVI (RIFF)
  * encode/decode with the MPNG codec — PNG-compressed frames, a real
  * registered FourCC — so the container parse AND the per-frame decode
  * ([[ImageOps.decodeRgb]], JDK ImageIO) are genuine, deterministic, and
  * dependency-free. (MJPEG would be the more common codec, but JPEG is
  * lossy and its decode is IDCT-implementation-defined — PNG keeps the
  * q93 golden parquet bit-reproducible on any JVM.)
  *
  * Same 100 TB contract as [[ImageOps]]/[[AudioOps]]: every kernel runs
  * partition-local inside `mapPartitions`; payloads never leave the
  * executor that read them.
  */
object VideoOps {

  private def fourcc(bb: ByteBuffer): String = {
    val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
  }

  /** PNG frame payloads → minimal valid AVI: RIFF('AVI ') with an hdrl
    * LIST (avih + one 'vids'/'MPNG' stream) and a movi LIST of '00dc'
    * chunks. Chunks pad to even length per the RIFF rule. */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "frames and fps must be positive")
    def pad(n: Int) = n + (n & 1)
    val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum // 'movi' + chunks
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' avih LIST(strl strh strf)
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) // 'AVI ' hdrl movi
    val bb = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("US-ASCII"))

    tag("RIFF"); bb.putInt(riffBody); tag("AVI ")
    tag("LIST"); bb.putInt(hdrlBody); tag("hdrl")
    tag("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps) // microseconds per frame
      .putInt(0).putInt(0).putInt(0x10) // maxbytes, padding, flags(HASINDEX off)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0) // totalframes, initial, streams, bufsize
      .putInt(w).putInt(h)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // reserved[4]
    tag("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); bb.putInt(56)
    tag("vids"); tag("MPNG")
    bb.putInt(0).putInt(0).putInt(0) // flags, prio+lang, initial frames
      .putInt(1).putInt(fps) // scale, rate → fps
      .putInt(0).putInt(frames.size).putInt(0) // start, length, bufsize
      .putInt(-1).putInt(0) // quality, samplesize
    bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    tag("strf"); bb.putInt(40) // BITMAPINFOHEADER
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    tag("MPNG"); bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); bb.putInt(moviBody); tag("movi")
    frames.foreach { f =>
      tag("00dc"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** AVI bytes → (width, height, fps, PNG frame payloads). Walks the RIFF
    * tree: header dims from avih, frames from the movi LIST's '00dc'
    * chunks. `None` for anything that is not an AVI the walker
    * understands — the caller decides skip vs error (the
    * [[ImageOps.decodeRgb]] contract). */
  def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (fourcc(bb) != "RIFF") return None
    bb.getInt
    if (fourcc(bb) != "AVI ") return None
    var w = -1; var h = -1; var fps = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(limit: Int): Unit = {
      while (bb.position() + 8 <= limit) {
        val tag = fourcc(bb)
        val len = bb.getInt
        if (len < 0 || bb.position() + len > limit) return
        val next = bb.position() + len + (len & 1)
        tag match {
          case "LIST" =>
            val kind = fourcc(bb)
            if (kind == "hdrl" || kind == "movi" || kind == "strl") walk(bb.position() + len - 4)
          case "avih" if len >= 40 => // short avih is skipped, not fatal
            val mpf = bb.getInt
            bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt; bb.getInt
            w = bb.getInt; h = bb.getInt
            fps = if (mpf > 0) 1000000 / mpf else 0
          case "00dc" =>
            val f = new Array[Byte](len); bb.get(f)
            frames += f
          case _ => ()
        }
        bb.position(math.min(next, limit))
      }
    }
    walk(bytes.length)
    if (w <= 0 || h <= 0 || frames.isEmpty) None else Some((w, h, fps, frames.toSeq))
  }

  /** Per-pixel temporal MEAN of decoded frames (packed RGB) — the clip's
    * "average frame", whose perceptual hash is the clip fingerprint:
    * stable under per-frame re-encode perturbations and global exposure
    * shifts, cheap (one pass over the pixels), and reusing the battle-
    * tested image pHash unchanged. */
  def meanFrame(w: Int, h: Int, frames: Seq[Array[Int]]): Array[Int] = {
    require(frames.nonEmpty, "meanFrame needs at least one frame")
    val n = frames.size
    val acc = new Array[Long](w * h * 3)
    frames.foreach { px =>
      var i = 0
      while (i < w * h) {
        val p = px(i)
        acc(i * 3) += (p >> 16) & 0xff
        acc(i * 3 + 1) += (p >> 8) & 0xff
        acc(i * 3 + 2) += p & 0xff
        i += 1
      }
    }
    Array.tabulate(w * h) { i =>
      (((acc(i * 3) / n).toInt) << 16) | (((acc(i * 3 + 1) / n).toInt) << 8) |
        (acc(i * 3 + 2) / n).toInt
    }
  }
}
