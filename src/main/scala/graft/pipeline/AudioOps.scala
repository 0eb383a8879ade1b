package graft.pipeline

/** REAL audio codec kernels for the multimodal pipeline: WAV (RIFF/PCM16
  * mono little-endian — the standard interchange encoding) encode/decode
  * with no dependencies, deterministic synthetic-audio fixtures (this
  * container ships no audio corpus), per-window energy features, and a
  * delta-sign acoustic fingerprint for near-duplicate audio detection.
  *
  * Everything here is DRIVER/EXECUTOR-LOCAL per payload — the kernels run
  * inside `mapPartitions` over binary columns ([[Multimodal]]), so
  * payloads never leave the executor that read them (the 100 TB contract
  * of the multimodal pillar, same as [[ImageOps]]).
  *
  * Determinism: PCM is lossless, the synth uses `StrictMath` (bit-exact
  * on any JVM) with splitmix-seeded parameters, and every feature is
  * integer math over the decoded samples — the q92 golden parquet is
  * reproducible bit-for-bit.
  */
object AudioOps {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def clamp16(v: Int): Short =
    (if (v < Short.MinValue) Short.MinValue.toInt
     else if (v > Short.MaxValue) Short.MaxValue.toInt else v).toShort

  /** Deterministic synthetic clip: 2–3 seeded sine partials (tone-like
    * content whose windowed energy envelope is stable under gain/noise
    * perturbation — what the fingerprint needs, unlike iid noise) plus a
    * low-amplitude seeded noise floor, PCM16 samples. */
  def synthSamples(seed: Long, n: Int): Array[Short] = {
    val s0 = mix64(seed)
    // parity on the LONG before truncating: (long >>> 1).toInt is negative
    // for about half of seeds, and a negative % 2 is -1 — which silently
    // made nPart range 1..3 instead of the intended 2..3
    val nPart = 2 + ((mix64(s0 ^ 1) >>> 1) % 2).toInt
    val freqs = Array.tabulate(nPart)(i => 80.0 + ((mix64(s0 ^ (2 + i)) >>> 1) % 3000))
    val amps = Array.tabulate(nPart)(i => 2000 + ((mix64(s0 ^ (16 + i)) >>> 1) % 6000).toInt)
    // seeded PIECEWISE DYNAMICS (a new amplitude step every 97 samples —
    // prime, deliberately misaligned with the fingerprint windows): real
    // audio has content-driven loudness structure, and without it the
    // energy envelope is a smooth periodic curve whose delta-sign bits
    // correlate heavily across unrelated clips (measured ~50 false
    // near-dup pairs per 100 clips on a pure-AM synth)
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      var acc = 0.0
      var p = 0
      while (p < nPart) {
        acc += amps(p) * StrictMath.sin(2.0 * StrictMath.PI * freqs(p) * t / 16000.0)
        p += 1
      }
      acc *= (300 + ((mix64(s0 ^ (0xD1CE000L + t / 97)) >>> 1) % 700L)) / 1000.0
      val noise = ((mix64(s0 ^ (t * 31L)) >>> 1) % 257L).toInt - 128
      out(t) = clamp16(StrictMath.rint(acc).toInt + noise)
      t += 1
    }
    out
  }

  /** Re-master-style perturbation: a constant gain change (per-mille) plus
    * sparse seeded sample noise — a re-encoded/re-levelled copy whose md5
    * differs in every byte but whose energy-delta fingerprint is
    * Hamming-close. */
  def perturbSamples(px: Array[Short], seed: Long, gainPerMille: Int,
                     noiseSamples: Int): Array[Short] = {
    val s0 = mix64(seed) ^ 0x5DEECE66DL
    val out = new Array[Short](px.length)
    var i = 0
    while (i < px.length) {
      out(i) = clamp16((px(i).toInt * gainPerMille) / 1000)
      i += 1
    }
    var k = 0
    while (k < noiseSamples) {
      val i = (((mix64(s0 ^ k) >>> 1) % px.length)).toInt
      out(i) = clamp16(out(i) + ((mix64(s0 ^ (k + 7919)) >>> 1) % 129L).toInt - 64)
      k += 1
    }
    out
  }

  /** PCM16 mono samples → WAV bytes (44-byte RIFF header + LE data). */
  def encodeWav(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** WAV bytes → (sampleRate, PCM16 samples). Walks the RIFF chunk list
    * (a real WAV may carry LIST/fact chunks before data) and accepts only
    * PCM16 mono — `None` for anything else, the caller decides whether
    * unknown bytes are an error or a skip (the [[ImageOps.decodeRgb]]
    * contract). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (tag4() != "RIFF") return None
    bb.getInt // riff size (trusting actual buffer bounds instead)
    if (tag4() != "WAVE") return None
    var rate = -1
    var ok = false
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val tag = tag4()
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      tag match {
        case "fmt " =>
          if (len < 16) return None // malformed payload is a SKIP, not a crash
          val fmt = bb.getShort; val ch = bb.getShort
          rate = bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          ok = fmt == 1 && ch == 1 && bits == 16
          // clamp: an odd-length chunk ending exactly at the payload end
          // passes the bounds check but its +1 pad byte would overflow
          // position() — malformed payloads are skips, never crashes
          bb.position(math.min(bb.limit(), bb.position() + len - 16 + (len & 1)))
        case "data" =>
          if (!ok) return None
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          samples = out
        case _ =>
          // chunks pad to even; clamp like the fmt skip — the pad byte of a
          // final odd-length chunk may not exist in a truncated payload
          bb.position(math.min(bb.limit(), bb.position() + len + (len & 1)))
      }
    }
    if (samples == null) None else Some((rate, samples))
  }

  private val FpWindows = 65 // 64 deltas → 64 fingerprint bits

  /** Per-window sum of squared samples over `FpWindows` equal windows —
    * the energy envelope. Long-exact: 16-bit² × window length < 2^63. */
  def energyEnvelope(samples: Array[Short]): Array[Long] = {
    val out = new Array[Long](FpWindows)
    if (samples.isEmpty) return out
    var i = 0
    while (i < samples.length) {
      val w = math.min((i.toLong * FpWindows / samples.length).toInt, FpWindows - 1)
      out(w) += samples(i).toLong * samples(i)
      i += 1
    }
    out
  }

  /** 64-bit acoustic fingerprint: bit i is the SIGN of the energy delta
    * between consecutive windows (Haitsma–Kalker's robust-hash family,
    * public). Gain changes scale every window equally and vanish in the
    * comparison; sparse noise flips at most the nearest-threshold bits —
    * so a re-mastered copy stays within a small Hamming distance while
    * byte hashing sees a completely different payload. */
  def fingerprint64(samples: Array[Short]): Long = {
    val e = energyEnvelope(samples)
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
