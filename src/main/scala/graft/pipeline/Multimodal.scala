package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * frame-sampling run as partition-local batch functions.
  *
  * IMAGES have a REAL codec path: [[imageFeatures]] and [[resizeImages]]
  * decode PNG/JPEG payloads with the JDK's ImageIO, operate on actual
  * pixels (area-average resize, DCT perceptual hash — [[ImageOps]]), and
  * re-encode losslessly. Non-image media (audio/video — no JDK codec
  * exists offline) keep the deterministic byte-level stand-ins
  * ([[decodeFeatures]]/[[resizePayloads]]/[[sampleFrames]]), with the same
  * schema contract and `mapPartitions` batch shape. Either way the 100 TB
  * plumbing is identical: payloads never leave the executor that read
  * them, and per-payload work parallelizes per input split.
  */
object Multimodal {

  /** Media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted per-payload features (stub decode). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, payload_hash: String,
                                 head_byte: Int, n_frames: Int)

  /** One sampled "frame" per row: an evenly-spaced byte slice standing in
    * for a decoded video frame / audio window. */
  final case class Frame(doc_id: Long, frame_no: Int, offset: Long, head_byte: Int,
                         frame_hash: String)

  /** Wraps a text/binary source column into the media schema. In a real
    * ingest this is the raw image/audio bytes column. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String, mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    // null payloads become empty ones HERE, the single entry point: the
    // downstream kernels (digest, codec probes, byte resampling) follow
    // the decode-failure skip contract for empty payloads, whereas a null
    // would fail the non-nullable n_bytes encoder on real dirty corpora
    val bytes = coalesce(col(bytesCol).cast("binary"),
      lit(Array.emptyByteArray))
    df.select(col(idCol).cast("long").as("doc_id"), lit(mime).as("mime"),
      octet_length(bytes).cast("long").as("n_bytes"),
      bytes.as("payload")).as[MediaRow]
  }

  /** STUB decoder: a real implementation would parse the codec here
    * (e.g. JPEG → pixel tensor). The stub derives deterministic features
    * (md5, head byte, frame count) so the pipeline shape is testable
    * end-to-end. Partition-local: no shuffle, payloads stream through. */
  def decodeFeatures(media: Dataset[MediaRow], framesPerDoc: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // one instance per partition
      rows.map { r =>
        md.reset()
        val hash = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.n_bytes, hash,
          if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
          framesPerDoc)
      }
    }
  }

  /** Resized media row: payload transformed to the target "dimensions". */
  final case class ResizedRow(doc_id: Long, mime: String, n_bytes: Long,
                              payload: Array[Byte], orig_bytes: Long)

  /** BYTE-level resample for NON-image media (no JDK codec exists for
    * audio/video offline): deterministically down/up-samples the byte
    * stream to `targetBytes` (every k-th byte on shrink, cyclic repeat on
    * grow). IMAGE payloads should use [[resizeImages]], which decodes and
    * scales real pixels. The 100 TB contract is the same either way:
    * payloads never leave the executor that read them. */
  def resizePayloads(media: Dataset[MediaRow], targetBytes: Int): Dataset[ResizedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out =
          if (r.payload.isEmpty || targetBytes <= 0) Array.emptyByteArray
          else Array.tabulate(targetBytes) { i =>
            // nearest-neighbor over the byte axis (shrink) / cyclic (grow)
            r.payload(((i.toLong * r.payload.length) / targetBytes).toInt % r.payload.length)
          }
        ResizedRow(r.doc_id, r.mime, out.length.toLong, out, r.n_bytes)
      }
    }
  }

  /** Decoded per-image features from a REAL ImageIO decode: dimensions,
    * integer-luma mean, and the DCT perceptual hash ([[ImageOps.phash64]]).
    * `phash` feeds Hamming-distance image near-dup via the same pigeonhole
    * blocking as SimHash ([[Dedup.simhashNearDups]] with 16-bit segments) —
    * byte-level dedup misses re-encoded/re-exposed copies entirely; this
    * catches them. Payloads no installed reader recognizes surface as
    * decoded=false with zeroed features rather than poisoning the stage. */
  final case class ImageRow(doc_id: Long, decoded: Boolean, width: Int, height: Int,
                            mean_luma: Double, phash: Long)

  /** Real image decode + feature extraction (partition-local, no shuffle). */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageOps.decodeRgb(r.payload) match {
          case Some((w, h, px)) =>
            var lum = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              lum += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
              i += 1
            }
            ImageRow(r.doc_id, decoded = true, w, h,
              lum.toDouble / (1000.0 * px.length), ImageOps.phash64(w, h, px))
          case None => ImageRow(r.doc_id, decoded = false, 0, 0, 0.0, 0L)
        }
      }
    }
  }

  /** REAL pixel resize: ImageIO decode → area-average (box-filter) scale to
    * `targetW`×`targetH` → lossless PNG re-encode. Partition-local; payloads
    * an installed reader cannot decode pass through unchanged (documented
    * pass-through beats silently emitting garbage bytes). */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageOps.decodeRgb(r.payload) match {
          case Some((w, h, px)) =>
            val out = ImageOps.encodePng(targetW, targetH,
              ImageOps.resizeRgb(w, h, px, targetW, targetH))
            ResizedRow(r.doc_id, "image/png", out.length.toLong, out, r.n_bytes)
          case None => ResizedRow(r.doc_id, r.mime, r.n_bytes, r.payload, r.n_bytes)
        }
      }
    }
  }

  /** Deterministic PNG fixture corpus derived from a document id column —
    * the stand-in for a real image table (this container ships none). Each
    * id renders a seeded gradient+rectangles image ([[ImageOps.synthPixels]]);
    * ids with `id % dupStride == 1` instead render a PERTURBED copy of
    * id−1's image (brightness shift + sparse noise — a re-encode-style
    * near-duplicate whose md5 differs but whose pHash is Hamming-close).
    * Real PNG bytes out: the downstream decode exercises the actual codec.
    */
  def syntheticImages(df: DataFrame, idCol: String, dupStride: Int = 25,
                      w: Int = 64, h: Int = 48): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    // The render below is CPU-bound per id (PNG encode is the cost), but the
    // id column usually arrives as ONE input split (a small parquet file ≪
    // maxPartitionBytes), which would serialize the whole corpus render on a
    // single core. Repartitioning the bare ids is a shuffle of longs — free —
    // and payloads are still BORN distributed, never moved. (A real image
    // corpus at 100 TB arrives as many splits and needs no such step; this is
    // fixture-generation plumbing, not the operator's data path.)
    df.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
      ids.map { id =>
        val px =
          if (dupStride > 1 && id % dupStride == 1)
            ImageOps.perturbPixels(ImageOps.synthPixels(id - 1, w, h),
              seed = id, brightness = 4, noisePixels = w * h / 100)
          else ImageOps.synthPixels(id, w, h)
        val bytes = ImageOps.encodePng(w, h, px)
        MediaRow(id, "image/png", bytes.length.toLong, bytes)
      }
    }
  }

  /** Decoded per-clip features from a REAL WAV decode: sample rate, sample
    * count, peak amplitude, zero crossings, and the delta-sign energy
    * fingerprint ([[AudioOps.fingerprint64]]) — which feeds Hamming-blocked
    * audio near-dup via the same pigeonhole machinery as SimHash/pHash.
    * Payloads no parser recognizes surface as decoded=false with zeroed
    * features (the [[imageFeatures]] contract). */
  final case class AudioRow(doc_id: Long, decoded: Boolean, sample_rate: Int,
                            n_samples: Long, peak: Int, zero_crossings: Long,
                            fingerprint: Long)

  /** Real WAV decode + feature extraction (partition-local, no shuffle). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        AudioOps.decodeWav(r.payload) match {
          case Some((rate, samples)) =>
            var peak = 0
            var zc = 0L
            var i = 0
            while (i < samples.length) {
              val a = math.abs(samples(i).toInt)
              if (a > peak) peak = a
              if (i > 0 && (samples(i) < 0) != (samples(i - 1) < 0)) zc += 1
              i += 1
            }
            AudioRow(r.doc_id, decoded = true, rate, samples.length.toLong,
              peak, zc, AudioOps.fingerprint64(samples))
          case None => AudioRow(r.doc_id, decoded = false, 0, 0L, 0, 0L, 0L)
        }
      }
    }
  }

  /** Deterministic WAV fixture corpus derived from a document id column —
    * the audio analogue of [[syntheticImages]], with the same planted
    * near-duplicate shape: ids with `id % dupStride == 1` render a
    * RE-MASTERED copy of id−1's clip (gain change + sparse sample noise —
    * md5 differs in every byte, fingerprint stays Hamming-close). Real WAV
    * bytes out: the downstream decode exercises the actual RIFF parser.
    * Ids repartition before the CPU-bound render, as in syntheticImages. */
  def syntheticAudio(df: DataFrame, idCol: String, dupStride: Int = 25,
                     nSamples: Int = 8000): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val samples =
            if (dupStride > 1 && id % dupStride == 1)
              AudioOps.perturbSamples(AudioOps.synthSamples(id - 1, nSamples),
                seed = id, gainPerMille = 1080, noiseSamples = nSamples / 200)
            else AudioOps.synthSamples(id, nSamples)
          val bytes = AudioOps.encodeWav(samples)
          MediaRow(id, "audio/wav", bytes.length.toLong, bytes)
        }
      }
  }

  /** Decoded per-clip features from a REAL AVI parse + per-frame ImageIO
    * decode: dimensions, frame count, fps, and the clip fingerprint — the
    * perceptual hash of the per-pixel temporal MEAN frame
    * ([[VideoOps.meanFrame]] → [[ImageOps.phash64]]), which feeds
    * Hamming-blocked video near-dup via the same pigeonhole machinery as
    * SimHash/pHash. Payloads the parser does not recognize surface as
    * decoded=false with zeroed features (the [[imageFeatures]] contract). */
  final case class VideoRow(doc_id: Long, decoded: Boolean, width: Int, height: Int,
                            n_frames: Int, fps: Int, fingerprint: Long)

  /** Real video decode + feature extraction (partition-local, no shuffle). */
  def videoFeatures(media: Dataset[MediaRow]): Dataset[VideoRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        (for {
          (w, h, fps, frames) <- VideoOps.decodeAvi(r.payload)
          // frames whose decoded dims disagree with the container header
          // are dropped (a malformed payload must be a skip, never an
          // out-of-bounds crash in meanFrame)
          pixelFrames = frames.flatMap(f => ImageOps.decodeRgb(f).collect {
            case (fw, fh, px) if fw == w && fh == h => px
          })
          if pixelFrames.nonEmpty
        } yield VideoRow(r.doc_id, decoded = true, w, h, frames.size, fps,
          ImageOps.phash64(w, h, VideoOps.meanFrame(w, h, pixelFrames))))
          .getOrElse(VideoRow(r.doc_id, decoded = false, 0, 0, 0, 0, 0L))
      }
    }
  }

  /** Deterministic AVI/MPNG fixture corpus derived from a document id
    * column — the video analogue of [[syntheticImages]]/[[syntheticAudio]],
    * with the same planted near-duplicate shape: ids with
    * `id % dupStride == 1` render a RE-ENCODED copy of id−1's clip (every
    * frame brightness-shifted + sparsely noised — every byte differs, the
    * temporal-mean pHash stays Hamming-close). Each clip's frames derive
    * from one base image with per-frame exposure drift standing in for
    * motion. Real AVI bytes out: the downstream parse exercises the
    * actual RIFF walker and PNG decoder. */
  def syntheticVideos(df: DataFrame, idCol: String, dupStride: Int = 25,
                      nFrames: Int = 6, w: Int = 32, h: Int = 24): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        ids.map { id =>
          val dup = dupStride > 1 && id % dupStride == 1
          val baseSeed = if (dup) id - 1 else id
          val base = ImageOps.synthPixels(baseSeed, w, h)
          val frames = (0 until nFrames).map { f =>
            val frame = ImageOps.perturbPixels(base, seed = baseSeed * 131 + f,
              brightness = f * 3 - nFrames, noisePixels = w * h / 50)
            val fin = if (dup)
              ImageOps.perturbPixels(frame, seed = id * 977 + f,
                brightness = 4, noisePixels = w * h / 100)
            else frame
            ImageOps.encodePng(w, h, fin)
          }
          val bytes = VideoOps.encodeAvi(frames, w, h, fps = 10)
          MediaRow(id, "video/x-msvideo", bytes.length.toLong, bytes)
        }
      }
  }

  /** One REAL decoded frame per row: evenly-spaced frame indices from the
    * parsed container, each with its own perceptual hash — the per-frame
    * feature feed (frame-level dedup, scene search) that [[sampleFrames]]
    * can only approximate for opaque codecs. Partition-local fan-out. */
  final case class VideoFrame(doc_id: Long, frame_no: Int, width: Int, height: Int,
                              phash: Long)

  def sampleVideoFrames(media: Dataset[MediaRow], framesPerDoc: Int): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        VideoOps.decodeAvi(r.payload).toSeq.flatMap { case (w, h, _, frames) =>
          val n = frames.size
          val picks =
            if (framesPerDoc >= n) 0 until n
            else (0 until framesPerDoc).map(f => (f.toLong * (n - 1) / math.max(framesPerDoc - 1, 1)).toInt)
          picks.distinct.flatMap { idx =>
            ImageOps.decodeRgb(frames(idx)).map { case (fw, fh, px) =>
              VideoFrame(r.doc_id, idx, fw, fh, ImageOps.phash64(fw, fh, px))
            }
          }
        }
      }
    }
  }

  /** Frame sampling: `framesPerDoc` evenly-spaced slices per payload —
    * the mapPartitions analogue of video frame extraction. Fan-out happens
    * executor-side; output is (doc, frame) keyed for downstream per-frame
    * feature jobs. */
  def sampleFrames(media0: Dataset[MediaRow], framesPerDoc: Int, frameLen: Int): Dataset[Frame] = {
    val spark = media0.sparkSession
    import spark.implicits._
    // spread-if-narrow (guide §2.6): the per-row digest kernel ran
    // single-task off a one-split corpus; no-op at cluster scale
    val media = TextOps.spreadNarrow(media0, org.apache.spark.sql.functions.col("doc_id"))
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        (0 until framesPerDoc).iterator.map { f =>
          val off = if (r.n_bytes <= 1) 0L else (r.n_bytes - 1) * f / math.max(framesPerDoc - 1, 1)
          val end = math.min(off + frameLen, r.n_bytes).toInt
          val slice = if (r.payload.isEmpty) Array.emptyByteArray
            else java.util.Arrays.copyOfRange(r.payload, off.toInt, end)
          md.reset()
          Frame(r.doc_id, f, off,
            if (slice.nonEmpty) slice(0) & 0xff else -1,
            md.digest(slice).map("%02x".format(_)).mkString)
        }
      }
    }
  }
}
