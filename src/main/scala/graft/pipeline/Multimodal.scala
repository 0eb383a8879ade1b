package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * frame-sampling run as partition-local batch functions.
  *
  * The DECODE step is a clearly-marked deterministic STUB (no media codecs
  * in this environment); everything around it — the schema contract, the
  * `mapPartitions` batch shape, partition-local execution with no shuffle,
  * and the frame-sampling fan-out — is the real 100 TB plumbing: payloads
  * never leave the executor that read them, and feature extraction
  * parallelizes per input split.
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
    df.select(col(idCol).cast("long").as("doc_id"), lit(mime).as("mime"),
      octet_length(col(bytesCol).cast("binary")).cast("long").as("n_bytes"),
      col(bytesCol).cast("binary").as("payload")).as[MediaRow]
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

  /** STUB resize: a real implementation decodes, scales to target pixel
    * dimensions, and re-encodes; the stub deterministically down/up-samples
    * the byte stream to `targetBytes` (every k-th byte on shrink, cyclic
    * repeat on grow) so the plumbing — new payload column, size metadata,
    * partition-local batch shape, no shuffle — is real and testable.
    * The 100 TB contract is the same as decode: payloads never leave the
    * executor that read them. */
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

  /** Frame sampling: `framesPerDoc` evenly-spaced slices per payload —
    * the mapPartitions analogue of video frame extraction. Fan-out happens
    * executor-side; output is (doc, frame) keyed for downstream per-frame
    * feature jobs. */
  def sampleFrames(media: Dataset[MediaRow], framesPerDoc: Int, frameLen: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
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
