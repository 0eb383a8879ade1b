package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** The Puffin sidecar file format (public Apache Iceberg spec) and the
  * `deletion-vector-v1` blob Iceberg V3 stores in it.
  *
  * Reference context: the reference engine has no Puffin/DV surface at all
  * (content=1 files panic, iceberg-rust table.rs:422-424) — this is the
  * beyond-reference scale path that replaces per-(path, pos) delete ROWS
  * with one compressed bitmap per data file.
  *
  * File layout (Puffin spec):
  * {{{
  *   Magic  Blob₁ … Blobₙ  Footer
  *   Footer = Magic | FooterPayload (UTF-8 JSON) | PayloadSize (4B LE)
  *          | Flags (4B; bit 0 of byte 0 = payload-compressed, we write 0)
  *          | Magic
  * }}}
  * FooterPayload JSON: `{"blobs": [...], "properties": {...}}`; each blob
  * entry carries `type`, `fields`, `snapshot-id`, `sequence-number`,
  * `offset`, `length`, and a string-map `properties`.
  *
  * Deletion-vector blob (Iceberg V3 spec): a 4-byte big-endian length of the
  * magic + vector, the 4-byte magic `0xD1 0xD3 0x39 0x64`, the 64-bit
  * roaring bitmap in the portable layout ([[Roaring]]), and a 4-byte
  * big-endian CRC-32C of the magic + vector. Blob properties carry
  * `referenced-data-file` and `cardinality`; the manifest's DataFile mirrors
  * them in `referenced_data_file` / `content_offset` / `content_size_in_bytes`.
  *
  * IO rides the Hadoop FileSystem like every other table artifact, so DVs
  * work against any configured store; blob reads are positioned range reads
  * (a reader opens ONE blob of a large puffin file without streaming the
  * rest).
  */
object Puffin {

  val Magic: Array[Byte] = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  val DvMagic: Array[Byte] = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
  val DeletionVectorV1 = "deletion-vector-v1"

  final case class BlobMeta(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  /** A blob to write: payload bytes + type + properties (offset/length are
    * assigned by the writer). */
  final case class BlobSpec(bytes: Array[Byte], blobType: String,
                            fields: Seq[Int] = Nil,
                            properties: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper()

  /** Writes a Puffin file; returns (total file length, one BlobMeta per input
    * blob, in order). */
  def write(conf: Configuration, path: String, blobs: Seq[BlobSpec],
            snapshotId: Long, sequenceNumber: Long,
            fileProperties: Map[String, String] = Map.empty): (Long, Seq[BlobMeta]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val metas = blobs.map { b =>
        val m = BlobMeta(b.blobType, b.fields, snapshotId, sequenceNumber,
          offset, b.bytes.length.toLong, b.properties)
        out.write(b.bytes)
        offset += b.bytes.length
        m
      }
      val payload = footerJson(metas, fileProperties)
      out.write(Magic)
      out.write(payload)
      val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: uncompressed footer payload
      out.write(tail.array())
      out.write(Magic)
      offset += Magic.length + payload.length + 8 + Magic.length
      (offset, metas)
    } finally out.close()
  }

  private def footerJson(metas: Seq[BlobMeta], fileProps: Map[String, String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    metas.foreach { m =>
      val n = arr.addObject()
      n.put("type", m.blobType)
      val f = n.putArray("fields")
      m.fields.foreach(f.add)
      n.put("snapshot-id", m.snapshotId)
      n.put("sequence-number", m.sequenceNumber)
      n.put("offset", m.offset)
      n.put("length", m.length)
      if (m.properties.nonEmpty) {
        val pr = n.putObject("properties")
        m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => pr.put(k, v) }
      }
    }
    if (fileProps.nonEmpty) {
      val pr = root.putObject("properties")
      fileProps.toSeq.sortBy(_._1).foreach { case (k, v) => pr.put(k, v) }
    }
    mapper.writeValueAsBytes(root)
  }

  /** Reads the footer; returns the blob directory. */
  def readFooter(conf: Configuration, path: String): Seq[BlobMeta] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val tailLen = 4 + 4 + Magic.length
      val tail = new Array[Byte](tailLen)
      in.readFully(len - tailLen, tail)
      val tb = java.nio.ByteBuffer.wrap(tail).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt
      val flags = tb.getInt
      require(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(tail, 8, tailLen), Magic),
        s"not a puffin file (trailing magic mismatch): $path")
      require((flags & 1) == 0, "compressed puffin footer payloads are not supported")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - tailLen - payloadSize, payload)
      val head = new Array[Byte](Magic.length)
      in.readFully(len - tailLen - payloadSize - Magic.length, head)
      require(java.util.Arrays.equals(head, Magic),
        s"puffin footer-start magic mismatch: $path")
      val root = mapper.readTree(payload)
      Option(root.get("blobs")).map(_.elements().asScala.map { n =>
        BlobMeta(
          blobType = n.get("type").asText(),
          fields = Option(n.get("fields"))
            .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
          snapshotId = Option(n.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
          sequenceNumber = Option(n.get("sequence-number")).map(_.asLong()).getOrElse(-1L),
          offset = n.get("offset").asLong(),
          length = n.get("length").asLong(),
          properties = Option(n.get("properties")).map { pn =>
            pn.asInstanceOf[ObjectNode].fields().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty))
      }.toSeq).getOrElse(Nil)
    } finally in.close()
  }

  /** Positioned range read of one blob's bytes. */
  def readBlobRange(conf: Configuration, path: String, offset: Long, length: Long): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val bytes = new Array[Byte](math.toIntExact(length))
    val in = fs.open(p)
    try in.readFully(offset, bytes) finally in.close()
    bytes
  }

  // ---------- deletion-vector-v1 blob codec ----------

  private def crc32c(bytes: Array[Byte], from: Int, until: Int): Int = {
    val crc = new java.util.zip.CRC32C()
    crc.update(bytes, from, until - from)
    crc.getValue.toInt
  }

  /** Serializes a bitmap as a `deletion-vector-v1` blob payload. */
  def dvBlobBytes(bm: Roaring.Bitmap64): Array[Byte] = {
    val vector = bm.serialize
    val out = java.nio.ByteBuffer.allocate(4 + 4 + vector.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vector.length) // length of magic + vector
    out.put(DvMagic)
    out.put(vector)
    val arr = out.array()
    out.putInt(crc32c(arr, 4, 4 + 4 + vector.length))
    arr
  }

  /** Parses + verifies a `deletion-vector-v1` blob payload. */
  def dvFromBlob(bytes: Array[Byte]): Roaring.Bitmap64 = {
    require(bytes.length >= 12, s"deletion-vector blob too short: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    val len = buf.getInt
    require(len == bytes.length - 8,
      s"deletion-vector length prefix $len does not match blob size ${bytes.length}")
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic), "deletion-vector magic mismatch")
    val expected = java.nio.ByteBuffer
      .wrap(bytes, bytes.length - 4, 4).order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    val actual = crc32c(bytes, 4, bytes.length - 4)
    require(actual == expected,
      f"deletion-vector CRC-32C mismatch: stored 0x$expected%08x computed 0x$actual%08x")
    Roaring.Bitmap64.deserialize(
      java.util.Arrays.copyOfRange(bytes, 8, bytes.length - 4))
  }
}
