package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, ImageOps, Multimodal, VideoOps}

/** Spark-level gates for the video near-dup pillar: AVI/MPNG container
  * round-trip, the planted re-encoded-clip end-to-end test (real RIFF
  * encode → real parse → per-frame ImageIO decode → temporal-mean pHash →
  * pigeonhole blocking), and the freshness gate for the q93 golden oracle
  * (the ImageDedupSpec/AudioDedupSpec contract).
  */
class VideoDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("video-dedup-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q93_video_dedup.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  test("AVI container round-trips PNG frames, dims and fps exactly") {
    val frames = (0 until 4).map(f =>
      ImageOps.encodePng(16, 12, ImageOps.synthPixels(f.toLong, 16, 12)))
    val avi = VideoOps.encodeAvi(frames, 16, 12, fps = 10)
    val Some((w, h, fps, got)) = VideoOps.decodeAvi(avi)
    assert((w, h, fps) == ((16, 12, 10)))
    assert(got.size == 4)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // every recovered frame decodes to real pixels through ImageIO
    got.foreach(f => assert(ImageOps.decodeRgb(f).exists(_._1 == 16)))
    // garbage is a skip, not a crash
    assert(VideoOps.decodeAvi("definitely not an avi".getBytes).isEmpty)
  }

  test("frames whose dims disagree with the container header are skipped, not fatal") {
    import spark.implicits._
    // declare 32x24 in the container but pack 16x12 frames
    val frames = (0 until 3).map(f =>
      ImageOps.encodePng(16, 12, ImageOps.synthPixels(f.toLong, 16, 12)))
    val avi = VideoOps.encodeAvi(frames, 32, 24, fps = 10)
    val media = Seq(Multimodal.MediaRow(1L, "video/x-msvideo", avi.length.toLong, avi))
      .toDS()
    val row = Multimodal.videoFeatures(media).collect().head
    assert(!row.decoded, "mismatched frames must yield decoded=false, not a crash")
  }

  test("planted re-encoded clips are found; byte hashes differ; no false pairs") {
    import spark.implicits._
    val ids = (0L until 100L)
    val media = Multimodal.syntheticVideos(ids.toDF("doc_id"), "doc_id")
    val sigs = Multimodal.videoFeatures(media).toDF()
      .select(col("doc_id"), col("fingerprint").as("simhash"))
    val got = Dedup.simhashNearDups(sigs, "doc_id", maxHamming = 3,
        numSegments = 4, segmentBits = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Set((0L, 1L), (25L, 26L), (50L, 51L), (75L, 76L))
    assert(planted.subsetOf(got), s"missing planted pairs: ${planted -- got}")
    assert(got == planted, s"unexpected extra pairs: ${got -- planted}")
    val nDistinctPayloads = media.toDF()
      .select(md5(col("payload")).as("h")).distinct().count()
    assert(nDistinctPayloads == 100L, "re-encoded copies must not be byte-identical")
  }

  test("decoded features are real: dims, frame count, fps come from the container") {
    import spark.implicits._
    val media = Multimodal.syntheticVideos(Seq(3L, 4L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.videoFeatures(media).collect().sortBy(_.doc_id)
    rows.foreach { r =>
      assert(r.decoded && r.width == 32 && r.height == 24)
      assert(r.n_frames == 6 && r.fps == 10)
      assert(r.fingerprint != 0L)
    }
  }

  test("sampleVideoFrames returns decoded frames at evenly-spaced indices") {
    import spark.implicits._
    val media = Multimodal.syntheticVideos(Seq(5L).toDF("doc_id"), "doc_id") // 6 frames
    val got = Multimodal.sampleVideoFrames(media, framesPerDoc = 3)
      .collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq == Seq(0, 2, 5), got.mkString("; "))
    got.foreach { f =>
      assert(f.width == 32 && f.height == 24 && f.phash != 0L)
    }
    // asking for more frames than exist returns them all, once each
    val all = Multimodal.sampleVideoFrames(media, framesPerDoc = 99).collect()
    assert(all.map(_.frame_no).sorted.toSeq == (0 until 6))
  }

  test("q93 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File(goldenPath).exists(), s"$goldenPath not generated yet")
    val live = SparkEntry.queries("q93_video_dedup")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q93 golden is STALE (testdata doc ids drifted) — regenerate it per the " +
        "q93 oracle comment in PipelineQueries before the driver's compare runs")
  }
}
