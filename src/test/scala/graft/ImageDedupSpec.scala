package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal}

/** Spark-level gates for the image near-dup pillar: the planted-duplicate
  * end-to-end test (real PNG encode → real ImageIO decode → pHash →
  * pigeonhole blocking), and the freshness gate for the q85 golden oracle —
  * SQL cannot decode PNGs, so the driver compares q85 against a checked-in
  * parquet; this spec recomputes against LIVE sf0.01 testdata and fails
  * loudly on drift (same contract as TextOpsGoldenSpec for q60).
  */
class ImageDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("image-dedup-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q85_image_dedup.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  private def pipeline(ids: Seq[Long]) = {
    import spark.implicits._
    val media = Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id")
    val sigs = Multimodal.imageFeatures(media).toDF()
      .select(col("doc_id"), col("phash").as("simhash"))
    Dedup.simhashNearDups(sigs, "doc_id", maxHamming = 3,
      numSegments = 4, segmentBits = 16)
  }

  test("planted perturbed-copy images are found; byte hashes differ; no false pairs") {
    import spark.implicits._
    val ids = (0L until 100L)
    val got = pipeline(ids).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // dupStride=25: ids 1, 26, 51, 76 are perturbed copies of their
    // predecessor — every planted pair must surface
    val planted = Set((0L, 1L), (25L, 26L), (50L, 51L), (75L, 76L))
    assert(planted.subsetOf(got), s"missing planted pairs: ${planted -- got}")
    // and nothing else at this scale: unrelated seeds are Hamming-far
    assert(got == planted, s"unexpected extra pairs: ${got -- planted}")
    // the planted copies are INVISIBLE to byte-level dedup: md5 differs
    val media = Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id")
    val nDistinctPayloads = media.toDF()
      .select(md5(col("payload")).as("h")).distinct().count()
    assert(nDistinctPayloads == 100L, "perturbed copies must not be byte-identical")
  }

  test("decoded features are real: dimensions and luma come from the pixels") {
    import spark.implicits._
    val media = Multimodal.syntheticImages(Seq(3L, 4L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.imageFeatures(media).collect().sortBy(_.doc_id)
    rows.foreach { r =>
      assert(r.decoded && r.width == 64 && r.height == 48)
      assert(r.mean_luma > 0.0 && r.mean_luma < 255.0)
    }
    // resize on real pixels: output decodes at the target dims
    val resized = Multimodal.resizeImages(media, 16, 12).collect().head
    val Some((w, h, _)) = graft.pipeline.ImageOps.decodeRgb(resized.payload)
    assert(w == 16 && h == 12)
  }

  test("q85 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File(goldenPath).exists(), s"$goldenPath not generated yet")
    val live = SparkEntry.queries("q85_image_dedup")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q85 golden is STALE (testdata doc ids drifted) — regenerate it per the " +
        "q85 oracle comment in PipelineQueries before the driver's compare runs")
  }
}
