package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{AudioOps, Dedup, Multimodal}

/** Spark-level gates for the audio near-dup pillar: WAV codec round-trip,
  * the planted re-mastered-duplicate end-to-end test (real RIFF encode →
  * real decode → delta-sign energy fingerprint → pigeonhole blocking),
  * and the freshness gate for the q92 golden oracle — SQL cannot parse
  * WAV, so the driver compares q92 against a checked-in parquet; this
  * spec recomputes against LIVE sf0.01 testdata and fails loudly on
  * drift (same contract as ImageDedupSpec for q85).
  */
class AudioDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("audio-dedup-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q92_audio_dedup.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  test("WAV encode/decode round-trips PCM16 samples exactly") {
    val samples = AudioOps.synthSamples(42L, 4000)
    val Some((rate, decoded)) = AudioOps.decodeWav(AudioOps.encodeWav(samples))
    assert(rate == 16000)
    assert(decoded.toSeq == samples.toSeq, "lossless PCM must round-trip bit-exact")
    // chunk-walking: a LIST chunk between fmt and data must not break decode
    val wav = AudioOps.encodeWav(samples)
    val withList = {
      val head = java.util.Arrays.copyOfRange(wav, 0, 36)
      val tail = java.util.Arrays.copyOfRange(wav, 36, wav.length)
      val list = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      list.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      val out = java.nio.ByteBuffer.allocate(wav.length + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(head).put(list.array()).put(tail)
      // patch the RIFF size field
      out.putInt(4, wav.length + 12 - 8)
      out.array()
    }
    val Some((_, decoded2)) = AudioOps.decodeWav(withList)
    assert(decoded2.toSeq == samples.toSeq, "LIST chunk must be skipped, not fatal")
    // garbage is a skip, not a crash
    assert(AudioOps.decodeWav("not a wav at all".getBytes).isEmpty)
    // a truncated fmt chunk is a skip, not a crash
    val shortFmt = {
      val w2 = AudioOps.encodeWav(samples)
      // patch fmt chunk length down to 8 (header at offset 16, len at 20)
      val bb2 = java.nio.ByteBuffer.wrap(w2.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb2.putInt(20, 8)
      bb2.array()
    }
    assert(AudioOps.decodeWav(shortFmt).isEmpty)
  }

  test("planted re-mastered clips are found; byte hashes differ; no false pairs") {
    import spark.implicits._
    val ids = (0L until 100L)
    val media = Multimodal.syntheticAudio(ids.toDF("doc_id"), "doc_id")
    val sigs = Multimodal.audioFeatures(media).toDF()
      .select(col("doc_id"), col("fingerprint").as("simhash"))
    val got = Dedup.simhashNearDups(sigs, "doc_id", maxHamming = 3,
        numSegments = 4, segmentBits = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Set((0L, 1L), (25L, 26L), (50L, 51L), (75L, 76L))
    assert(planted.subsetOf(got), s"missing planted pairs: ${planted -- got}")
    assert(got == planted, s"unexpected extra pairs: ${got -- planted}")
    val nDistinctPayloads = media.toDF()
      .select(md5(col("payload")).as("h")).distinct().count()
    assert(nDistinctPayloads == 100L, "re-mastered copies must not be byte-identical")
  }

  test("decoded features are real: rate, counts, peak come from the samples") {
    import spark.implicits._
    val media = Multimodal.syntheticAudio(Seq(3L, 4L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.audioFeatures(media).collect().sortBy(_.doc_id)
    rows.foreach { r =>
      assert(r.decoded && r.sample_rate == 16000 && r.n_samples == 8000L)
      assert(r.peak > 0 && r.peak <= 32767)
      assert(r.zero_crossings > 0L)
    }
  }

  test("q92 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File(goldenPath).exists(), s"$goldenPath not generated yet")
    val live = SparkEntry.queries("q92_audio_dedup")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q92 golden is STALE (testdata doc ids drifted) — regenerate it per the " +
        "q92 oracle comment in PipelineQueries before the driver's compare runs")
  }
}
