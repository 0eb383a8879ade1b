package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextOps

/** Freshness gate for the q60 golden oracle: SQL has no DEFLATE, so the
  * driver compares q60 against a checked-in parquet of the exact sf0.01
  * result. That pin is only honest while (a) the sf0.01 documents table and
  * (b) the JVM's bundled zlib both stay fixed — this spec recomputes the
  * operator against the LIVE testdata and fails loudly on any drift, so a
  * silent regeneration can never turn the golden into a wrong oracle.
  * Regenerate (see the q60 oracle comment in PipelineQueries) when it fails.
  */
class TextOpsGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("textops-golden-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q60_compression_ratio.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  test("q60 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val live = TextOps.compressionRatio(Tables.documents(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q60 golden is STALE (testdata or zlib drifted) — regenerate it per the " +
        "q60 oracle comment in PipelineQueries before the driver's compare runs")
  }

  test("golden rows are internally consistent (ratio = deflated/bytes)") {
    val bad = spark.read.parquet(goldenPath)
      .filter(abs(col("ratio") -
        col("n_deflated").cast("double") / greatest(col("n_bytes"), lit(1L))) > 1e-12)
      .count()
    assert(bad == 0)
  }
}
