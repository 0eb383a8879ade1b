package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Scratch phase profiler for q24 (minhash near-dups) — test scope only. */
object Q24Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q24prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 3) {
      val docs = Tables.documents(s, d)
      val banded = tm("bandChain") {
        val b = Dedup.lshBands(
          Dedup.minhashSignatures(Dedup.shinglesRaw(docs.repartition(32), "doc_id", "text", 3),
            "doc_id", 16), "doc_id", 16, 4).cache()
        b.count(); b
      }
      val cand = tm("candidates") {
        val c = Dedup.lshCandidates(banded, "doc_id").cache(); c.count(); c
      }
      val sh = tm("shingleSets") {
        val x = Dedup.shingles(docs.repartition(32), "doc_id", "text", 3).cache(); x.count(); x
      }
      tm("verify") {
        Dedup.jaccardVerify(sh, cand, "doc_id").filter(col("jaccard") >= 0.5).count()
      }
      banded.unpersist(); cand.unpersist(); sh.unpersist()
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
