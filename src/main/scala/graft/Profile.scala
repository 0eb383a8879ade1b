package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract): times
  * sub-stages of the heavy pipeline queries so optimization targets the
  * measured bottleneck, not a guess. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile q26"
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }
  def mat(df: DataFrame): Long = df.write.mode("overwrite").format("noop").save() match { case _ => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").write.mode("overwrite").format("noop").save()

    args.headOption.getOrElse("q26") match {
      case "q26" =>
        import graft.pipeline.Embeddings
        val prep = Embeddings.prepare(Tables.embeddings(spark, sfDir), "vec_id", "embedding")
        time("prepare.noop")(mat(prep))
        time("prepare.noop again")(mat(prep))
        val full = Embeddings.bruteForceTopK(prep, "vec_id", 3, col("vec_id") < 20)
        time("bruteForceTopK full")(mat(full))
        time("bruteForceTopK full again")(mat(full))
        full.explain("formatted")
      case "q24" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir)
        val par = spark.sessionState.conf.numShufflePartitions
        val raw = Dedup.shinglesRaw(docs.repartition(par), "doc_id", "text", 3)
        time("shinglesRaw.noop")(mat(raw))
        val sigs = Dedup.minhashSignatures(raw, "doc_id", 16)
        time("signatures.noop")(mat(sigs))
        val banded = Dedup.lshBands(sigs, "doc_id", 16, 4)
        time("banded.noop")(mat(banded))
        val full = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
        time("minhashNearDups full")(mat(full))
      case "q35" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir)
        val sigs = Dedup.simhash64(docs, "doc_id", "text")
        time("simhash64 sigs")(mat(sigs))
        time("simhash64 sigs again")(mat(sigs))
        val full = Dedup.simhashNearDups(sigs, "doc_id", 3, 4, 16)
        time("neardups full")(mat(full))
        time("neardups again")(mat(full))
      case "q27" =>
        import graft.pipeline.Embeddings
        val prep = Embeddings.prepare(Tables.embeddings(spark, sfDir), "vec_id", "embedding")
        time("prepare.noop")(mat(prep))
        val full = Embeddings.nearDupPairs(prep, "vec_id", 0.35)
        time("nearDupPairs full")(mat(full))
        time("nearDupPairs again")(mat(full))
    }
    spark.stop()
  }
}
