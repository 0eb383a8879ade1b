package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.spark.sql.GraftExtensions) // SQL DDL/MV/MERGE queries
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/shuffle machinery so the first timed query does
    // not absorb session startup cost
    spark.range(2000000).selectExpr("sum(id * 2)").write.mode("overwrite").format("noop").save()
    // optional comma-separated subset for local profiling (driver leaves unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full materialization of every output column (count()
      // would let Catalyst prune most of the computation away)
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query isolation, OUTSIDE the timed window: operator-internal
      // caches must not leak across queries, and dropped broadcasts/shuffles
      // are only reclaimed when a GC notifies the ContextCleaner — without
      // this, later queries pay earlier queries' memory pressure (observed
      // 3-9x inflation on the vector queries late in the full suite).
      spark.catalog.clearCache()
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
