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
    // Single-shot numbers showed ~4x run-to-run noise on untouched code paths
    // (q24 moved 3.7x, q28 6.5x between rounds) — report the per-query MEDIAN
    // of `iters` runs plus the min/max spread so regressions are gradable.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
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
      elapsed
    }
    // iterate suite-major (all queries, then repeat) so iteration i of one
    // query does not warm iteration i+1 of the same query back-to-back
    val samples: Seq[Seq[(String, Double)]] = (1 to iters).map { _ =>
      names.map { case (name, fn) => name -> timeOne(name, fn) }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val byQuery = names.map { case (name, _) =>
      val runs = samples.map(_.find(_._1 == name).get._2)
      (name, median(runs), runs.min, runs.max)
    }
    // The driver captures only a bounded TAIL of the output: the final JSON
    // line must stay short enough to survive intact (round 6's inline
    // min/max spread doubled the line and pushed the medians out of the
    // window). Medians rounded to ms; the spread goes to stderr FIRST.
    // Locale.ROOT: f"%.3f" uses the default locale — a comma-decimal JVM
    // would emit invalid JSON
    def r3(x: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val spread = byQuery.map { case (k, _, mn, mx) => s"\"$k\":[${r3(mn)},${r3(mx)}]" }
      .mkString("{", ",", "}")
    System.err.println(s"""[bench-spread iters=$iters] $spread""")
    val qs = byQuery.map { case (k, med, _, _) => s"\"$k\":${r3(med)}" }
      .mkString("{", ",", "}")
    val total = byQuery.map(_._2).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
