package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan/phase probe for q78 — test scope only. Clean warm timings
  * (cache cleared between runs — CacheManager dedupes identical logical
  * plans, so leftover caches make timings lies) plus plan-shape counters
  * at the benched t = 1/5. */
object Q78Plan {
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
      println(f"[q78prof] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 3) {
      tm(s"op-clean-$i") {
        graft.pipeline.Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text",
          shingleSize = 3, maxDf = 10, tNum = 1, tDen = 5).count()
      }
      s.catalog.clearCache(); System.gc()
    }
    val plan = graft.pipeline.Dedup.containmentJoinLazy(
      Tables.documents(s, d), "doc_id", "text", tNum = 1, tDen = 5)
      .queryExecution.executedPlan.toString
    println("[q78plan] ReusedExchange=" + "ReusedExchange".r.findAllIn(plan).length +
      " Exchange=" + "Exchange".r.findAllIn(plan).length +
      " HashAggregate=" + "HashAggregate".r.findAllIn(plan).length +
      " SortMergeJoin=" + "SortMergeJoin".r.findAllIn(plan).length +
      " BroadcastHashJoin=" + "BroadcastHashJoin".r.findAllIn(plan).length)
    s.stop()
  }
}
