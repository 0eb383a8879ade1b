package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Dedup

/** Scratch profiler for q47's phase costs (pair generation vs clustering) —
  * test scope only: `sbt "Test/runMain graft.Q47Profile"`. */
object Q47Profile {
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
      println(f"[q47prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 3) {
      println(s"--- iter $i")
      val pairs = tm("pairs") {
        val p = Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text", threshold = 0.5)
        p.count(); p
      }
      tm("clusters") {
        Dedup.dupClusters(pairs, "id_a", "id_b").count()
      }
      tm("clusters-instr") {
        import org.apache.spark.sql.functions._
        s.conf.set("spark.sql.shuffle.partitions",
          sys.env.getOrElse("Q47_PARTS", "32"))
        s.conf.set("spark.sql.adaptive.enabled",
          sys.env.getOrElse("Q47_AQE", "true"))
        val edges = tm("  edges") {
          val e0 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
            .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          val e = (if (sys.env.get("Q47_NODISTINCT").isDefined) e0 else e0.distinct()).cache()
          e.count(); e
        }
        var labels = tm("  labels0") {
          edges.select(col("src").as("id")).distinct()
            .select(col("id"), col("id").as("label"))
            .localCheckpoint(true)
        }
        var converged = false
        var iter = 0
        while (!converged && iter < 100) {
          val next = tm(f"  round$iter%d-ckpt") {
            val neighborMin = edges
              .join(labels.select(col("id").as("dst"), col("label")), "dst")
              .groupBy(col("src")).agg(min(col("label")).as("nmin"))
            val stepped = labels
              .join(neighborMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
              .select(col("id"), col("label").as("prev"),
                least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
            stepped
              .join(stepped.select(col("id").as("__lid"), col("label").as("__llabel")),
                stepped("label") === col("__lid"), "left")
              .select(stepped("id"),
                least(stepped("label"), coalesce(col("__llabel"), stepped("label"))).as("label"),
                col("prev"))
              .withColumn("moved", col("label") < col("prev"))
              .select(col("id"), col("label"), col("moved"))
              .localCheckpoint(true)
          }
          converged = tm(f"  round$iter%d-conv") { next.filter(col("moved")).limit(1).isEmpty }
          labels = next.select(col("id"), col("label"))
          iter += 1
        }
        edges.unpersist()
        println(s"  rounds=$iter")
      }
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
