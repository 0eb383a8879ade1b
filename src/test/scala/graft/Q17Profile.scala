package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.{FileCatalog, TableIdent}
import graft.spark.{IceScan, IceWrite}
import graft.spec.{IceSchema, IceType, PartitionSpec}

/** Scratch profiler for q17's phase costs (write / commit / scan) — test
  * scope only, run via `sbt "Test/runMain graft.Q17Profile"`. */
object Q17Profile {
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
      println(f"[q17prof] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to 3) {
      println(s"--- iter $i")
      val cat = new FileCatalog(java.nio.file.Files.createTempDirectory("graft_q17p").toString)
      val o = tm("read+prep") {
        val x = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
        x.count(); x
      }
      val (struct, _) = IceType.fromSparkAssignIds(o.schema)
      val schema = IceSchema(0, struct.fields)
      val dateId = struct.fields.find(_.name == "odate").get.id
      val spec = PartitionSpec(0, Seq(graft.spec.PartitionField(
        dateId, 1000, "odate_month", graft.core.Transform.Month)))
      var t = cat.createTable(TableIdent(Seq("bench"), "ord_part"), schema, spec)
      tm("rawPartitionedWrite") {
        val tmp = java.nio.file.Files.createTempDirectory("graft_q17raw").toString
        o.withColumn("__gp_m", expr("(year(odate) - 1970) * 12 + month(odate) - 1"))
          .repartition(col("__gp_m")).sortWithinPartitions(col("__gp_m"))
          .write.mode("overwrite").partitionBy("__gp_m").option("compression", "zstd").parquet(tmp)
      }
      val files = tm("writeDataFiles") { IceWrite.writeDataFiles(s, t, o, t.schema) }
      t = tm("commit") { t.newTransaction(None).appendData(files).commit() }
      tm("scan+agg") {
        IceScan.scan(s, t, filters = Seq(col("odate") >= lit("1996-06-01") && col("odate") < lit("1996-09-01")))
          .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("total"))
          .collect()
      }
    }
    s.stop()
  }
}
