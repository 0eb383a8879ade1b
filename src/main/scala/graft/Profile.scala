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
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val c0 = os.getProcessCpuTime
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    val dc = (os.getProcessCpuTime - c0) / 1e9
    println(f"[profile] $label%-40s $dt%8.2fs cpu=$dc%8.2fs")
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
      case "q14" =>
        import graft.catalog.{FileCatalog, TableIdent}
        import graft.spark.{IceMV, IceWrite}
        import graft.spec.{IceSchema, IceType, PartitionSpec}
        val cat = new FileCatalog(
          java.nio.file.Files.createTempDirectory("prof_wh").toString)
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").as("qty"))
        val (struct, _) = IceType.fromSparkAssignIds(li.schema)
        var t = time("createTable")(cat.createTable(
          TableIdent(Seq("bench"), "li"), IceSchema(0, struct.fields), PartitionSpec(0, Nil)))
        t = time("append even half")(IceWrite.append(spark, t, li.filter(col("l_orderkey") % 2 === 0)))
        val mv = TableIdent(Seq("bench"), "flag_stats")
        time("mv create")(IceMV.create(spark, cat, mv,
          "SELECT l_returnflag, count(*) AS n, sum(qty) AS sum_qty, min(qty) AS min_qty, max(qty) AS max_qty FROM li GROUP BY l_returnflag"))
        time("mv full refresh")(IceMV.refresh(spark, cat, mv))
        t = time("append odd half")(IceWrite.append(spark, t.refresh(), li.filter(col("l_orderkey") % 2 === 1)))
        time("mv incremental refresh")(IceMV.refresh(spark, cat, mv))
        time("mv read")(mat(IceMV.read(spark, cat, mv)))
      case "write3" =>
        // decomposes the per-ACID-write constant (VERDICT r12 #4): a 3-row
        // append's wall-time split into the Spark write job, the footer
        // scrape, and the metadata commit — run the cycle several times so
        // steady-state cost (what q97/q14's refresh loops pay) is visible
        // past first-call class loading.
        import graft.catalog.{FileCatalog, TableIdent}
        import graft.spark.IceWrite
        import graft.spec.{IceSchema, IceType, PartitionSpec}
        import spark.implicits._
        val cat = new FileCatalog(
          java.nio.file.Files.createTempDirectory("prof_wh").toString)
        val rows = Seq(("a", 1L, BigDecimal("1.50")), ("b", 2L, BigDecimal("2.25")),
          ("c", 3L, BigDecimal("3.75"))).toDF("k", "n", "amt")
          .select(col("k"), col("n"), col("amt").cast("decimal(18,2)").as("amt"))
        val (struct, _) = IceType.fromSparkAssignIds(rows.schema)
        var t = cat.createTable(TableIdent(Seq("bench"), "w3"),
          IceSchema(0, struct.fields), PartitionSpec(0, Nil))
        (1 to 6).foreach { i =>
          t = time(s"append#$i 3 rows")(IceWrite.append(spark, t.refresh(), rows))
        }
      case "q14v" =>
        // decomposes the MV refresh wall-time: how much is the aggregate
        // itself vs the ACID write machinery vs classification overhead
        import graft.catalog.{FileCatalog, TableIdent}
        import graft.spark.{IceMV, IceScan, IceWrite}
        import graft.spec.{IceSchema, IceType, PartitionSpec}
        val cat = new FileCatalog(
          java.nio.file.Files.createTempDirectory("prof_wh").toString)
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("decimal(18,2)").as("qty"))
        val (struct, _) = IceType.fromSparkAssignIds(li.schema)
        var t = cat.createTable(TableIdent(Seq("bench"), "li"),
          IceSchema(0, struct.fields), PartitionSpec(0, Nil))
        t = time("append half")(IceWrite.append(spark, t, li.filter(col("l_orderkey") % 2 === 0)))
        val agg = IceScan.scan(spark, t.refresh())
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
        time("bare aggregate (collect)")(agg.collect())
        time("bare aggregate again")(agg.collect())
        val (s2, _) = IceType.fromSparkAssignIds(agg.schema)
        val scratch = cat.createTable(TableIdent(Seq("bench"), "scratch"),
          IceSchema(0, s2.fields), PartitionSpec(0, Nil))
        time("bare IceWrite of the aggregate")(IceWrite.append(spark, scratch, agg))
        val mv = TableIdent(Seq("bench"), "flag_stats2")
        IceMV.create(spark, cat, mv,
          "SELECT l_returnflag, count(*) AS n, sum(qty) AS sum_qty FROM li GROUP BY l_returnflag")
        time("full refresh")(IceMV.refresh(spark, cat, mv))
        t = IceWrite.append(spark, t.refresh(), li.filter(col("l_orderkey") % 2 === 1))
        time("incremental refresh")(IceMV.refresh(spark, cat, mv))
        time("noop refresh (fresh)")(IceMV.refresh(spark, cat, mv))
      case "q78" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir)
        val par = spark.sessionState.conf.numShufflePartitions
        // stage 1: the corpus-scale per-doc shingle-set aggregate
        val docArr = Dedup.shinglesRaw(docs.repartition(par), "doc_id", "text", 3)
          .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("arr"))
        time("docArr aggregate (uncached)")(mat(docArr))
        docArr.cache()
        time("docArr cache fill")(mat(docArr))
        // stage 2: blocking chain off the cache (rare lists + candidates)
        val shD = docArr.select(col("doc_id"), explode(col("arr")).as("sh"))
        val rare = shD.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 10).select("sh")
        val rareLists = shD.join(rare, "sh")
          .groupBy(col("sh")).agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        time("rare inverted lists")(mat(rareLists))
        val cand = rareLists.select(explode(flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
              struct(x.as("id_a"), y.as("id_b")))))).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
        time("candidates distinct")(mat(cand))
        docArr.unpersist()
        // full ops for reference
        time("containmentJoin full")(mat(
          Dedup.containmentJoin(docs, "doc_id", "text")))
        time("containmentJoin full again")(mat(
          Dedup.containmentJoin(docs, "doc_id", "text")))
        time("jaccardJoinExact full")(mat(
          Dedup.jaccardJoinExact(docs, "doc_id", "text")))
        // standing-frame variants: checkpointed doc arrays, OnArrays entry
        val standing = time("standing docArr localCheckpoint")(
          Dedup.docShingleArrays(docs, "doc_id", "text", 3).localCheckpoint(true))
        time("containmentJoinOnArrays #1")(mat(
          Dedup.containmentJoinOnArrays(standing, "doc_id")))
        time("containmentJoinOnArrays #2")(mat(
          Dedup.containmentJoinOnArrays(standing, "doc_id")))
        time("jaccardJoinExactOnArrays #1")(mat(
          Dedup.jaccardJoinExactOnArrays(standing, "doc_id")))
        time("jaccardJoinExactOnArrays #2")(mat(
          Dedup.jaccardJoinExactOnArrays(standing, "doc_id")))
      case "q86dec" =>
        // isolate the verify kernel: enumerate-only vs enumerate+levenshtein
        val cust = Tables.customer(spark, sfDir).filter(col("c_custkey") % 3 === 0)
        val k = 2; val q = 3; val prefLen = 7
        val base = cust.select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"))
          .withColumn("len", length(col("s")))
        val grams = base
          .select(col("id"), col("s"), col("len"),
            explode(sequence(lit(1), col("len") - (q - 1))).as("pos"))
          .select(col("id"), col("s"), col("len"), col("pos"),
            col("s").substr(col("pos"), lit(q)).as("g"))
        val gdf = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("gdf").asc, col("g").asc, col("pos").asc)
        val prefix = grams.join(gdf, "g")
          .select(col("id"), col("s"), col("len"), col("g"), row_number().over(w).as("rn"))
          .filter(col("rn") <= prefLen)
          .select(col("id"), col("s"), col("len"), col("g"))
          .dropDuplicates("id", "g").cache()
        time("prefix cache fill")(mat(prefix))
        val joined = prefix
          .select(col("g"), col("id").as("id_a"), col("len").as("len_x"), col("s").as("s_a"))
          .join(prefix.select(col("g"), col("id").as("id_b"), col("len").as("len_y"),
            col("s").as("s_b")), "g")
          .filter(col("id_a") < col("id_b") && abs(col("len_x") - col("len_y")) <= k)
          .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
        println(s"[profile] joined rows = ${time("join enumerate count")(joined.count())}")
        time("join enumerate noop")(mat(joined))
        val lev = joined.withColumn("dist", levenshtein(col("s_a"), col("s_b"), k))
          .filter(col("dist") >= 0)
        time("join+levenshtein noop")(mat(lev))
        time("join+levenshtein again")(mat(lev))
        println(s"[profile] survivors = ${time("survivors count")(lev.count())}")
        val dd = lev.select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist")).distinct()
        println(s"[profile] distinct survivors = ${time("+distinct count")(dd.count())}")
        time("+distinct noop")(mat(dd))
        time("+distinct noop again")(mat(dd))
        // variant B: filter once on the wide stream, dedup pairs WITH
        // strings, recompute dist only on the distinct survivors
        val ddB = joined.filter(levenshtein(col("s_a"), col("s_b"), k) >= 0)
          .distinct()
          .select(col("id_a"), col("id_b"),
            levenshtein(col("s_a"), col("s_b"), k).cast("long").as("dist"))
        time("variantB noop")(mat(ddB))
        time("variantB noop again")(mat(ddB))
        dd.explain("formatted")
        prefix.unpersist()
      case "q86new" =>
        val cust = Tables.customer(spark, sfDir).filter(col("c_custkey") % 3 === 0)
        val lazyJoin = graft.pipeline.FuzzyJoin.editDistanceJoinLazy(cust, "c_custkey", "c_name", 2)
        time("lazy full (uncached prefix)")(mat(lazyJoin))
        lazyJoin.explain("formatted")
        time("full editDistanceJoin")(mat(
          graft.pipeline.FuzzyJoin.editDistanceJoin(cust, "c_custkey", "c_name", 2)))
        time("full editDistanceJoin again")(mat(
          graft.pipeline.FuzzyJoin.editDistanceJoin(cust, "c_custkey", "c_name", 2)))
        time("full editDistanceJoin 3rd")(mat(
          graft.pipeline.FuzzyJoin.editDistanceJoin(cust, "c_custkey", "c_name", 2)))
      case "q86" =>
        // decomposes the Ed-Join prefix branch (all sf strings are length-18
        // fixed format, so the segment/tiny branches are empty): gram+df
        // build, rarest-prefix window, self-join candidates, distinct,
        // string re-attach, banded-Levenshtein verify
        val cust = Tables.customer(spark, sfDir).filter(col("c_custkey") % 3 === 0)
        val k = 2; val q = k + 1; val prefLen = k * q + 1
        val base = cust.select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"))
          .withColumn("len", length(col("s")))
        val grams = base
          .select(col("id"), col("s"), col("len"),
            explode(sequence(lit(1), col("len") - (q - 1))).as("pos"))
          .select(col("id"), col("s"), col("len"), col("pos"),
            col("s").substr(col("pos"), lit(q)).as("g"))
        val gdf = grams.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
        time("grams+gdf count")(gdf.count())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("gdf").asc, col("g").asc, col("pos").asc)
        val prefix = grams.join(gdf, "g")
          .select(col("id"), col("len"), col("g"), row_number().over(w).as("rn"))
          .filter(col("rn") <= prefLen)
          .select(col("id"), col("len"), col("g")).cache()
        time("prefix build (cache fill)")(mat(prefix))
        val prefixPairs0 = prefix.select(col("g"), col("id").as("id_x"), col("len").as("len_x"))
          .join(prefix.select(col("g"), col("id").as("id_y"), col("len").as("len_y")), "g")
          .filter(col("id_x") < col("id_y") && abs(col("len_x") - col("len_y")) <= k)
          .select(col("id_x").as("id_a"), col("id_y").as("id_b"))
        println(s"[profile] pre-distinct pairs = ${time("pre-distinct count")(prefixPairs0.count())}")
        val pairs = prefixPairs0.distinct()
        println(s"[profile] distinct pairs = ${time("distinct count")(pairs.count())}")
        val long = base
        val cand = pairs
          .join(long.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
          .join(long.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
        time("candidates attach strings")(mat(cand))
        val ver = cand.withColumn("dist", levenshtein(col("s_a"), col("s_b"), k))
          .filter(col("dist") >= 0)
        time("verify levenshtein")(mat(ver))
        prefix.unpersist()
        time("full editDistanceJoin")(mat(
          graft.pipeline.FuzzyJoin.editDistanceJoin(cust, "c_custkey", "c_name", 2)))
        time("full editDistanceJoin again")(mat(
          graft.pipeline.FuzzyJoin.editDistanceJoin(cust, "c_custkey", "c_name", 2)))
      case "q17" =>
        import graft.catalog.{FileCatalog, TableIdent}
        import graft.spark.{IceScan, IceWrite}
        import graft.spec.{IceSchema, IceType, PartitionSpec}
        val cat = new FileCatalog(
          java.nio.file.Files.createTempDirectory("prof_wh").toString)
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
        val (struct, _) = IceType.fromSparkAssignIds(o.schema)
        val dateId = struct.fields.find(_.name == "odate").get.id
        val spec = PartitionSpec(0, Seq(graft.spec.PartitionField(
          dateId, 1000, "odate_month", graft.core.Transform.Month)))
        var t = time("createTable")(cat.createTable(
          TableIdent(Seq("bench"), "ord_part"), IceSchema(0, struct.fields), spec))
        t = time("partitioned append")(IceWrite.append(spark, t, o))
        time("pruned scan")(mat(IceScan.scan(spark, t,
          filters = Seq(col("odate") >= lit("1996-06-01") && col("odate") < lit("1996-09-01")))))
    }
    spark.stop()
  }
}
