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

  /** Per-stage CPU/records attribution for one action: prints each stage's
    * executor CPU seconds, task count, and input/shuffle volumes. */
  def stages[A](spark: SparkSession, label: String)(f: => A): A = {
    val recs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Double, Long, Long, Long)]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        recs.put(si.stageId, (si.name.takeWhile(_ != '\n').take(60),
          m.executorCpuTime / 1e9, m.inputMetrics.recordsRead,
          m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = time(label)(f)
      // drain the async listener bus instead of a fixed sleep (ADVICE r18):
      // late stage-completion events otherwise go missing from attribution
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      import scala.jdk.CollectionConverters._
      recs.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (nm, cpu, in, sr, sw)) =>
        println(f"[stage] $id%5d cpu=$cpu%8.2fs in=$in%10d sRead=$sr%10d sWrite=$sw%10d  $nm")
      }
      r
    } finally spark.sparkContext.removeSparkListener(l)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
        (1 to 3).foreach { it =>
          val cat = new FileCatalog(
            java.nio.file.Files.createTempDirectory("prof_wh").toString)
          val li = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_returnflag"),
              col("l_quantity").cast("decimal(18,2)").as("qty"))
          val (struct, _) = IceType.fromSparkAssignIds(li.schema)
          var t = time(s"#$it createTable")(cat.createTable(
            TableIdent(Seq("bench"), "li"), IceSchema(0, struct.fields), PartitionSpec(0, Nil)))
          t = time(s"#$it append even half")(IceWrite.append(spark, t, li.filter(col("l_orderkey") % 2 === 0)))
          val mv = TableIdent(Seq("bench"), "flag_stats")
          time(s"#$it mv create")(IceMV.create(spark, cat, mv,
            "SELECT l_returnflag, count(*) AS n, sum(qty) AS sum_qty, min(qty) AS min_qty, max(qty) AS max_qty FROM li GROUP BY l_returnflag"))
          time(s"#$it mv full refresh")(IceMV.refresh(spark, cat, mv))
          t = time(s"#$it append odd half")(IceWrite.append(spark, t.refresh(), li.filter(col("l_orderkey") % 2 === 1)))
          time(s"#$it mv incremental refresh")(IceMV.refresh(spark, cat, mv))
          time(s"#$it mv read")(mat(IceMV.read(spark, cat, mv)))
          spark.catalog.clearCache()
        }
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
        stages(spark, "containmentJoinOnArrays #2")(mat(
          Dedup.containmentJoinOnArrays(standing, "doc_id")))
        time("jaccardJoinExactOnArrays #1")(mat(
          Dedup.jaccardJoinExactOnArrays(standing, "doc_id")))
        time("jaccardJoinExactOnArrays #2")(mat(
          Dedup.jaccardJoinExactOnArrays(standing, "doc_id")))
      case "q86lev" =>
        // pure kernel isolation via count(): join-probe only vs join+lev
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
          .dropDuplicates("id", "g").localCheckpoint(true)
        time("prefix checkpoint")(prefix.count())
        val joined = prefix
          .select(col("g"), col("id").as("id_a"), col("len").as("len_x"), col("s").as("s_a"))
          .join(prefix.select(col("g"), col("id").as("id_b"), col("len").as("len_y"),
            col("s").as("s_b")), "g")
          .filter(col("id_a") < col("id_b") && abs(col("len_x") - col("len_y")) <= k)
        (1 to 3).foreach { i =>
          time(s"probe-only count #$i")(joined.count())
          time(s"probe+lev count #$i")(
            joined.filter(levenshtein(col("s_a"), col("s_b"), k) >= 0).count())
        }
        prefix.unpersist()
      case "q127ab" =>
        import graft.pipeline.Embeddings
        val docs = Tables.documents(spark, sfDir)
        (1 to 3).foreach { i =>
          val df = Embeddings.maxSimTopK(docs, "doc_id", "text",
            queries = Seq(("q_agg", "agg group zebra"), ("q_join", "merge join quantile"),
              ("q_scan", "gazelle table scan")), topK = 5)
          time(s"planning only #$i")(df.queryExecution.executedPlan)
          stages(spark, s"maxSimTopK exec #$i")(mat(df))
          spark.catalog.clearCache()
        }
      case "q106ab" =>
        import graft.pipeline.TextOps
        val docs = Tables.documents(spark, sfDir).localCheckpoint(true)
        time("warm")(docs.count())
        (1 to 4).foreach { i =>
          time(s"removeDupSpans #$i")(mat(
            TextOps.removeDupSpans(docs, "doc_id", "text", span = 10)))
          spark.catalog.clearCache()
        }
      case "q108ab" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val n = docs.count()
        val pages = docs.join(
            docs.select(col("doc_id").as("nid"), col("text").as("ntext")),
            (col("doc_id") + 7) % n === col("nid"), "left")
          .select(col("doc_id").as("page_id"),
            concat_ws("\n\n", col("text"), col("ntext")).as("page_text"))
          .localCheckpoint(true)
        time("warm")(pages.count())
        (1 to 4).foreach { i =>
          time(s"paragraphNearDups #$i")(mat(
            Dedup.paragraphNearDups(pages, "page_id", "page_text")))
          spark.catalog.clearCache()
        }
      case "q103ab" =>
        import graft.pipeline.TrainingSet
        val docs = Tables.documents(spark, sfDir).localCheckpoint(true)
        time("warm")(docs.count())
        (1 to 3).foreach { i =>
          time(s"dsirWeights #$i")(mat(TrainingSet.dsirWeights(
            docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"), "doc_id", "text")))
        }
      case "q110ab" =>
        import graft.pipeline.QualityLM
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .localCheckpoint(true)
        time("warm")(docs.count())
        (1 to 3).foreach { i =>
          val model = QualityLM.train(docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
          time(s"train+buckets #$i")(mat(
            QualityLM.buckets(docs, "doc_id", "text", model)))
        }
      case "repart" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .localCheckpoint(true)
        time("warm")(docs.count())
        val rr = Dedup.shinglesRaw(docs.repartition(32), "doc_id", "text", 3)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val hh = Dedup.shinglesRaw(docs.repartition(32, col("doc_id")), "doc_id", "text", 3)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        (1 to 3).foreach { i =>
          time(s"roundrobin+agg #$i")(mat(rr))
          time(s"hash-by-id+agg #$i")(mat(hh))
        }
        hh.explain("formatted")
      case "q108k" =>
        // per-shingle kernel microbenchmark: which expression costs what
        import graft.pipeline.{Dedup, TextOps}
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val n = docs.count()
        val pages = docs.join(
            docs.select(col("doc_id").as("nid"), col("text").as("ntext")),
            (col("doc_id") + 7) % n === col("nid"), "left")
          .select(col("doc_id").as("page_id"),
            concat_ws("\n\n", col("text"), col("ntext")).as("page_text"))
        val maxParas = 1024
        val paras = pages
          .select(col("page_id"), posexplode(split(col("page_text"), "\n\\s*\n")).as(Seq("__pidx", "__ptext")))
          .filter(trim(col("__ptext")) =!= "" && col("__pidx") < maxParas)
          .select((col("page_id") * maxParas + col("__pidx")).as("__pid"), col("__ptext"))
          .repartition(32).localCheckpoint(true)
        time("paras checkpoint")(paras.count())
        time("e1 paras noop")(mat(paras))
        val toks = paras.select(col("__pid"), TextOps.tokens(col("__ptext")).as("_w"))
        time("e2 tokens noop")(mat(toks))
        time("e2 tokens noop again")(mat(toks))
        val toks2 = paras.select(col("__pid"),
          array_remove(split(lower(col("__ptext")), " "), "").as("_w"))
        time("e2b tokens via array_remove")(mat(toks2))
        time("e2b again")(mat(toks2))
        time("e2c filter-HOF again")(mat(toks))
        val expl = toks.select(col("__pid"), col("_w"),
          explode(sequence(lit(1), greatest(size(col("_w")) - 2, lit(1)))).as("_i"))
        time("e3 explode (carrying _w) noop")(mat(expl))
        val sh = expl.select(col("__pid"),
          concat_ws(" ", (0 until 3).map(j => get(col("_w"), col("_i") + lit(j) - 1)): _*).as("sh"))
        time("e4 shingle assemble noop")(mat(sh))
        time("e4 again")(mat(sh))
        val md = sh.select(col("__pid"), md5(col("sh").cast("binary")).as("h"))
        time("e5 +md5 noop")(mat(md))
        val h0 = sh.select(col("__pid"),
          (expr("cast(conv(substr(md5(cast(sh as binary)), 1, 15), 16, 10) as bigint)") % Dedup.MinhashPrime).as("h0"))
        time("e6 +conv h0 noop")(mat(h0))
        time("e6 again")(mat(h0))
        val sigs = Dedup.minhashSignatures(sh, "__pid", 16)
        time("e7 signatures (16 mins agg)")(mat(sigs))
        time("e7 again")(mat(sigs))
        val arr = sh.groupBy(col("__pid")).agg(collect_set(col("sh")).as("__arr"))
        time("e8 collect_set arrays")(mat(arr))
      case "q108dec" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val n = docs.count()
        val pages = docs.join(
            docs.select(col("doc_id").as("nid"), col("text").as("ntext")),
            (col("doc_id") + 7) % n === col("nid"), "left")
          .select(col("doc_id").as("page_id"),
            concat_ws("\n\n", col("text"), col("ntext")).as("page_text"))
        time("pages noop")(mat(pages))
        val maxParas = 1024
        val paras = pages
          .select(col("page_id"), posexplode(split(col("page_text"), "\n\\s*\n")).as(Seq("__pidx", "__ptext")))
          .filter(trim(col("__ptext")) =!= "" && col("__pidx") < maxParas)
          .select((col("page_id") * maxParas + col("__pidx")).as("__pid"), col("__ptext"))
        println(s"[profile] paras = ${time("paras count")(paras.count())}")
        val par = spark.sessionState.conf.numShufflePartitions
        val raw = Dedup.shinglesRaw(paras.repartition(par), "__pid", "__ptext", 3)
        println(s"[profile] shingles = ${time("shinglesRaw count")(raw.count())}")
        val sigs = Dedup.minhashSignatures(raw, "__pid", 16)
        time("signatures noop")(mat(sigs))
        val banded = Dedup.lshBands(sigs, "__pid", 16, 4).cache()
        time("banded cache fill")(mat(banded))
        val cand = Dedup.lshCandidates(banded, "__pid").cache()
        println(s"[profile] candidates = ${time("candidates count")(cand.count())}")
        val candDocs = cand.select(col("id_a").as("__pid"))
          .union(cand.select(col("id_b").as("__pid"))).distinct()
        println(s"[profile] cand docs = ${time("candDocs count")(candDocs.count())}")
        val shSetsOld = Dedup.shinglesRaw(paras.repartition(par)
          .join(broadcast(candDocs), Seq("__pid"), "left_semi"), "__pid", "__ptext", 3)
        val verOld = Dedup.jaccardVerify(shSetsOld, cand, "__pid").filter(col("jaccard") >= 0.5)
        time("verify (repartition-then-semijoin)")(mat(verOld))
        val shSetsNew = Dedup.shinglesRaw(paras
          .join(broadcast(candDocs), Seq("__pid"), "left_semi").repartition(par), "__pid", "__ptext", 3)
        val verNew = Dedup.jaccardVerify(shSetsNew, cand, "__pid").filter(col("jaccard") >= 0.5)
        time("verify (semijoin-then-repartition)")(mat(verNew))
        banded.unpersist(); cand.unpersist()
        time("full paragraphNearDups")(mat(
          Dedup.paragraphNearDups(pages, "page_id", "page_text")))
        stages(spark, "full again")(mat(
          Dedup.paragraphNearDups(pages, "page_id", "page_text")))
      case "q77dec" =>
        import graft.pipeline.Dedup
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(spark, sfDir)
        val docArr = time("docShingleArrays checkpoint")(
          Dedup.docShingleArrays(docs, "doc_id", "text", 3).localCheckpoint(true))
        val (tNum, tDen) = (1L, 2L)
        val sh = docArr.select(col("doc_id"), explode(col("__arr")).as("sh"))
        val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
        val prefix = sh.join(dfreq, "sh")
          .select(col("doc_id"), col("sh"), row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy(col("doc_id"))).as("n_sh"))
          .filter(col("rn") <=
            col("n_sh") - expr(s"CAST((n_sh * $tNum + ${tDen - 1}) DIV $tDen AS BIGINT)") + 1)
          .select(col("doc_id"), col("sh"), col("rn"), col("n_sh")).cache()
        println(s"[profile] prefix rows = ${time("prefix cache fill")(prefix.count())}")
        val candPre = prefix.select(col("sh"), col("doc_id").as("id_a"),
            col("rn").as("ra"), col("n_sh").as("na"))
          .join(prefix.select(col("sh"), col("doc_id").as("id_b"),
            col("rn").as("rb"), col("n_sh").as("nb")), "sh")
          .filter(col("id_a") < col("id_b") &&
            col("na") * tNum <= col("nb") * tDen && col("nb") * tNum <= col("na") * tDen &&
            (least(col("na") - col("ra"), col("nb") - col("rb")) + 1) * (tNum + tDen) >=
              (col("na") + col("nb")) * tNum)
          .select(col("id_a"), col("id_b"))
        println(s"[profile] pre-distinct cand = ${time("cand pre-distinct count")(candPre.count())}")
        val cand = candPre.distinct()
        println(s"[profile] distinct cand = ${time("cand distinct count")(cand.count())}")
        val ver = Dedup.jaccardVerifyArr(docArr, cand, "doc_id")
          .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
        println(s"[profile] true pairs = ${time("verify count")(ver.count())}")
        time("verify noop")(mat(ver))
        prefix.unpersist()
        time("full jaccardJoinExactOnArrays")(mat(
          Dedup.jaccardJoinExactOnArrays(docArr, "doc_id", tNum, tDen)))
        time("full again")(mat(
          Dedup.jaccardJoinExactOnArrays(docArr, "doc_id", tNum, tDen)))
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
      case "q48" =>
        // single-task suspicion: pure-projection operators over the raw scan
        import graft.pipeline.TextOps
        val docs = Tables.documents(spark, sfDir)
        println(s"[profile] scan partitions = ${docs.rdd.getNumPartitions}")
        val par = spark.sessionState.conf.numShufflePartitions
        val plain = TextOps.repetitionStats(docs, "doc_id", "text")
        val spread = TextOps.repetitionStats(
          docs.repartition(par, col("doc_id")), "doc_id", "text")
        (1 to 3).foreach { i =>
          time(s"repetitionStats plain  #$i")(mat(plain))
          time(s"repetitionStats spread #$i")(mat(spread))
        }
        val g = TextOps.gopherRules(docs, "doc_id", "text")
        val gs = TextOps.gopherRules(docs.repartition(par, col("doc_id")), "doc_id", "text")
        (1 to 2).foreach { i =>
          time(s"gopherRules plain  #$i")(mat(g))
          time(s"gopherRules spread #$i")(mat(gs))
        }
      case "q122dec" =>
        import graft.pipeline.Embeddings
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
        })
        val prep = Embeddings.prepare(Tables.embeddings(spark, sfDir), "vec_id", "embedding")
        (1 to 3).foreach { i =>
          org.apache.spark.sql.GraftShim.drainListenerBus(spark)
          jobs.set(0)
          time(s"pqTopKIVFTrained full #$i")(mat(
            Embeddings.pqTopKIVFTrained(prep, "vec_id", 3, col("vec_id") < 20)))
          org.apache.spark.sql.GraftShim.drainListenerBus(spark)
          println(s"[profile] jobs = ${jobs.get}")
          spark.catalog.clearCache()
        }
        (1 to 2).foreach { i =>
          org.apache.spark.sql.GraftShim.drainListenerBus(spark)
          jobs.set(0)
          time(s"pqTopKIVF (q121) full #$i")(mat(
            Embeddings.pqTopKIVF(prep, "vec_id", 3, col("vec_id") < 20)))
          org.apache.spark.sql.GraftShim.drainListenerBus(spark)
          println(s"[profile] jobs = ${jobs.get}")
          spark.catalog.clearCache()
        }
      case "q51" =>
        import graft.pipeline.Dedup
        val docs = Tables.documents(spark, sfDir)
        val idx = Dedup.buildNearDupIndex(
          docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text").materialize()
        (1 to 3).foreach { i =>
          stages(spark, s"probeNearDupsIndexed #$i")(mat(
            Dedup.probeNearDupsIndexed(docs.filter(col("doc_id") % 10 === 7), idx,
              "doc_id", "text", threshold = 0.5)))
          spark.catalog.clearCache()
        }
      case "q109" =>
        import graft.catalog.{FileCatalog, TableIdent}
        import graft.spark.{IceScan, IceWrite}
        import graft.spec.{IceSchema, IceType, PartitionSpec}
        (1 to 2).foreach { i =>
          val cat = new FileCatalog(
            java.nio.file.Files.createTempDirectory("prof_wh").toString)
          val o = Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice").cast("decimal(18,2)").as("price"))
          val (struct, _) = IceType.fromSparkAssignIds(o.schema)
          var t = time(s"#$i createTable")(cat.createTable(
            TableIdent(Seq("bench"), "ordc"), IceSchema(0, struct.fields), PartitionSpec(0, Nil)))
          t = time(s"#$i append full")(IceWrite.append(spark, t, o))
          val fKeys = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
          t = time(s"#$i append eq deletes")(
            IceWrite.appendEqualityDeletes(spark, t, fKeys, equalityIds = Seq(1)))
          t = time(s"#$i append re-insert")(IceWrite.append(spark, t.refresh(),
            o.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 0)))
          time(s"#$i convertEqualityDeletes")(
            graft.table.Maintenance.convertEqualityDeletes(spark, t.refresh()))
          time(s"#$i final scan+agg")(mat(IceScan.scan(spark, t.refresh())
            .groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("total"))
            .orderBy("o_orderstatus")))
        }
      case "q84" =>
        (1 to 3).foreach { i =>
          time(s"q84_stream_window #$i")(mat(
            graft.queries.StreamingQueries.queries("q84_stream_window")(spark, sfDir)))
          spark.catalog.clearCache()
        }
        (1 to 2).foreach { i =>
          time(s"q90_stream_sessions #$i")(mat(
            graft.queries.StreamingQueries.queries("q90_stream_sessions")(spark, sfDir)))
          spark.catalog.clearCache()
        }
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
