package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BpeOps

/** Gates for the BPE tokenizer (q94): the classic hand-computed merge
  * order (the Sennrich 2016 walk-through corpus), lexicographic
  * tie-breaking, apply/train inversion, determinism, the zero-shuffle
  * apply plan, and golden freshness vs live sf0.01 (the q60/q85
  * contract — DuckDB cannot BPE).
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("bpe-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenPath = "src/test/resources/golden/q94_bpe_tokens.parquet"
  private val sfDir = "/root/testdata/sf0.01"

  // The Sennrich et al. 2016 walk-through histogram.
  private val classic = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("hand-computed merge order on the classic corpus") {
    // round 1 pair counts: (e,s)=9, (s,t)=9, (t,</w>)=9 tie → lexicographic
    // smallest (e,s); then (es,t)=9; then (est,</w>)=9; then (l,o)=7 vs
    // (o,w)=7 tie → (l,o); then (lo,w)=7 — the Sennrich walk-through.
    val merges = BpeOps.trainMerges(classic, numMerges = 5)
    assert(merges == Vector(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("apply inverts training: 'lowest' → low est</w>; unseen word degrades") {
    val rank = BpeOps.trainMerges(classic, 5).zipWithIndex.toMap
    assert(BpeOps.tokenizeWord("lowest", rank) == Vector("low", "est" + BpeOps.Eow))
    // no learned merges apply → characters + marker survive
    assert(BpeOps.tokenizeWord("zq", rank) == Vector("z", "q", BpeOps.Eow))
    assert(BpeOps.tokenizeWord("", rank) == Vector(BpeOps.Eow))
  }

  test("training is deterministic and independent of histogram order") {
    val a = BpeOps.trainMerges(classic, 16)
    val b = BpeOps.trainMerges(classic.reverse, 16)
    assert(a == b)
    // merge budget larger than available pairs terminates early, no loop
    val c = BpeOps.trainMerges(Seq("ab" -> 1L), 1000)
    assert(c.size <= 3)
  }

  test("tokenCounts: per-doc counts match a hand tokenization") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, "newest newest widest")).toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(classic, 4)
    val got = BpeOps.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rank = merges.zipWithIndex.toMap
    def n(w: String) = BpeOps.tokenizeWord(w, rank).length.toLong
    assert(got == Seq(
      (1L, 2L, n("low") + n("lower")),
      (2L, 3L, 2 * n("newest") + n("widest"))))
  }

  test("plan shape: the broadcast apply is a zero-shuffle projection") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val df = BpeOps.tokenCounts(docs, "doc_id", "text", Vector(("a", BpeOps.Eow)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("sequence packing runs on real BPE subword counts") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    import org.apache.spark.sql.functions._
    import graft.pipeline.{BpeOps, TrainingSet}
    val docs = Tables.documents(spark, sfDir)
    val merges = BpeOps.train(docs, "text", numMerges = 48)
    val counts = BpeOps.tokenCounts(docs, "doc_id", "text", merges)
      .join(docs.select("doc_id", "source"), "doc_id")
    val packed = TrainingSet.packSequences(counts, "doc_id", "n_bpe_tokens",
      "source", budgetTokens = 2048, buckets = 4)
    // every doc lands in exactly one pack; pack token sums respect the
    // budget except where a single long doc overflows alone
    assert(packed.count() == docs.count())
    val over = packed.groupBy("source", "bucket", "pack_id")
      .agg(sum(col("n_bpe_tokens")).as("toks"), count(lit(1)).as("n"))
      .filter(col("toks") > 2048 + 400 && col("n") > 1).count()
    assert(over == 0L, "multi-doc packs must stay near the subword budget")
    // deterministic: same corpus, same merges → same packing
    val again = TrainingSet.packSequences(counts, "doc_id", "n_bpe_tokens",
      "source", 2048, 4)
    assert(packed.exceptAll(again).count() == 0L)
  }

  /** The naive recount-every-round Sennrich trainer — the reference the
    * incremental production trainer must match bit-for-bit. */
  private def trainMergesNaive(wordCounts: Seq[(String, Long)],
                               numMerges: Int): BpeOps.Merges = {
    var words: Vector[(Array[String], Long)] = wordCounts.toVector.map {
      case (w, c) => (w.map(_.toString).toArray :+ BpeOps.Eow, c)
    }
    val out = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, _ + _); i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        counts.forEach { (p, c) =>
          if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        out += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              b += merged; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), c)
        }
        m += 1
      }
    }
    out.result()
  }

  test("incremental trainer is bit-identical to the naive recount reference") {
    // deterministic pseudo-random histograms over a small alphabet so pair
    // ties (the argmax's hard case) occur constantly
    val rng = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      val hist = (0 until 200).map { _ =>
        val len = 1 + rng.nextInt(8)
        (Vector.fill(len)(('a' + rng.nextInt(4)).toChar).mkString,
          1L + rng.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val n = 10 + trial * 25
      assert(BpeOps.trainMerges(hist, n) == trainMergesNaive(hist, n),
        s"divergence on trial $trial")
    }
    // and on the classic vector at a budget beyond exhaustion
    assert(BpeOps.trainMerges(classic, 64) == trainMergesNaive(classic, 64))
  }

  test("incremental trainer handles a 64k-type histogram at 512 merges") {
    // the sf0.01 corpus has a tiny synthetic vocabulary (exhausts after
    // ~106 merges), so the scale/speed claim needs a SYNTHETIC histogram:
    // 64k deterministic pseudo-random word types over a 26-char alphabet
    val rng = new scala.util.Random(7)
    val hist = (0 until (1 << 16)).map { i =>
      val len = 3 + rng.nextInt(10)
      (Vector.fill(len)(('a' + rng.nextInt(26)).toChar).mkString + i,
        1L + rng.nextInt(1000))
    }
    val t0 = System.nanoTime()
    val merges = BpeOps.trainMerges(hist, 512)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 512)
    // the incremental trainer's whole point: 512 merges on 64k types must
    // fit the old 48-merge budget (generous CI bound; measured ~2 s)
    assert(secs < 30.0, f"512 merges took $secs%.1f s — incremental path regressed")
  }

  test("incremental trainer matches naive to exhaustion on the real sf0.01 histogram") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val hist = docs
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(1 << 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 512-merge budget exhausts this corpus's vocabulary — BOTH trainers
    // must stop at the same point with identical merges (the q94 golden
    // depends on the 48-prefix; exhaustion pins the termination rule too)
    val inc = BpeOps.trainMerges(hist, 512)
    assert(inc == trainMergesNaive(hist, 512))
    assert(inc.take(48) == trainMergesNaive(hist, 48))
  }

  test("vocab ids: deterministic layout, unknown chars map to <unk>") {
    val merges = BpeOps.trainMerges(classic, 5)
    val vocab = BpeOps.buildVocab(classic.map(_._1), merges)
    assert(vocab(0) == BpeOps.Unk && vocab(1) == BpeOps.Eow)
    // chars ascending after the two specials, then merge products in rank
    val chars = classic.map(_._1).flatMap(_.toSeq).distinct.sorted.map(_.toString)
    assert(vocab.slice(2, 2 + chars.size) == chars.toVector)
    assert(vocab.drop(2 + chars.size) == merges.map(p => p._1 + p._2))
    assert(vocab.distinct == vocab)
  }

  test("withTokenIds + decode round-trips the word stream; zero shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, "Newest  widest low"), (3L, "zq"))
      .toDF("doc_id", "text")
    val hist = Seq("low" -> 6L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val model = BpeOps.BpeModel(BpeOps.trainMerges(hist, 5),
      BpeOps.buildVocab(hist.map(_._1), BpeOps.trainMerges(hist, 5)))
    // cluster-scale shape: with the split size floored the input counts as
    // wide and the scale-adaptive spread (r19) is a no-op — the apply stays
    // a zero-shuffle projection exactly where a shuffle would hurt
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
    val got = try BpeOps.withTokenIds(docs, "text", model, "tok")
      finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert(got.columns.toSeq == Seq("doc_id", "text", "tok"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val rows = got.orderBy("doc_id").collect()
    // docs 1-2 use only in-charset chars → decode reconstructs the
    // lowercased token stream exactly (double spaces collapse: empties drop)
    assert(BpeOps.decode(rows(0).getSeq[Int](2), model.symbols)
      == Vector("low", "lower"))
    assert(BpeOps.decode(rows(1).getSeq[Int](2), model.symbols)
      == Vector("newest", "widest", "low"))
    // 'z'/'q' are outside the training charset → unk id 0
    assert(rows(2).getSeq[Int](2).toVector == Vector(0, 0, 1))
  }

  test("q100: every sf0.01 document round-trips through its packed ids") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val model = BpeOps.trainModel(docs, "text", 48)
    val withIds = BpeOps.withTokenIds(
      docs.select("doc_id", "text"), "text", model, "tok")
    val bad = withIds.collect().count { r =>
      val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split(' ').filter(_.nonEmpty).toVector
      BpeOps.decode(r.getSeq[Int](2), model.symbols) != words
    }
    assert(bad == 0, s"$bad documents failed the id round-trip")
  }

  test("null text tokenizes as empty — no kernel NPE on dirty corpora") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = BpeOps.trainMerges(classic, 4)
    val counts = BpeOps.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(counts(1).getLong(1) == 0L && counts(1).getLong(2) == 0L)
    val model = BpeOps.BpeModel(merges, BpeOps.buildVocab(classic.map(_._1), merges))
    val ids = BpeOps.withTokenIds(docs, "text", model, "tok")
      .orderBy("doc_id").collect()
    assert(ids(1).getSeq[Int](2).isEmpty)
  }

  test("model save/load round-trips exactly; loaded model tokenizes identically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hist = Seq("low" -> 6L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeOps.trainMerges(hist, 5)
    val model = BpeOps.BpeModel(merges, BpeOps.buildVocab(hist.map(_._1), merges))
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    BpeOps.saveModel(spark, model, dir)
    val loaded = BpeOps.loadModel(spark, dir)
    assert(loaded == model)
    val docs = Seq((1L, "low lowest newest")).toDF("doc_id", "text")
    assert(BpeOps.withTokenIds(docs, "text", loaded, "tok").collect().map(_.toString).toSeq
      == BpeOps.withTokenIds(docs, "text", model, "tok").collect().map(_.toString).toSeq)
    // a foreign parquet dir is rejected loudly, not half-loaded
    val bogus = java.nio.file.Files.createTempDirectory("bpe-bogus").toString
    Seq((0, "notunk")).toDF("id", "symbol").write.parquet(s"$bogus/vocab")
    Seq((0, "a", "b")).toDF("rank", "left", "right").write.parquet(s"$bogus/merges")
    val e = intercept[IllegalArgumentException](BpeOps.loadModel(spark, bogus))
    assert(e.getMessage.contains("vocab"))
  }

  test("q100 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val golden100 = "src/test/resources/golden/q100_pack_token_ids.parquet"
    assume(new java.io.File(golden100).exists(), s"$golden100 not generated yet")
    val live = SparkEntry.queries("q100_pack_token_ids")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(golden100)
      .orderBy("source", "bucket", "pack_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q100 golden is STALE — regenerate per the q100 oracle comment in " +
        "PipelineQueries before the driver's compare runs")
  }

  test("q94 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    assume(new java.io.File(goldenPath).exists(), s"$goldenPath not generated yet")
    val live = SparkEntry.queries("q94_bpe_tokens")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(goldenPath)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q94 golden is STALE — regenerate per the q94 oracle comment in " +
        "PipelineQueries before the driver's compare runs")
  }

  // ---- byte-level mode (GPT-2 family) --------------------------------

  test("byte remap: 256 distinct symbols, GPT-2 constants, exact inverse") {
    val syms = BpeOps.ByteChar
    assert(syms.length == 256 && syms.distinct.length == 256)
    // the public bytes_to_unicode anchors: printable bytes keep their
    // codepoint; remapped bytes take 256+n in byte order — 0x00→U+0100,
    // 0x20 (the 33rd)→U+0120, 0x7f→U+0121, 0x80→U+0122, 0xa0→U+0142,
    // 0xad (last)→U+0143
    assert(syms('a'.toInt) == 'a' && syms('!'.toInt) == '!' && syms(255) == 'ÿ')
    assert(syms(0) == 'Ā' && syms(0x20) == 'Ġ' && syms(0x7f) == 'ġ')
    assert(syms(0x80) == 'Ģ' && syms(0xa0) == 'ł' && syms(0xad) == 'Ń')
    // any unicode text round-trips through the byte symbols exactly
    for (s <- Seq("hello", "naïve café", "日本語テスト", "emoji 😀 ok", ""))
      assert(BpeOps.fromByteSymbols(BpeOps.toByteSymbols(s)) == s)
  }

  test("byte-mode training on ASCII equals char-mode training") {
    // ASCII words remap to themselves, so the two modes must learn the
    // SAME merge table on the classic corpus — the cheapest possible
    // parity gate against the naive-trainer-verified char path
    val charMerges = BpeOps.trainMerges(classic, 5)
    val byteMerges = BpeOps.trainMerges(
      classic.map { case (w, c) => (BpeOps.toByteSymbols(w), c) }, 5)
    assert(byteMerges == charMerges)
  }

  test("byte-mode vocabulary seeds all 256 byte symbols; ids round-trip") {
    import spark.implicits._
    val docs = Seq((1L, "low lower"), (2L, "naïve 東京 😀"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val model = BpeOps.trainModelBytes(docs, "text", numMerges = 8)
    assert(model.symbols(0) == BpeOps.Unk && model.symbols(1) == BpeOps.Eow)
    // all 256 byte symbols present before any merge product
    assert(model.symbols.slice(2, 258).toSet == BpeOps.ByteChar.map(_.toString).toSet)
    val ids = BpeOps.withTokenIdsBytes(docs, "text", model, "tok")
      .orderBy("doc_id").collect()
    // ZERO unk anywhere — including multi-byte scripts and emoji the
    // trainer never saw as characters
    assert(ids.flatMap(_.getSeq[Int](2)).forall(_ != 0))
    // decode: ids → byte symbols → UTF-8 — the exact lowercased stream
    val words2 = BpeOps.decode(ids(1).getSeq[Int](2), model.symbols)
      .map(BpeOps.fromByteSymbols)
    assert(words2 == Vector("naïve", "東京", "😀"))
    assert(ids(2).getSeq[Int](2).isEmpty, "null text → empty ids, no NPE")
  }

  test("byte-mode model persists and reloads byte-exactly") {
    import spark.implicits._
    val docs = Seq((1L, "héllo wörld héllo")).toDF("doc_id", "text")
    val model = BpeOps.trainModelBytes(docs, "text", numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe-bytes").toString
    BpeOps.saveModel(spark, model, dir)
    assert(BpeOps.loadModel(spark, dir) == model)
  }

  test("q101: every sf0.01 document round-trips through byte ids with zero unk") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val docs = Tables.documents(spark, sfDir)
    val model = BpeOps.trainModelBytes(docs, "text", 48)
    val withIds = BpeOps.withTokenIdsBytes(
      docs.select("doc_id", "text"), "text", model, "tok")
    val bad = withIds.collect().count { r =>
      val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split(' ').filter(_.nonEmpty).toVector
      val ids = r.getSeq[Int](2)
      ids.contains(0) ||
        BpeOps.decode(ids, model.symbols).map(BpeOps.fromByteSymbols) != words
    }
    assert(bad == 0, s"$bad documents failed the byte-id round-trip / zero-unk gate")
  }

  test("q101 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val golden101 = "src/test/resources/golden/q101_bpe_bytes.parquet"
    assume(new java.io.File(golden101).exists(), s"$golden101 not generated yet")
    val live = SparkEntry.queries("q101_bpe_bytes")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(golden101)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q101 golden is STALE — regenerate per the q101 oracle comment in " +
        "PipelineQueries before the driver's compare runs")
  }
}
