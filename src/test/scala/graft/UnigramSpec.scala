package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.UnigramOps

/** Gates for the unigram-LM tokenizer (q102, Kudo 2018 / SentencePiece):
  * substring seeding, EM + pruning structure (chars never pruned, the
  * dominant piece survives, target size holds), Viterbi segmentation with
  * the longest-piece tie-break, the ▁ decode round-trip, unknown-char
  * <unk> fallback, determinism, and golden freshness vs live sf0.01 (the
  * q94/q100/q101 contract — DuckDB cannot run the EM trainer).
  */
class UnigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("unigram-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.01"
  private val B = UnigramOps.Boundary

  // ab-heavy toy histogram (boundary-marked): "ab" should emerge as the
  // dominant multi-char piece and survive pruning to a tiny vocabulary.
  private val toy = Seq(s"${B}abab" -> 10L, s"${B}ab" -> 5L)

  test("seedCandidates: all substrings up to maxPieceLen, chars kept, counts weighted") {
    val seeds = UnigramOps.seedCandidates(toy, maxPieceLen = 3, seedSize = 100).toMap
    // chars: ▁ appears once per word occurrence (10 + 5); a and b appear
    // twice in abab (×10) and once in ab (×5) = 25 each
    assert(seeds(B.toString) == 15.0)
    assert(seeds("a") == 25.0 && seeds("b") == 25.0)
    // "ab" occurs twice in ▁abab (×10) and once in ▁ab (×5) = 25;
    // "ba" only inside ▁abab = 10; "▁ab" once per word = 15
    assert(seeds("ab") == 25.0 && seeds("ba") == 10.0 && seeds(s"${B}ab") == 15.0)
    // maxPieceLen honored: no 4-char piece
    assert(seeds.keys.forall(_.length <= 3))
    // seedSize caps only multi-char candidates
    val tiny = UnigramOps.seedCandidates(toy, maxPieceLen = 3, seedSize = 1)
    assert(tiny.count(_._1.length == 1) == 3 && tiny.count(_._1.length > 1) == 1)
    // the one kept multi-char candidate is the most frequent ("ab", 25)
    assert(tiny.find(_._1.length > 1).map(_._1).contains("ab"))
  }

  test("trainPieces: chars survive, the dominant piece survives, size holds") {
    // vocabSize 6 = <unk> + 3 chars + 2 multi-char slots
    val pieces = UnigramOps.trainPieces(toy, vocabSize = 6, maxPieceLen = 3,
      seedSize = 100, emIters = 2)
    assert(pieces.size <= 5)
    val strs = pieces.map(_._1).toSet
    assert(Set(B.toString, "a", "b").subsetOf(strs), s"chars pruned: $strs")
    assert(strs.contains("ab"), s"dominant piece pruned: $strs")
    // probabilities are finite and normalized-ish (a log-prob simplex)
    assert(pieces.forall(_._2 < 0) && pieces.forall(p => !p._2.isNegInfinity))
  }

  test("vocabSize too small for the training charset is an explicit error") {
    val e = intercept[IllegalArgumentException](
      UnigramOps.trainPieces(toy, vocabSize = 3, maxPieceLen = 3,
        seedSize = 100, emIters = 1))
    assert(e.getMessage.contains("training characters"))
  }

  test("training is deterministic and independent of histogram order") {
    val a = UnigramOps.trainPieces(toy, 6, 3, 100, 2)
    val b = UnigramOps.trainPieces(toy.reverse, 6, 3, 100, 2)
    assert(a == b)
  }

  test("segmentWord: Viterbi picks the dominant piece; unknown chars fall back to <unk>") {
    val model = UnigramOps.buildModel(UnigramOps.trainPieces(toy, 6, 3, 100, 2))
    val id = new java.util.HashMap[String, Int]()
    model.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
    def seg(w: String): Vector[String] =
      UnigramOps.segmentWord(s"$B$w", id, model.pieces, model.maxPieceLen)
        .toVector.map(model.pieces(_)._1)
    // "abab": "ab" is the high-prob piece → ▁? + ab + ab (or ▁ab + ab if
    // that piece survived). Either way the concatenation round-trips and
    // no <unk> appears.
    val s1 = seg("abab")
    assert(s1.mkString == s"${B}abab")
    assert(!s1.contains(UnigramOps.Unk))
    assert(s1.length <= 3, s"char-fragmented segmentation: $s1")
    // unknown char: one <unk> per unseen char, known neighbors unaffected
    val s2 = seg("axb")
    assert(s2.count(_ == UnigramOps.Unk) == 1)
    assert(UnigramOps.decode(
      UnigramOps.segmentWord(s"${B}ab", id, model.pieces, model.maxPieceLen).toSeq,
      model.pieces) == Vector("ab"))
  }

  test("astral-plane chars: surrogate pairs are single code points end-to-end") {
    // ADVICE r13: a supplementary-plane char has String length 2 — the
    // prune protection, the seed's char bucket, and the <unk> fallback
    // must all treat it as ONE character, never as two lone surrogates.
    val emoji = new String(Character.toChars(0x1F600)) // 😀, length 2
    val cjkB = new String(Character.toChars(0x20BB7))  // 𠮷, length 2
    val hist = Seq(s"$B${emoji}ab" -> 10L, s"$B$emoji" -> 5L, s"${B}ab" -> 8L)

    // seeding: the pair lands in the char bucket intact; NO lone surrogate
    // piece is ever manufactured by substring enumeration
    val seeds = UnigramOps.seedCandidates(hist, maxPieceLen = 3, seedSize = 100)
    assert(seeds.exists(_._1 == emoji), "astral char missing from seed chars")
    // an UNPAIRED surrogate surfaces as a code point in the D800-DFFF gap
    assert(seeds.forall(_._1.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF)),
      s"lone-surrogate piece seeded: ${seeds.map(_._1)}")

    // prune protection: squeeze the vocab so every multi-code-point piece
    // must go — the astral char survives as an unprunable "character"
    val scored = UnigramOps.trainPieces(hist, vocabSize = 5, maxPieceLen = 3,
      seedSize = 100, emIters = 2)
    // charset = {▁, 😀, a, b} — exactly the 4 surviving pieces
    assert(scored.map(_._1).toSet == Set(B.toString, emoji, "a", "b"))

    // <unk> fallback: an astral char OUTSIDE the vocab is one <unk>, and
    // segmentation never splits its surrogate pair
    val model = UnigramOps.buildModel(scored)
    val id = new java.util.HashMap[String, Int]()
    model.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
    val segKnown = UnigramOps.segmentWord(s"$B${emoji}ab", id, model.pieces, model.maxPieceLen)
    assert(segKnown.forall(_ != 0), "trained astral char must not emit <unk>")
    assert(UnigramOps.decode(segKnown.toSeq, model.pieces).mkString(" ").contains(emoji))
    val segUnknown = UnigramOps.segmentWord(s"$B$cjkB", id, model.pieces, model.maxPieceLen)
    assert(segUnknown.count(_ == 0) == 1,
      s"one unknown astral char must emit exactly one <unk>, got ${segUnknown.toSeq}")
  }

  test("tokenCounts: hand-checked counts, null text, unknown chars") {
    import spark.implicits._
    val model = UnigramOps.UnigramModel(Vector(
      (UnigramOps.Unk, -20.0), (s"${B}ab", -0.5), (B.toString, -2.0),
      ("a", -1.0), ("b", -1.5)))
    val docs = Seq((1L, "ab ab"), (2L, "ba"), (3L, null.asInstanceOf[String]),
      (4L, "zz")).toDF("doc_id", "text")
    val out = UnigramOps.tokenCounts(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    // doc 1: "▁ab" piece twice → 2 words, 2 tokens, 0 unk
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2 && out(0).getLong(3) == 0)
    // doc 2: "▁ba" → ▁ + b + a = 3 tokens (no ▁b / ba pieces)
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == 3 && out(1).getLong(3) == 0)
    // doc 3: null → 0/0/0
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 0 && out(2).getLong(3) == 0)
    // doc 4: ▁ + <unk> + <unk>
    assert(out(3).getLong(1) == 1 && out(3).getLong(2) == 3 && out(3).getLong(3) == 2)
  }

  test("withPieceIds round-trips the sf0.001 word stream through decode") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = UnigramOps.trainModel(docs, "text", vocabSize = 256)
    val got = UnigramOps.withPieceIds(
        docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")),
        "text", model, "ids")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val text = Option(r.getString(1)).getOrElse("").toLowerCase
      val words = text.split(' ').toVector.filter(_.nonEmpty)
      val ids = r.getSeq[Int](2)
      // training corpus ⇒ all chars in-vocab ⇒ zero <unk>, exact round-trip
      assert(!ids.contains(0), s"unexpected <unk> in doc ${r.getLong(0)}")
      assert(UnigramOps.decode(ids, model.pieces) == words,
        s"decode mismatch for doc ${r.getLong(0)}")
    }
    // fertility sanity: token count within [words, marked char count]
    val counts = UnigramOps.tokenCounts(docs, "doc_id", "text", model).collect()
    counts.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))
      assert(r.getLong(3) == 0L)
    }
  }

  test("q102 output schema and zero-unk guarantee on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val out = SparkEntry.queries("q102_unigram_tokens")(spark, sfDir)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_words", "n_unigram_tokens", "n_unk"))
    import org.apache.spark.sql.functions.{sum, col}
    val agg = out.agg(sum(col("n_unk")), sum(col("n_unigram_tokens"))).collect()(0)
    assert(agg.getLong(0) == 0L, "training-corpus docs must have zero <unk>")
    assert(agg.getLong(1) > 0L)
  }

  test("histogram-cap coverage: chars seen only in dropped word types stay in-vocab") {
    import spark.implicits._
    // "aa" dominates the histogram; with maxWordTypes = 1 the word "zq"
    // is DROPPED from training, so 'z'/'q' never reach the seed — the
    // required-character coverage must still inject them and keep the
    // training corpus at zero <unk>
    val docs = Seq((1L, "aa aa aa aa"), (2L, "zq")).toDF("doc_id", "text")
    val model = UnigramOps.trainModel(docs, "text", vocabSize = 8,
      maxWordTypes = 1)
    val strs = model.pieces.map(_._1).toSet
    assert(Set("z", "q").subsetOf(strs), s"injected chars missing: $strs")
    val out = UnigramOps.tokenCounts(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(3) == 0L), "training corpus must be zero-<unk>")
    // injected chars score above <unk> but below every learned piece
    val zScore = model.pieces.find(_._1 == "z").get._2
    assert(zScore > model.pieces(0)._2)
    assert(model.pieces.filter(p => p._1 != "z" && p._1 != "q" &&
      p._1 != UnigramOps.Unk).forall(_._2 >= zScore))
  }

  test("literal U+2581 in input: tokenizes zero-unk, decode collision is pinned") {
    import spark.implicits._
    val docs = Seq((1L, s"a${B}b ab")).toDF("doc_id", "text")
    val model = UnigramOps.trainModel(docs, "text", vocabSize = 16)
    val counts = UnigramOps.tokenCounts(docs, "doc_id", "text", model).collect()(0)
    assert(counts.getLong(3) == 0L, "literal marker char must be in-vocab")
    // the decode ambiguity is a documented contract: the literal marker
    // splits like a word boundary, so "a▁b" decodes as two words
    val id = new java.util.HashMap[String, Int]()
    model.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
    val ids = UnigramOps.segmentWord(s"${B}a${B}b", id, model.pieces, model.maxPieceLen)
    assert(!ids.contains(0))
    assert(UnigramOps.decode(ids.toSeq, model.pieces) == Vector("a", "b"))
  }

  test("saveModel/loadModel round-trips the model exactly; foreign dirs are rejected") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val model = UnigramOps.trainModel(docs, "text", vocabSize = 128)
    val dir = java.nio.file.Files.createTempDirectory("uni_model").toString
    UnigramOps.saveModel(spark, model, dir)
    val loaded = UnigramOps.loadModel(spark, dir)
    assert(loaded == model)
    // the loaded model tokenizes identically
    import org.apache.spark.sql.functions.col
    val a = UnigramOps.tokenCounts(docs, "doc_id", "text", model)
      .orderBy(col("doc_id")).collect().toSeq
    val b = UnigramOps.tokenCounts(docs, "doc_id", "text", loaded)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
    // a non-unigram dir is rejected loudly, not mis-parsed
    import spark.implicits._
    val bogus = java.nio.file.Files.createTempDirectory("uni_bogus").toString
    Seq((0, "notunk", -1.0)).toDF("id", "piece", "logp")
      .write.parquet(s"$bogus/pieces")
    val e = intercept[IllegalArgumentException](UnigramOps.loadModel(spark, bogus))
    assert(e.getMessage.contains("unigram"))
  }

  test("q102 golden parquet matches a live recompute on sf0.01") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val golden102 = "src/test/resources/golden/q102_unigram_tokens.parquet"
    assume(new java.io.File(golden102).exists(), s"$golden102 not generated yet")
    val live = SparkEntry.queries("q102_unigram_tokens")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val golden = spark.read.parquet(golden102)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(golden.nonEmpty, "golden file is empty")
    assert(live == golden,
      "q102 golden is STALE — regenerate per the q102 oracle comment in " +
        "PipelineQueries before the driver's compare runs")
  }
}
