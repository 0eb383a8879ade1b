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
}
