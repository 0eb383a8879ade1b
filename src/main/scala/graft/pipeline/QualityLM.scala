package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity-bucket quality filtering (Wenzek et al. 2020,
  * arXiv 1911.00359): train an n-gram LM on a REFERENCE corpus (the
  * quality anchor — CCNet uses Wikipedia), score every candidate document
  * by its per-token negative log-likelihood under that LM, and split the
  * corpus into head/middle/tail perplexity terciles — the standard
  * quality gate applied before Gopher-style rule filters, and the one
  * pretraining-pipeline family the engine was still missing (VERDICT r14).
  *
  * The LM is a bigram model with add-one smoothing; every log2 is
  * INTEGER-QUANTIZED via binary-string bit length (`length(bin(x)) − 1` =
  * ⌊log2 x⌋ — the q103/DSIR convention), so scores are exact BIGINT
  * arithmetic end-to-end, engine-portable bit-for-bit:
  *
  *   nll_q(bigram a b) = ⌊log2(c(a) + V)⌋ − ⌊log2(c(a,b) + 1)⌋   (≥ 0:
  *     c(a,b) ≤ c(a) and V ≥ 1, mirroring −log p(b|a) = log(c(a)+V)
  *     − log(c(a,b)+1) under add-one smoothing)
  *   ppl_q(doc)        = (1000 · Σ nll_q) DIV n_bigrams          (≥ 0, so
  *     truncating DIV == floor division on every engine)
  *
  * Lower ppl_q = more reference-like = higher quality (CCNet's head).
  * Documents with no bigrams (≤ 1 token) carry a NULL ppl_q and land in
  * `tail` — no evidence is not good evidence.
  *
  * Scale shape (100 TB candidate corpus): the model comes from the
  * REFERENCE slice — small by construction — so both model tables
  * broadcast; scoring is the zero-shuffle [[Dedup.shinglesRaw]] projection
  * plus two broadcast joins and one doc-keyed aggregate. Tercile
  * thresholds derive from a `ppl_q`-keyed count aggregate whose row count
  * is bounded by the quantization (ppl_q ∈ [0, 1000·64] regardless of
  * corpus size), so the cumulative window runs over a few thousand rows,
  * never the corpus.
  */
object QualityLM {

  /** A trained reference LM: bigram counts (`sh`, `cnt`), unigram counts
    * (`tok`, `cnt`) and the smoothing vocabulary size. Both frames are
    * reference-corpus-bounded and broadcast at scoring time. */
  final case class Model(bigrams: DataFrame, unigrams: DataFrame, vocabSize: Long)

  private def flog2(x: Column): Column = TrainingSet.flog2q(x)

  /** Trains the bigram LM on the reference corpus: one token-keyed and one
    * bigram-keyed aggregate, both localCheckpointed (the model is consumed
    * by every scoring pass and must not re-run its training aggregates per
    * consumer — the q77/q78 standing-frame convention). */
  def train(ref: DataFrame, idCol: String, textCol: String): Model = {
    val par = ref.sparkSession.sessionState.conf.numShufflePartitions
    val spread = ref.repartition(par, col(idCol))
    val uni = spread
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val bg = Dedup.shinglesRaw(spread, idCol, textCol, 2)
      .filter(col("sh").contains(" "))
      .groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    Model(bg, uni, uni.count())
  }

  /** Scores every document: `(idCol, keep…, n_bigrams, ppl_q)` with ppl_q
    * NULL for bigram-free docs. All input docs appear in the output
    * (left-join spine; ids unique by contract — no distinct shuffle);
    * `keep` columns ride the spine at zero extra cost (the per-group
    * bucketing path carries its group column this way). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            keep: Seq[String] = Nil): DataFrame = {
    val par = docs.sparkSession.sessionState.conf.numShufflePartitions
    val bg = Dedup.shinglesRaw(docs.repartition(par, col(idCol)), idCol, textCol, 2)
      .filter(col("sh").contains(" "))
    // per-bigram quantized nll: two broadcast lookups against the model
    val nll = bg
      .join(broadcast(model.bigrams.select(col("sh"), col("cnt").as("__cab"))),
        Seq("sh"), "left")
      .withColumn("__a", substring_index(col("sh"), " ", 1))
      .join(broadcast(model.unigrams.select(col("tok").as("__a"), col("cnt").as("__ca"))),
        Seq("__a"), "left")
      .select(col(idCol),
        (flog2(coalesce(col("__ca"), lit(0L)) + model.vocabSize) -
          flog2(coalesce(col("__cab"), lit(0L)) + 1)).as("__q"))
    val docsum = nll.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("__q")).as("__s"))
    docs.select((idCol +: keep).map(col): _*)
      .join(docsum, Seq(idCol), "left")
      .select((idCol +: keep).map(col) ++ Seq(
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        // __s ≥ 0 and __n > 0 where defined, so DIV (truncation) == floor
        // division — the same BIGINT on every engine; NULL rides through
        expr("CAST((__s * 1000) DIV __n AS BIGINT)").as("ppl_q")): _*)
  }

  /** Labels a [[score]]d frame with its head/middle/tail perplexity
    * tercile. Thresholds are exact integer rank cuts over the scored
    * corpus itself (the self-normalizing CCNet variant): t1 = smallest
    * ppl_q whose cumulative doc count reaches ⌈N/3⌉, t2 likewise for
    * 2N/3; head = ppl_q ≤ t1 (most reference-like), NULL ppl_q = tail.
    * The cumulative window runs over the ppl_q-keyed COUNT frame —
    * quantization-bounded rows, never the corpus. */
  def withBuckets(scored: DataFrame, idCol: String): DataFrame = {
    val counts = scored.filter(col("ppl_q").isNotNull)
      .groupBy(col("ppl_q")).agg(count(lit(1)).as("__n"))
    val cum = counts.withColumn("__c",
      sum(col("__n")).over(org.apache.spark.sql.expressions.Window.orderBy(col("ppl_q"))))
    val tot = counts.agg(coalesce(sum(col("__n")), lit(0L)).as("__tot"))
    val thr = cum.crossJoin(broadcast(tot)).agg(
      min(when(col("__c") * 3 >= col("__tot"), col("ppl_q"))).as("__t1"),
      min(when(col("__c") * 3 >= col("__tot") * 2, col("ppl_q"))).as("__t2"))
    scored.crossJoin(broadcast(thr))
      .select(scored.columns.map(col) :+
        when(col("ppl_q").isNull, lit("tail"))
          .when(col("ppl_q") <= col("__t1"), lit("head"))
          .when(col("ppl_q") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"): _*)
  }

  /** Train-free scoring + bucketing against a given model. */
  def buckets(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame =
    withBuckets(score(docs, idCol, textCol, model), idCol)

  /** PER-GROUP tercile labeling — the actual CCNet design point:
    * thresholds are computed per language (Wenzek et al. 2020 §4.2), not
    * globally, because a global cut tilts every bucket toward the
    * languages closest to the reference corpus and drowns the rest in
    * `tail`. Same exact integer rank cuts as [[withBuckets]], applied
    * within each `groupCol` value; the count frame is (groups ×
    * quantized scores)-bounded and the per-group threshold frame (one
    * row per group) broadcasts onto the scored corpus. NULL groups get
    * their own terciles (null-safe join). */
  def withBucketsBy(scored: DataFrame, groupCol: String): DataFrame = {
    val counts = scored.filter(col("ppl_q").isNotNull)
      .groupBy(col(groupCol), col("ppl_q")).agg(count(lit(1)).as("__n"))
    val cum = counts.withColumn("__c",
      sum(col("__n")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("ppl_q"))))
      // group total as a second window over the SAME tiny frame — an
      // aggregate + equi-join here would silently drop the NULL group
      // (USING-join null semantics), breaking the null-safe contract below
      .withColumn("__tot", sum(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    val thr = cum
      .groupBy(col(groupCol)).agg(
        min(when(col("__c") * 3 >= col("__tot"), col("ppl_q"))).as("__t1"),
        min(when(col("__c") * 3 >= col("__tot") * 2, col("ppl_q"))).as("__t2"))
    scored.as("s")
      .join(broadcast(thr.as("t")), col(s"s.$groupCol") <=> col(s"t.$groupCol"), "left")
      .select(scored.columns.map(c => col(s"s.$c")) :+
        when(col("s.ppl_q").isNull, lit("tail"))
          .when(col("s.ppl_q") <= col("t.__t1"), lit("head"))
          .when(col("s.ppl_q") <= col("t.__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"): _*)
  }

  /** Train-free scoring + PER-GROUP bucketing: `groupCol` (typically the
    * language) rides the scoring spine, terciles cut within each group. */
  def bucketsBy(docs: DataFrame, idCol: String, textCol: String, groupCol: String,
                model: Model): DataFrame =
    withBucketsBy(score(docs, idCol, textCol, model, keep = Seq(groupCol)), groupCol)

  /** Persists a trained model as plain parquet under `path` (`bigrams`,
    * `unigrams`, `meta`) — train once on the reference corpus, ship the
    * model to every scoring job (the [[BpeOps.saveModel]] convention; any
    * engine or the DuckDB oracle can read the tables). */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.bigrams.select("sh", "cnt")
      .repartition(1).write.mode("overwrite").parquet(s"$path/bigrams")
    model.unigrams.select("tok", "cnt")
      .repartition(1).write.mode("overwrite").parquet(s"$path/unigrams")
    Seq(("family", "qlm"), ("vocab_size", model.vocabSize.toString))
      .toDF("key", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Loads a [[saveModel]] dir; the count frames stay lazy parquet reads
    * (they broadcast at scoring time), only the scalar vocab size is
    * materialized. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    require(meta.get("family").contains("qlm"),
      s"$path is not a graft quality-LM model dir (family=${meta.get("family")})")
    Model(spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/unigrams"),
      meta("vocab_size").toLong)
  }
}
