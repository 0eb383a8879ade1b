package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised document-quality classification — the model-BASED filter one
  * step past the n-gram LM gate ([[QualityLM]]): a multinomial Naive Bayes
  * classifier over hashed bag-of-token features, the fastText/DCLM-family
  * design (Joulin et al. 2016, arXiv 1607.01759; Li et al. 2024 DCLM uses
  * exactly this shape as its quality filter). Train on a labeled slice
  * (e.g. reference-corpus vs random-crawl), classify the whole corpus.
  *
  * Features are md5-bucketed tokens (the q103/DSIR convention — the first
  * 8 md5-hex chars mod `buckets`, reproducible on any engine), and every
  * log2 is INTEGER-QUANTIZED via binary-string bit length
  * (`length(bin(x)) − 1` = ⌊log2 x⌋), so class scores are exact BIGINT
  * arithmetic end-to-end, engine-portable bit-for-bit:
  *
  *   score_q(doc, c) = ⌊log2(docs_c + 1)⌋ − ⌊log2(N + C)⌋        (prior)
  *                   + Σ_b n_b · ⌊log2(cnt_{c,b} + 1)⌋            (evidence)
  *                   − n_tokens · ⌊log2(toks_c + B)⌋              (add-one
  *                     smoothing denominator, mirroring log p(b|c) =
  *                     log(cnt+1) − log(toks_c+B))
  *
  * label = argmax_c score_q, ties broken by ascending class name —
  * deterministic under any partitioning. Token-free docs score the prior
  * alone.
  *
  * Scale shape (100 TB corpus): the model is (buckets × classes)-bounded
  * — it BROADCASTS; classification is one zero-shuffle featurization
  * projection, one (doc, bucket)-keyed aggregate, one broadcast join, and
  * one doc-keyed aggregate. No training aggregate ever re-runs per
  * consumer (localCheckpointed frames / lazy saved-model reads).
  */
object QualityNB {

  /** A trained NB model: per-(class, bucket) token counts (`cls, b, cnt`),
    * per-class meta (`cls, docs, toks`), and the feature-bucket count.
    * Both frames are model-scale and broadcast at classification time. */
  final case class Model(weights: DataFrame, classMeta: DataFrame, buckets: Int)

  // feature hash + quantized log: the SHARED cross-engine conventions
  // ([[TrainingSet.md5Bucket]] / [[TrainingSet.flog2q]] — one definition,
  // every oracle-paired consumer stays bit-identical)
  private def bucketOf(tok: Column, buckets: Int): Column = TrainingSet.md5Bucket(tok, buckets)
  private def flog2(x: Column): Column = TrainingSet.flog2q(x)
  /** Driver-side ⌊log2 x⌋ for the per-class constants (x ≥ 1). */
  private def flog2L(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Trains on a labeled frame: ONE featurization pass (token explode +
    * bucket hash), one (class, bucket) aggregate, one class aggregate.
    * NULL labels are rejected loudly — a silently-dropped class would
    * skew every prior. */
  def train(labeled: DataFrame, idCol: String, textCol: String, labelCol: String,
            buckets: Int = 4096): Model = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val par = labeled.sparkSession.sessionState.conf.numShufflePartitions
    // the NULL guard lives on the ROW, not the token-explode path: a
    // NULL-label doc with no tokens would otherwise skip the explode-side
    // raise_error entirely and poison classMeta with a NULL class
    // (review finding r16)
    val guarded = coalesce(col(labelCol).cast("string"), raise_error(lit(
      s"QualityNB.train: NULL $labelCol — every training doc needs a class")))
    // spread by the UNIQUE doc id, not the text (ADVICE r18 / VERDICT r18
    // "what's wrong" #1): a pre-dedup corpus is exactly where exact-duplicate
    // documents are heavy, and hashing by text lands every copy of a hot
    // boilerplate document on ONE partition — serializing the token kernel
    // the spread exists to parallelize. Ids are unique by contract.
    val spread = labeled.repartition(par, col(idCol))
      .select(guarded.as("cls"), col(textCol).as("__text"))
    val inst = spread.select(col("cls"),
        explode(TextOps.tokens(col("__text"))).as("tok"))
      .select(col("cls"), bucketOf(col("tok"), buckets).as("b"))
    // fresh aliases after the checkpoint: the LogicalRDD keeps its source
    // lineage's attribute ids, and joining it back against an aggregate
    // over that same lineage (meta below) trips the analyzer's
    // conflicting-references error — the re-projection mints new ids
    val w = inst.groupBy(col("cls"), col("b")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
      .select(col("cls").as("cls"), col("b").as("b"), col("cnt").as("cnt"))
    // per-class doc counts + token totals; a class whose docs are all
    // token-free still carries its prior (left join, toks 0)
    val tokTotals = w.groupBy(col("cls")).agg(sum(col("cnt")).as("toks"))
      .select(col("cls").as("__tok_cls"), col("toks"))
    // per-class doc counts straight off the labeled frame: the count needs
    // no token kernel, so routing it through `spread` shuffled the full
    // document TEXT a second time just to count rows per class (guide §2.3
    // — shuffle keys, not payloads; partial aggregation moves ≤ classes
    // rows per map task)
    val meta = labeled.select(guarded.as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("docs"))
      .join(tokTotals, col("cls") === col("__tok_cls"), "left")
      .select(col("cls"), col("docs"), coalesce(col("toks"), lit(0L)).as("toks"))
      .localCheckpoint(true)
    Model(w, meta, buckets)
  }

  /** Classifies every document: `(idCol, keep…, n_tokens,
    * score_<cls>… , label)` with one BIGINT score column per class
    * (ascending class-name order). All input docs appear in the output
    * (left-join spine; ids unique by contract). */
  def classify(docs: DataFrame, idCol: String, textCol: String, model: Model,
               keep: Seq[String] = Nil): DataFrame = {
    // model-scale driver reads (the QualityLM model-meta convention):
    // class list + per-class constants
    val metaRows0 = model.classMeta.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(metaRows0.nonEmpty, "QualityNB.classify: empty model")
    require(metaRows0.forall(_._1 != null),
      "QualityNB.classify: model carries a NULL class (foreign/corrupt model dir)")
    val metaRows = metaRows0.sortBy(_._1)
    val classes = metaRows.map(_._1)
    val nDocs = metaRows.map(_._2).sum
    val priorQ: Map[String, Long] = metaRows.map { case (c, d, _) =>
      c -> (flog2L(d + 1) - flog2L(nDocs + classes.size)) }.toMap
    val tokQ: Map[String, Long] = metaRows.map { case (c, _, tk) =>
      c -> flog2L(tk + model.buckets) }.toMap

    // bucket-wide weight table: one row per bucket, one count column per
    // class — the broadcast side stays ≤ `buckets` rows and the per-doc
    // evidence sums land in ONE doc-keyed aggregate (no ×classes row
    // multiplication). Internal columns key by class INDEX, never by the
    // label value: a label containing dots/backticks would break col()
    // resolution (review finding r16) — label text only appears in the
    // FINAL aliases, which are never re-parsed
    val ci = classes.indices
    val wide = ci.map(i => model.weights.filter(col("cls") === classes(i))
        .select(col("b"), col("cnt").as(s"__w_$i")))
      .reduce((a, b) => a.join(b, Seq("b"), "full_outer"))

    val par = docs.sparkSession.sessionState.conf.numShufflePartitions
    val dbc = docs.repartition(par, col(idCol))
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), bucketOf(col("tok"), model.buckets).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
    val evidence = dbc.join(broadcast(wide), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("__nt"),
        ci.map(i => sum(col("n") *
          flog2(coalesce(col(s"__w_$i"), lit(0L)) + 1)).as(s"__s_$i")): _*)

    val scored = docs.select((idCol +: keep).map(col): _*)
      .join(evidence, Seq(idCol), "left")
    val scoreCols = ci.map(i =>
      (coalesce(col(s"__s_$i"), lit(0L)) -
        coalesce(col("__nt"), lit(0L)) * lit(tokQ(classes(i))) +
        lit(priorQ(classes(i)))).as(s"__score_$i"))
    val withScores = scored.select(
      (idCol +: keep).map(col) ++ (coalesce(col("__nt"), lit(0L)).as("n_tokens") +: scoreCols): _*)
    // argmax with ties to the ascending-first class: strict > keeps the
    // earlier (lexicographically smaller) class on equal scores
    val label = ci.tail.foldLeft(
      (col("__score_0"), lit(classes.head): Column)) {
      case ((bestS, bestC), i) =>
        (when(col(s"__score_$i") > bestS, col(s"__score_$i")).otherwise(bestS),
          when(col(s"__score_$i") > bestS, lit(classes(i))).otherwise(bestC))
    }._2
    withScores.select(
      ((idCol +: keep).map(col) :+ col("n_tokens")) ++
        ci.map(i => col(s"__score_$i").as(s"score_${classes(i)}")) :+
        label.as("label"): _*)
  }

  /** Persists a trained model as plain parquet under `path` (`weights`,
    * `classes`, `meta`) — train once, ship the model to every
    * classification job (the [[QualityLM.saveModel]] convention; any
    * engine or the DuckDB oracle can read the tables). */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.weights.select("cls", "b", "cnt")
      .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
    model.classMeta.select("cls", "docs", "toks")
      .repartition(1).write.mode("overwrite").parquet(s"$path/classes")
    Seq(("family", "qnb"), ("buckets", model.buckets.toString))
      .toDF("key", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Loads a [[saveModel]] dir; the count frames stay lazy parquet reads
    * (they broadcast at classification time) — applying a saved model
    * runs ZERO training jobs. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    require(meta.get("family").contains("qnb"),
      s"$path is not a graft NB classifier model dir (family=${meta.get("family")})")
    Model(spark.read.parquet(s"$path/weights"),
      spark.read.parquet(s"$path/classes"),
      meta("buckets").toInt)
  }
}
