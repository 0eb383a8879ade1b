package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer: train + apply — real
  * subword token counts for the budget/packing operators instead of
  * whitespace word counts. The algorithm is the public Sennrich et al.
  * 2016 formulation (arXiv 1508.07909): start from characters plus an
  * end-of-word marker, repeatedly merge the most frequent adjacent symbol
  * pair (ties broken by lexicographically smallest pair — the exactness
  * contract every engine can reproduce), to a fixed merge budget.
  *
  * 100 TB posture, in three strictly separated phases:
  *   1. WORD-TYPE HISTOGRAM — one map-side-combined hash aggregate over
  *      the corpus (`explode(tokens) → groupBy(word) → count`). The only
  *      corpus-scale job; output is vocabulary-scale, not corpus-scale.
  *   2. MERGE TRAINING — driver-side exact-integer loop over the
  *      histogram, CAPPED at `maxWordTypes` word types (most frequent
  *      first, ties by word ascending — deterministic). The cap is the
  *      scale path: a 100 TB corpus has unbounded distinct types (typos,
  *      ids), and every public BPE trainer bounds or pre-filters its
  *      histogram; the cap rule is part of the algorithm definition, so
  *      the result stays engine-exact. O(V·L·merges) integer work.
  *   3. APPLY — the merge table (a few KB) broadcasts; each executor
  *      tokenizes per partition with a per-partition word→count memo
  *      (word types repeat massively, so apply is amortized O(1) per
  *      occurrence). No shuffle at all.
  */
object BpeOps {

  /** End-of-word marker symbol (the Sennrich formulation). */
  val Eow = "</w>"

  /** Ordered merge list: element i is the pair merged at rank i. */
  type Merges = Vector[(String, String)]

  /** Exact-integer BPE merge training over a word-type histogram.
    * `wordCounts`: (word type, occurrence count); the histogram order does
    * not matter — ties are broken by pair content, never input order. */
  def trainMerges(wordCounts: Seq[(String, Long)], numMerges: Int): Merges = {
    // symbol sequences per word type (chars + end-of-word marker)
    var words: Vector[(Array[String], Long)] = wordCounts.toVector.map {
      case (w, c) => (w.map(_.toString).toArray :+ Eow, c)
    }
    val out = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      // exact pair counts this round
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties by lexicographically smallest (a, b)
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
          if (syms.length < 2) (syms, c)
          else {
            val b = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                b += merged; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), c)
          }
        }
        m += 1
      }
    }
    out.result()
  }

  /** Tokenize one word with a trained merge table (rank = priority):
    * repeatedly merge the present pair with the lowest rank until no
    * mergeable pair remains — exactly inverts training order. */
  def tokenizeWord(word: String, rank: collection.Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ Eow
    var go = true
    while (go && syms.length > 1) {
      var bestI = -1
      var bestR = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestR) { bestR = r; bestI = i }
        i += 1
      }
      if (bestI < 0) go = false
      else syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++ syms.drop(bestI + 2)
    }
    syms
  }

  /** Phase 1+2: corpus → trained merges. `tokens(textCol)` must match
    * [[TextOps]] tokenization (lowercase split on single spaces, empties
    * dropped) so word types agree with every other text operator. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWordTypes: Int = 1 << 16): Merges = {
    val hist = docs
      .select(explode(filter(split(lower(col(textCol)), " "), t => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      // deterministic cap: most frequent first, ties by word ascending.
      // Vocabulary-scale (bounded) — NOT corpus-scale — driver data.
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(hist, numMerges)
  }

  /** Phase 3: per-document BPE token counts. Output: `idCol, n_words
    * BIGINT, n_bpe_tokens BIGINT` — one zero-shuffle projection with the
    * broadcast merge table and a per-partition word memo. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Merges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = bc.value
        val memo = new java.util.HashMap[String, Int]()
        it.map { case (id, text) =>
          var words = 0L
          var toks = 0L
          text.split(' ').foreach { w =>
            if (w.nonEmpty) {
              words += 1
              toks += memo.computeIfAbsent(w, w1 => tokenizeWord(w1, rank).length)
            }
          }
          (id, words, toks)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
