package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Deterministic unigram-LM tokenizer (Kudo 2018, arXiv 1804.10959 — the
  * SentencePiece algorithm the Llama-family pipelines ship): train + apply,
  * completing the repo's tokenizer families (char BPE q94, byte BPE q101,
  * unigram q102). Words carry the SentencePiece word-boundary marker `▁` as
  * their first character, so a document's piece-id stream round-trips to
  * the exact word stream (the decode gate) without BPE's `</w>` suffix.
  *
  * Training is the public histogram formulation (the one HuggingFace
  * `tokenizers`' UnigramTrainer implements): seed a large candidate
  * vocabulary from frequent word substrings, run EM over the word-type
  * histogram (E-step = forward-backward over each word's segmentation
  * lattice, M-step = maximum-likelihood piece probabilities), then prune
  * the lowest-loss pieces — loss(p) = E[count(p)] · (logP(p) − bestAlt(p)),
  * bestAlt = the best segmentation of p's own string WITHOUT p — in 20%
  * rounds until the target vocabulary size holds. Single characters seen
  * in training are never pruned, so every training-charset word always has
  * a segmentation. Determinism contract: fixed word order (the capped
  * histogram's), fixed span order, array-indexed accumulators — the model
  * is a pure function of (histogram, vocabSize, maxPieceLen, seedSize,
  * emIters) under IEEE-754 doubles.
  *
  * 100 TB posture — identical to [[BpeOps]]: ONE map-side-combined
  * word-type histogram is the only corpus-scale job (capped at
  * `maxWordTypes`, most-frequent-first — the published trainers all bound
  * their histograms); EM + pruning run on vocabulary-scale driver data;
  * apply broadcasts the piece table (a few KB) and Viterbi-segments per
  * partition with a bounded word→ids memo — zero shuffle.
  */
object UnigramOps {

  /** SentencePiece word-boundary marker: prefixes every word before
    * segmentation, so piece streams preserve word boundaries.
    *
    * A LITERAL U+2581 inside input text is tokenized exactly like any
    * other character (it enters the training charset, so zero-`<unk>`
    * still holds) — but [[decode]] cannot distinguish it from the marker,
    * so documents containing the literal char round-trip ambiguously
    * (real SentencePiece has the same in-band marker and resolves it by
    * input normalization; this engine's contract is tokenize-exactly,
    * decode-up-to-marker-collision, pinned by a spec vector). */
  val Boundary = '▁' // ▁

  /** Vocabulary id 0: emitted for characters outside the training charset;
    * scored at `min(piece scores) − 10` (the SentencePiece convention). */
  val Unk = "<unk>"

  /** Apply-side memo bound (word types per partition) — same rationale as
    * [[BpeOps.MemoCap]]: a pure cache, full clear at the cap is sound. */
  val MemoCap = 1 << 18

  /** Trained model: `pieces(id) = (piece string, log-probability)`;
    * `pieces(0)` is [[Unk]] with the unk penalty score. Ids after 0 are
    * assigned by (score desc, piece asc) — a pure function of the model. */
  final case class UnigramModel(pieces: Vector[(String, Double)]) {
    require(pieces.nonEmpty && pieces.head._1 == Unk, "pieces(0) must be <unk>")
    // the Viterbi scan window — over REAL pieces only ([[Unk]]'s 5-char
    // sentinel string is never in the id map and must not widen the scan)
    val maxPieceLen: Int =
      pieces.iterator.drop(1).map(_._1.length).foldLeft(1)(math.max)
  }

  private val NegInf = Double.NegativeInfinity

  /** True when code-unit index `k` falls INSIDE a surrogate pair of `w` —
    * a substring boundary there would manufacture lone-surrogate pieces
    * (ADVICE r13: supplementary-plane characters are one code point but
    * two UTF-16 code units; all piece boundaries must respect that). */
  private def splitsPair(w: String, k: Int): Boolean =
    k > 0 && k < w.length &&
      Character.isHighSurrogate(w.charAt(k - 1)) && Character.isLowSurrogate(w.charAt(k))

  /** "Single character" in the user-visible sense: one CODE POINT — an
    * emoji or rare-CJK piece of String length 2 still counts. */
  private def isSingleCodePoint(s: String): Boolean =
    s.nonEmpty && s.codePointCount(0, s.length) == 1

  private def logSumExp(a: Double, b: Double): Double =
    if (a == NegInf) b
    else if (b == NegInf) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Seed candidates from a (boundary-marked) word histogram: every
    * surrogate-pair-respecting substring up to `maxPieceLen` CODE UNITS,
    * scored by weighted occurrence count; ALL single CODE POINTS kept
    * (an astral character of String length 2 is a "char" here), plus the
    * top `seedSize` multi-code-point substrings by (count desc, piece
    * asc). Returns (piece, count) in the seed's deterministic order:
    * chars ascending, then chosen multi-char pieces by the same
    * (count desc, piece asc) rank. */
  def seedCandidates(markedCounts: Seq[(String, Long)], maxPieceLen: Int,
                     seedSize: Int): Vector[(String, Double)] = {
    val freq = new java.util.HashMap[String, Double]()
    markedCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        if (!splitsPair(w, i)) {
          var j = i + 1
          val jMax = math.min(i + maxPieceLen, w.length)
          while (j <= jMax) {
            if (!splitsPair(w, j)) freq.merge(w.substring(i, j), c.toDouble, (a, b) => a + b)
            j += 1
          }
        }
        i += 1
      }
    }
    val all = {
      import scala.jdk.CollectionConverters._
      freq.asScala.toVector
    }
    val chars = all.filter(p => isSingleCodePoint(p._1)).sortBy(_._1)
    val multi = all.filter(p => !isSingleCodePoint(p._1))
      .sortBy { case (p, c) => (-c, p) }
      .take(seedSize)
    chars ++ multi
  }

  /** One EM iteration over the histogram: forward-backward expected piece
    * counts (E) then maximum-likelihood re-estimation (M). `pieces` and
    * `logp` are parallel; returns the new log-probs and the expected
    * counts (for the subsequent prune). All accumulation is array-indexed
    * in fixed order — deterministic. */
  private def emStep(words: Array[(String, Long)], pieces: Vector[String],
                     logp: Array[Double], maxPieceLen: Int):
      (Array[Double], Array[Double]) = {
    val id = new java.util.HashMap[String, Int](pieces.size * 2)
    pieces.zipWithIndex.foreach { case (p, i) => id.put(p, i) }
    val expected = new Array[Double](pieces.size)
    words.foreach { case (w, c) =>
      val n = w.length
      val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          if (alpha(j) != NegInf) {
            val pid = id.getOrDefault(w.substring(j, i), -1)
            if (pid >= 0) alpha(i) = logSumExp(alpha(i), alpha(j) + logp(pid))
          }
          j += 1
        }
        i += 1
      }
      val z = alpha(n)
      if (z != NegInf) { // always segmentable: chars are seeded + unpruned
        val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
        i = n - 1
        while (i >= 0) {
          var j = i + 1
          val jMax = math.min(i + maxPieceLen, n)
          while (j <= jMax) {
            if (beta(j) != NegInf) {
              val pid = id.getOrDefault(w.substring(i, j), -1)
              if (pid >= 0) beta(i) = logSumExp(beta(i), logp(pid) + beta(j))
            }
            j += 1
          }
          i -= 1
        }
        i = 0
        while (i < n) {
          var j = i + 1
          val jMax = math.min(i + maxPieceLen, n)
          while (j <= jMax) {
            val pid = id.getOrDefault(w.substring(i, j), -1)
            if (pid >= 0 && alpha(i) != NegInf && beta(j) != NegInf) {
              val post = math.exp(alpha(i) + logp(pid) + beta(j) - z)
              expected(pid) += c.toDouble * post
            }
            j += 1
          }
          i += 1
        }
      }
    }
    var total = 0.0
    expected.foreach(total += _)
    val newLogp = expected.map(e => if (e > 0) math.log(e) - math.log(total) else NegInf)
    (newLogp, expected)
  }

  /** Best (Viterbi) log-prob of segmenting `s` given the piece table; when
    * `forbidFull`, the single full-span piece is excluded (the prune
    * alternative: "how well do the OTHER pieces cover this string"). */
  private def viterbiScore(s: String, id: java.util.HashMap[String, Int],
                           logp: Array[Double], maxPieceLen: Int,
                           forbidFull: Boolean): Double = {
    val n = s.length
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != NegInf && !(forbidFull && j == 0 && i == n)) {
          val pid = id.getOrDefault(s.substring(j, i), -1)
          if (pid >= 0 && logp(pid) != NegInf) {
            val sc = best(j) + logp(pid)
            if (sc > best(i)) best(i) = sc
          }
        }
        j += 1
      }
      i += 1
    }
    best(n)
  }

  /** Kudo's EM-train + prune loop over a boundary-marked word histogram.
    * Returns the final (piece, logp) table in id order (see
    * [[UnigramModel]]). Exposed for spec-level hand checks.
    *
    * The histogram is CANONICALIZED internally (count desc, word asc — the
    * [[BpeOps.histogram]] order) before any float accumulates, so the
    * model is a pure function of the histogram MULTISET: permuting the
    * input cannot shift low-order floating-point bits (a property test
    * caught exactly that drift). And because EM can drive a rarely-used
    * piece's expected count to a floating-point ZERO (posterior underflow
    * below ~1e-308 — observed on small adversarial corpora), any −∞ score
    * is floored at min-finite − 1 after the final iteration: rare-but-
    * known, above [[Unk]]'s −10 penalty, so every vocabulary piece —
    * single chars especially — stays usable by Viterbi and the
    * zero-`<unk>`-on-training-corpus guarantee survives corpora where EM
    * starves a character. */
  def trainPieces(markedCounts: Seq[(String, Long)], vocabSize: Int,
                  maxPieceLen: Int, seedSize: Int,
                  emIters: Int): Vector[(String, Double)] = {
    require(vocabSize > 1, "vocabSize must exceed the <unk> slot")
    require(emIters >= 1, "emIters must be >= 1 (pruning needs expected counts)")
    val words = markedCounts.toArray.sortBy { case (w, c) => (-c, w) }
    // seeding reads the SORTED words too: its substring counts accumulate
    // as doubles, and at 100 TB count scale (sums past 2^53) addition
    // order would otherwise leak permutation into the seed selection
    val seed = seedCandidates(words.toSeq, maxPieceLen, seedSize)
    var pieces: Vector[String] = seed.map(_._1)
    var logp: Array[Double] = {
      val total = seed.iterator.map(_._2).sum
      seed.iterator.map { case (_, c) => math.log(c) - math.log(total) }.toArray
    }
    var expected: Array[Double] = null
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) {
        val (lp, ex) = emStep(words, pieces, logp, maxPieceLen)
        logp = lp; expected = ex
        it += 1
      }
      // target excludes the <unk> slot added at model build
      if (pieces.size <= vocabSize - 1) done = true
      else {
        val id = new java.util.HashMap[String, Int](pieces.size * 2)
        pieces.zipWithIndex.foreach { case (p, i) => id.put(p, i) }
        // loss of dropping p: its expected usage times how much worse its
        // own string segments without it. Single CODE POINTS are never
        // dropped (an astral char of String length 2 is still "single");
        // dead pieces (zero expectation / -inf score) drop first for free.
        val prunable = pieces.zipWithIndex.filter(p => !isSingleCodePoint(p._1))
        val excess = pieces.size - (vocabSize - 1)
        if (excess > prunable.size) throw new IllegalArgumentException(
          s"vocabSize=$vocabSize cannot hold the " +
            s"${pieces.size - prunable.size} training characters + <unk>")
        val losses = prunable.map { case (p, pid) =>
          val loss =
            if (expected(pid) == 0.0 || logp(pid) == NegInf) NegInf
            else {
              val alt = viterbiScore(p, id, logp, maxPieceLen, forbidFull = true)
              expected(pid) * (logp(pid) - alt)
            }
          (loss, p, pid)
        }
        val k = math.min(math.max(1, (prunable.size * 2) / 10), excess)
        val drop = losses.sortBy { case (l, p, _) => (l, p) }
          .take(k).map(_._3).toSet
        val keep = pieces.zipWithIndex.filterNot { case (_, i) => drop(i) }
        pieces = keep.map(_._1)
        logp = keep.map { case (_, i) => logp(i) }.toArray
      }
    }
    // underflow floor (see Scaladoc): dead pieces revive at rare-but-known
    val minFinite = logp.foldLeft(0.0)((m, l) => if (l != NegInf) math.min(m, l) else m)
    val floored = logp.map(l => if (l == NegInf) minFinite - 1.0 else l)
    pieces.zip(floored).toVector.sortBy { case (p, l) => (-l, p) }
  }

  /** Scored pieces → model: prepends the [[Unk]] slot at the
    * SentencePiece penalty (min finite score − 10). Shared by
    * [[trainModel]] and the spec-level hand checks so the unk-score rule
    * cannot drift between production and test model assembly. */
  def buildModel(scored: Vector[(String, Double)]): UnigramModel = {
    val unkLogp = scored.iterator.map(_._2).filter(_ != NegInf)
      .foldLeft(0.0)(math.min) - 10.0
    UnigramModel((Unk, unkLogp) +: scored)
  }

  /** Corpus-wide required-character coverage (the SentencePiece
    * `required_chars` behavior): every distinct character of the
    * lowercased word stream, from one aggregate whose output is
    * charset-scale (the per-row `array_distinct` bounds the explode).
    * Spark's `split` on the empty pattern splits between CODE POINTS, so
    * a supplementary-plane character arrives as one 2-code-unit "char" —
    * consistent with [[segmentWord]]'s substring matching. */
  private def corpusChars(docs: DataFrame, textCol: String): Vector[String] =
    docs.select(explode(array_distinct(filter(
        split(coalesce(lower(col(textCol)), lit("")), ""),
        c => c =!= "" && c =!= " "))).as("ch"))
      .distinct().collect().map(_.getString(0)).sorted.toVector

  /** Phase 1+2: corpus → trained model. The histogram is [[BpeOps]]'
    * capped word-type job (the remap to boundary-marked forms happens
    * after the aggregate — prefixing is injective, nothing is lost).
    *
    * Characters appearing ONLY in word types dropped by the histogram cap
    * would otherwise be out-of-vocab ([[trainPieces]] seeds from the
    * capped histogram alone), breaking the zero-`<unk>`-on-the-training-
    * corpus guarantee at 100 TB. [[corpusChars]] closes that hole: chars
    * missing from the trained pieces are injected at a finite
    * rare-but-known floor (min finite score − 1, still above [[Unk]]'s
    * −10 penalty), making the guarantee UNCONDITIONAL — the cap bounds
    * which MULTI-CHAR pieces can be learned, never segmentability. */
  def trainModel(docs: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 6, seedSize: Int = 4096,
                 emIters: Int = 2,
                 maxWordTypes: Int = 1 << 16): UnigramModel = {
    val marked = BpeOps.histogram(docs, textCol, maxWordTypes)
      .map { case (w, c) => (s"$Boundary$w", c) }
    val scored = trainPieces(marked, vocabSize, maxPieceLen, seedSize, emIters)
    val have = scored.iterator.map(_._1).toSet
    val floor = scored.iterator.map(_._2).filter(_ != NegInf)
      .foldLeft(0.0)(math.min) - 1.0
    val missing = corpusChars(docs, textCol).filterNot(have)
      .map(c => (c, floor))
    // injected chars join the same (score desc, piece asc) id order
    buildModel((scored ++ missing).sortBy { case (p, l) => (-l, p) })
  }

  /** Viterbi-segment one boundary-marked word to piece ids. Ties prefer
    * the longest piece ending at each position (fixed scan order).
    * Characters outside the vocabulary emit id 0 ([[Unk]]) at the model's
    * unk penalty — the lattice always completes. */
  def segmentWord(marked: String, id: java.util.HashMap[String, Int],
                  pieces: Vector[(String, Double)], maxPieceLen: Int): Array[Int] = {
    val n = marked.length
    val unkLogp = pieces(0)._2
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    val backLen = new Array[Int](n + 1) // piece length chosen at i
    val backId = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      // longest-first scan: strictly-greater keeps the first (longest) tie
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != NegInf) {
          val pid = id.getOrDefault(marked.substring(j, i), -1)
          if (pid >= 0) {
            val sc = best(j) + pieces(pid)._2
            if (sc > best(i)) { best(i) = sc; backLen(i) = i - j; backId(i) = pid }
          }
        }
        j += 1
      }
      if (best(i) == NegInf) {
        // unknown char fallback: consume one CODE POINT as a single <unk>
        // (an astral char is one unknown, not a lone-surrogate pair of them)
        val step = if (splitsPair(marked, i - 1)) 2 else 1
        best(i) = best(i - step) + unkLogp; backLen(i) = step; backId(i) = 0
      }
      i += 1
    }
    val rev = Array.newBuilder[Int]
    var pos = n
    while (pos > 0) { rev += backId(pos); pos -= backLen(pos) }
    rev.result().reverse
  }

  /** Phase 3: per-document unigram token counts. Output: `idCol, n_words
    * BIGINT, n_unigram_tokens BIGINT, n_unk BIGINT` — one zero-shuffle
    * projection with the broadcast piece table and a bounded
    * per-partition word memo (the [[BpeOps.tokenCounts]] shape). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  model: UnigramModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), coalesce(lower(col(textCol)), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val id = new java.util.HashMap[String, Int](m.pieces.size * 2)
        m.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
        // memo packs (token count << 32 | unk count) into one Long — the
        // counts are all this kernel consumes, so the bounded memo holds
        // two ints per word type, not the id array (the BpeOps.tokenCounts
        // memory shape; a word's token count is bounded by its length)
        val memo = new java.util.HashMap[String, Long]()
        it.map { case (docId, text) =>
          var words = 0L; var toks = 0L; var unk = 0L
          text.split(' ').foreach { w =>
            if (w.nonEmpty) {
              words += 1
              if (memo.size >= MemoCap) memo.clear()
              val packed = memo.computeIfAbsent(w, { w1 =>
                val ids = segmentWord(s"$Boundary$w1", id, m.pieces, m.maxPieceLen)
                var u = 0L
                ids.foreach(t => if (t == 0) u += 1)
                (ids.length.toLong << 32) | u
              })
              toks += packed >>> 32
              unk += packed & 0xffffffffL
            }
          }
          (docId, words, toks, unk)
        }
      }
      .toDF(idCol, "n_words", "n_unigram_tokens", "n_unk")
  }

  /** Phase 3, id-emitting: appends `out` (`array<int>` piece ids). Word
    * boundaries live in the ids themselves (each word's first piece starts
    * with [[Boundary]]), so [[decode]] reconstructs the word stream. */
  def withPieceIds(docs: DataFrame, textCol: String, model: UnigramModel,
                   out: String): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val tmp = "__uni_lower"
    require(!docs.columns.contains(tmp), s"input already carries a $tmp column")
    require(!docs.columns.contains(out),
      s"input already carries a '$out' column — a silent duplicate field " +
        "would shadow it; pick another output name")
    val staged = docs.withColumn(tmp, coalesce(lower(col(textCol)), lit("")))
    val li = staged.schema.fieldIndex(tmp)
    val outSchema = docs.schema.add(out, ArrayType(IntegerType, containsNull = true),
      nullable = true)
    staged.mapPartitions { it =>
      val m = bc.value
      val id = new java.util.HashMap[String, Int](m.pieces.size * 2)
      m.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
      val memo = new java.util.HashMap[String, Array[Int]]()
      it.map { r =>
        val text = r.getString(li)
        val ids = Array.newBuilder[Int]
        text.split(' ').foreach { w =>
          if (w.nonEmpty) {
            if (memo.size >= MemoCap) memo.clear()
            ids ++= memo.computeIfAbsent(w,
              w1 => segmentWord(s"$Boundary$w1", id, m.pieces, m.maxPieceLen))
          }
        }
        Row.fromSeq(r.toSeq.dropRight(1) :+ ids.result().toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Inverse of [[withPieceIds]] for one document: piece ids → the word
    * stream (the round-trip gate for id sequences with no [[Unk]]). */
  def decode(ids: Seq[Int], pieces: Vector[(String, Double)]): Vector[String] = {
    val sb = new StringBuilder
    ids.foreach(i => sb.append(pieces(i)._1))
    sb.toString.split(Boundary).toVector.filter(_.nonEmpty)
  }

  /** Persists a trained model as one parquet table under `path`
    * (`pieces`: id/piece/logp) — the [[BpeOps.saveModel]] "train once,
    * ship the model" shape. Plain parquet: any engine (or the DuckDB
    * oracle) can read the table; the explicit id ordinal is the contract,
    * not parquet row order. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: UnigramModel,
                path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex.map { case ((p, lp), i) => (i, p, lp) }
      .toDF("id", "piece", "logp")
      .repartition(1).write.mode("overwrite").parquet(s"$path/pieces")
  }

  /** Loads a [[saveModel]] model; id assignment and scores are restored
    * exactly (the table carries explicit ordinals). */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): UnigramModel = {
    val pieces = spark.read.parquet(s"$path/pieces")
      .select("id", "piece", "logp").collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getDouble(2))).toVector
    require(pieces.nonEmpty && pieces(0)._1 == Unk,
      s"$path/pieces is not a graft unigram vocab (id 0 must be $Unk)")
    UnigramModel(pieces)
  }
}
