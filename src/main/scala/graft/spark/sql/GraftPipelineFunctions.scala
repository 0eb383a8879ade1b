package graft.spark.sql

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{Decimal, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{Dedup, Embeddings, TextOps, TimeSeries, TrainingSet, UrlOps}

/** SQL reachability for the LLM-data-pipeline operators (the reference
  * exposes its whole surface through SQL — `datafusion_iceberg/src/
  * planner.rs:81-116`; graft's table/MV surface already is, this closes
  * the gap for dedup/similarity/text/training-set operators).
  *
  * Two seams, both in the session's function registry via
  * [[org.apache.spark.sql.SparkSessionExtensions]]:
  *
  *   - SCALAR functions (`canonical_url`, `host_of`,
  *     `registrable_domain`): the [[UrlOps]] Column trees re-rooted on
  *     the caller's argument expression — pure codegen'd projections,
  *     exactly what the Scala API plans.
  *   - TABLE-VALUED functions (`minhash_pairs`, `dup_clusters`,
  *     `leakage_split`, `jaccard_join`, `containment_join`,
  *     `simhash_pairs`, `exact_clusters`, `bpe_token_counts`,
  *     `pack_token_ids`, `quality_score`, `cap_per_group`): the
  *     operator's DataFrame pipeline over `spark.table(name)` —
  *     table/view NAMES as string literals, because Spark's injected
  *     TVFs receive scalar expressions, not relations. The returned plan
  *     is the SAME logical plan the Scala API builds, so every
  *     plan-shape gate (bucketed joins, WindowGroupLimit,
  *     zero-cartesian) carries over verbatim.
  *
  * CALL semantics, not view semantics: a TVF builder runs at ANALYSIS
  * time, and the stateful operators do driver-side work there —
  * `dup_clusters`/`leakage_split` run the clustering loop,
  * `bpe_token_counts`/`pack_token_ids` train the tokenizer. To keep
  * EXPLAIN and re-issued SQL (dashboards re-parsing the same text) from
  * silently re-running minutes of work, the driver-side-work TVFs MEMOIZE
  * their built plan per (function, literal args, table version): a graft
  * table's version is its current/pinned snapshot id, a view's the
  * semantic hash of its resolved plan — so a table mutation (INSERT, a
  * re-registered view over different data) is detected and triggers a
  * rebuild, while a verbatim re-issue serves the standing plan (the
  * `pairsCache` pattern; entries evict with their session).
  *
  * GraftSqlSpec gates a pure-SQL session reproducing q24/q47/q98/q99
  * hash-equal to the Scala API.
  */
object GraftPipelineFunctions {

  def register(ext: SparkSessionExtensions): Unit = {
    // ---- scalar: URL canonicalization family -------------------------
    scalar(ext, "canonical_url", 1) { args =>
      UrlOps.canonicalizeUrl(GraftShim.column(args.head))
    }
    scalar(ext, "host_of", 1) { args =>
      UrlOps.hostOf(GraftShim.column(args.head))
    }
    scalar(ext, "registrable_domain", 1) { args =>
      UrlOps.registrableDomain(GraftShim.column(args.head))
    }

    // ---- table-valued: dedup / training-set operators ----------------
    tvf(ext, "minhash_pairs",
      "minhash_pairs(table, id_col, text_col, threshold) — near-duplicate " +
        "pairs (id_a < id_b, jaccard) via shingle→minhash→LSH-band blocking") { args =>
      require(args.length == 4, "minhash_pairs(table, id_col, text_col, threshold)")
      Dedup.minhashNearDups(tableArg(args, 0, "minhash_pairs"),
        strArg(args, 1, "minhash_pairs"), strArg(args, 2, "minhash_pairs"),
        threshold = dblArg(args, 3, "minhash_pairs"))
    }

    memoTvf(ext, "dup_clusters",
      "dup_clusters(table, id_col, text_col, threshold) — duplicate " +
        "clusters (cluster_id, id): connected components over the minhash pairs", Seq(0)) { args =>
      require(args.length == 4, "dup_clusters(table, id_col, text_col, threshold)")
      Dedup.dupClusters(Dedup.minhashNearDups(tableArg(args, 0, "dup_clusters"),
        strArg(args, 1, "dup_clusters"), strArg(args, 2, "dup_clusters"),
        threshold = dblArg(args, 3, "dup_clusters")))
    }

    memoTvf(ext, "leakage_split",
      "leakage_split(table, id_col, text_col, threshold, train, val, test) — " +
        "cluster-keyed train/val/test split: no near-dup pair straddles splits", Seq(0)) { args =>
      require(args.length == 7,
        "leakage_split(table, id_col, text_col, threshold, train_frac, val_frac, test_frac)")
      TrainingSet.leakageFreeSplit(tableArg(args, 0, "leakage_split"),
        Dedup.minhashNearDups(tableArg(args, 0, "leakage_split"),
          strArg(args, 1, "leakage_split"), strArg(args, 2, "leakage_split"),
          threshold = dblArg(args, 3, "leakage_split")),
        strArg(args, 1, "leakage_split"),
        Seq("train" -> dblArg(args, 4, "leakage_split"),
          "val" -> dblArg(args, 5, "leakage_split"),
          "test" -> dblArg(args, 6, "leakage_split")))
    }

    memoTvf(ext, "jaccard_join",
      "jaccard_join(table, id_col, text_col, t_num, t_den) — EXACT n-gram " +
        "Jaccard self-join (AllPairs prefix + PPJoin positional filter); " +
        "integer threshold t_num/t_den keeps the test exact", Seq(0)) { args =>
      require(args.length == 5, "jaccard_join(table, id_col, text_col, t_num, t_den)")
      Dedup.jaccardJoinExact(tableArg(args, 0, "jaccard_join"),
        strArg(args, 1, "jaccard_join"), strArg(args, 2, "jaccard_join"),
        tNum = intArg(args, 3, "jaccard_join").toLong,
        tDen = intArg(args, 4, "jaccard_join").toLong)
    }

    memoTvf(ext, "containment_join",
      "containment_join(table, id_col, text_col, max_df, t_num, t_den) — " +
        "quote/subset detection: ordered pairs with |A∩B|/|A| ≥ t, blocked " +
        "on rare shingles (document frequency ≤ max_df)", Seq(0)) { args =>
      require(args.length == 6,
        "containment_join(table, id_col, text_col, max_df, t_num, t_den)")
      Dedup.containmentJoin(tableArg(args, 0, "containment_join"),
        strArg(args, 1, "containment_join"), strArg(args, 2, "containment_join"),
        maxDf = intArg(args, 3, "containment_join").toLong,
        tNum = intArg(args, 4, "containment_join").toLong,
        tDen = intArg(args, 5, "containment_join").toLong)
    }

    tvf(ext, "remove_dup_spans",
      "remove_dup_spans(table, id_col, text_col, span) — excise cross-doc " +
        "duplicate token windows (merged into maximal spans) from every " +
        "doc except the canonical minimum-id holder; emits n_tokens, " +
        "n_removed, n_spans and the rewritten cleaned_text") { args =>
      require(args.length == 4, "remove_dup_spans(table, id_col, text_col, span)")
      TextOps.removeDupSpans(tableArg(args, 0, "remove_dup_spans"),
        strArg(args, 1, "remove_dup_spans"), strArg(args, 2, "remove_dup_spans"),
        span = intArg(args, 3, "remove_dup_spans"))
    }

    tvf(ext, "simhash_pairs",
      "simhash_pairs(table, id_col, text_col, max_hamming) — SimHash-16 " +
        "near-dup pairs via pigeonhole segment blocking") { args =>
      require(args.length == 4, "simhash_pairs(table, id_col, text_col, max_hamming)")
      Dedup.simhashNearDups(
        Dedup.simhash16(tableArg(args, 0, "simhash_pairs"),
          strArg(args, 1, "simhash_pairs"), strArg(args, 2, "simhash_pairs")),
        strArg(args, 1, "simhash_pairs"),
        maxHamming = intArg(args, 3, "simhash_pairs"))
    }

    tvf(ext, "exact_clusters",
      "exact_clusters(table, id_col, content_col) — exact-duplicate groups " +
        "by content hash (md5), one row per group with members and count") { args =>
      require(args.length == 3, "exact_clusters(table, id_col, content_col)")
      Dedup.exactClusters(tableArg(args, 0, "exact_clusters"),
        strArg(args, 1, "exact_clusters"), strArg(args, 2, "exact_clusters"))
    }

    memoTvf(ext, "tokenize_apply",
      "tokenize_apply(model_dir, table, id_col, text_col) — load a " +
        "persisted tokenizer model (BPE merges/vocab — char or byte mode " +
        "per the dir's marker — or unigram pieces, sniffed from the dir) " +
        "and apply it broadcast-side: emits id_col + token_ids ARRAY<INT>. " +
        "ZERO training jobs — the train-once/ship-the-model contract " +
        "end-to-end in SQL. The model dir is an external path and assumed " +
        "immutable (the CACHE TABLE convention); the memo still rebuilds " +
        "on table mutation", Seq(1)) { args =>
      require(args.length == 4, "tokenize_apply(model_dir, table, id_col, text_col)")
      import graft.pipeline.{BpeOps, UnigramOps}
      val spark = SparkSession.active
      val dir = strArg(args, 0, "tokenize_apply")
      val idC = strArg(args, 2, "tokenize_apply")
      val textC = strArg(args, 3, "tokenize_apply")
      val docs = tableArg(args, 1, "tokenize_apply")
        .select(org.apache.spark.sql.functions.col(idC),
          org.apache.spark.sql.functions.col(textC))
      val piecesPath = new org.apache.hadoop.fs.Path(s"$dir/pieces")
      val isUnigram = piecesPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(piecesPath)
      val applied =
        if (isUnigram)
          UnigramOps.withPieceIds(docs, textC, UnigramOps.loadModel(spark, dir), "token_ids")
        else
          // byte/char dispatch rides the loaded model (BpeModel.bytes,
          // round-tripped through the dir's mode marker)
          BpeOps.withModelTokenIds(docs, textC, BpeOps.loadModel(spark, dir), "token_ids")
      applied.drop(textC)
    }

    memoTvf(ext, "bpe_token_counts",
      "bpe_token_counts(table, id_col, text_col, num_merges) — train a " +
        "deterministic BPE tokenizer on the table (capped histogram, " +
        "Sennrich merges) and emit per-row word + subword counts", Seq(0)) { args =>
      require(args.length == 4, "bpe_token_counts(table, id_col, text_col, num_merges)")
      val t = tableArg(args, 0, "bpe_token_counts")
      graft.pipeline.BpeOps.tokenCounts(t, strArg(args, 1, "bpe_token_counts"),
        strArg(args, 2, "bpe_token_counts"),
        graft.pipeline.BpeOps.train(t, strArg(args, 2, "bpe_token_counts"),
          intArg(args, 3, "bpe_token_counts")))
    }

    memoTvf(ext, "bpe_byte_token_counts",
      "bpe_byte_token_counts(table, id_col, text_col, num_merges) — train a " +
        "byte-level (GPT-2 family) BPE tokenizer on the table and emit " +
        "per-row token counts with a zero-<unk> guarantee (all 256 byte " +
        "symbols are in-vocab)", Seq(0)) { args =>
      require(args.length == 4, "bpe_byte_token_counts(table, id_col, text_col, num_merges)")
      import org.apache.spark.sql.functions.{col, size, filter => afilter}
      val t = tableArg(args, 0, "bpe_byte_token_counts")
      val idC = strArg(args, 1, "bpe_byte_token_counts")
      val textC = strArg(args, 2, "bpe_byte_token_counts")
      val model = graft.pipeline.BpeOps.trainModelBytes(t, textC,
        intArg(args, 3, "bpe_byte_token_counts"))
      graft.pipeline.BpeOps.withTokenIdsBytes(t.select(col(idC), col(textC)),
          textC, model, "__tok")
        .select(col(idC),
          size(col("__tok")).cast("long").as("n_bpe_tokens"),
          size(afilter(col("__tok"), x => x === 0)).cast("long").as("n_unk"))
    }

    memoTvf(ext, "unigram_token_counts",
      "unigram_token_counts(table, id_col, text_col, vocab_size) — train a " +
        "unigram-LM (SentencePiece / Kudo 2018) tokenizer on the table and " +
        "emit per-row word, piece, and <unk> counts (n_unk is 0 on the " +
        "training corpus: required-character coverage keeps every corpus " +
        "char in-vocab)", Seq(0)) { args =>
      require(args.length == 4, "unigram_token_counts(table, id_col, text_col, vocab_size)")
      val t = tableArg(args, 0, "unigram_token_counts")
      val textC = strArg(args, 2, "unigram_token_counts")
      graft.pipeline.UnigramOps.tokenCounts(t,
        strArg(args, 1, "unigram_token_counts"), textC,
        graft.pipeline.UnigramOps.trainModel(t, textC,
          intArg(args, 3, "unigram_token_counts")))
    }

    tvf(ext, "text_stats",
      "text_stats(table, id_col, text_col) — per-document surface " +
        "statistics (chars, tokens, type-token ratio, punct/digit ratios)") { args =>
      require(args.length == 3, "text_stats(table, id_col, text_col)")
      TextOps.textStats(tableArg(args, 0, "text_stats"),
        strArg(args, 1, "text_stats"), strArg(args, 2, "text_stats"))
    }

    tvf(ext, "lang_id",
      "lang_id(table, id_col, text_col) — heuristic language ID by " +
        "stopword-profile voting (deterministic ties)") { args =>
      require(args.length == 3, "lang_id(table, id_col, text_col)")
      TextOps.langId(tableArg(args, 0, "lang_id"),
        strArg(args, 1, "lang_id"), strArg(args, 2, "lang_id"))
    }

    tvf(ext, "gopher_rules",
      "gopher_rules(table, id_col, text_col) — Gopher-style repetition / " +
        "quality filter flags per document") { args =>
      require(args.length == 3, "gopher_rules(table, id_col, text_col)")
      TextOps.gopherRules(tableArg(args, 0, "gopher_rules"),
        strArg(args, 1, "gopher_rules"), strArg(args, 2, "gopher_rules"))
    }

    memoTvf(ext, "decontaminate",
      "decontaminate(train_table, eval_table, id_col, text_col, ngram) — " +
        "ids of train documents sharing any word n-gram with the eval set", Seq(0, 1)) { args =>
      require(args.length == 5,
        "decontaminate(train_table, eval_table, id_col, text_col, ngram)")
      TrainingSet.contaminatedIds(tableArg(args, 0, "decontaminate"),
        tableArg(args, 1, "decontaminate"), strArg(args, 2, "decontaminate"),
        strArg(args, 3, "decontaminate"), intArg(args, 4, "decontaminate"))
    }

    memoTvf(ext, "dsir_weights",
      "dsir_weights(raw_table, target_table, id_col, text_col) — DSIR " +
        "importance weights (Xie et al. 2023): score raw docs by hashed-" +
        "bigram target-likeness, integer-quantized log2 (engine-exact " +
        "BIGINTs); higher dsir_q = more target-like", Seq(0, 1)) { args =>
      require(args.length == 4,
        "dsir_weights(raw_table, target_table, id_col, text_col)")
      TrainingSet.dsirWeights(tableArg(args, 0, "dsir_weights"),
        tableArg(args, 1, "dsir_weights"), strArg(args, 2, "dsir_weights"),
        strArg(args, 3, "dsir_weights"))
    }

    memoTvf(ext, "ppl_buckets",
      "ppl_buckets(table, ref_table, id_col, text_col) — CCNet-style " +
        "perplexity quality buckets (Wenzek et al. 2020): train an add-one " +
        "bigram LM on ref_table, score every doc's integer-quantized " +
        "per-token nll, split into head/middle/tail terciles; lower ppl_q " +
        "= more reference-like", Seq(0, 1)) { args =>
      require(args.length == 4, "ppl_buckets(table, ref_table, id_col, text_col)")
      import graft.pipeline.QualityLM
      val idC = strArg(args, 2, "ppl_buckets")
      val textC = strArg(args, 3, "ppl_buckets")
      QualityLM.buckets(tableArg(args, 0, "ppl_buckets"), idC, textC,
        QualityLM.train(tableArg(args, 1, "ppl_buckets"), idC, textC))
    }

    tvf(ext, "c4_line_filter",
      "c4_line_filter(table, id_col, text_col, min_line_words, min_kept_lines)" +
        " — C4-style line-level page cleaning (Raffel et al. 2020): keep " +
        "punctuation-terminated lines of >= min_line_words words without " +
        "'javascript'; page kept iff >= min_kept_lines survive and no " +
        "'lorem ipsum' / curly brace; emits counts, verdict, cleaned_text") { args =>
      require(args.length == 5,
        "c4_line_filter(table, id_col, text_col, min_line_words, min_kept_lines)")
      graft.pipeline.TextOps.c4LineFilter(tableArg(args, 0, "c4_line_filter"),
        strArg(args, 1, "c4_line_filter"), strArg(args, 2, "c4_line_filter"),
        intArg(args, 3, "c4_line_filter"), intArg(args, 4, "c4_line_filter"))
    }

    memoTvf(ext, "ppl_buckets_by",
      "ppl_buckets_by(table, ref_table, id_col, text_col, group_col) — " +
        "ppl_buckets with PER-GROUP terciles (CCNet's per-language " +
        "thresholds): no group drowns in 'tail' for being far from the " +
        "reference corpus", Seq(0, 1)) { args =>
      require(args.length == 5,
        "ppl_buckets_by(table, ref_table, id_col, text_col, group_col)")
      import graft.pipeline.QualityLM
      val idC = strArg(args, 2, "ppl_buckets_by")
      val textC = strArg(args, 3, "ppl_buckets_by")
      QualityLM.bucketsBy(tableArg(args, 0, "ppl_buckets_by"), idC, textC,
        strArg(args, 4, "ppl_buckets_by"),
        QualityLM.train(tableArg(args, 1, "ppl_buckets_by"), idC, textC))
    }

    memoTvf(ext, "ppl_score_apply",
      "ppl_score_apply(model_dir, table, id_col, text_col) — load a " +
        "persisted quality-LM model (QualityLM.saveModel) and " +
        "score+bucket the table broadcast-side: ZERO training jobs — the " +
        "train-once/ship-the-model contract for the CCNet quality gate. " +
        "The model dir is an external path and assumed immutable", Seq(1)) { args =>
      require(args.length == 4, "ppl_score_apply(model_dir, table, id_col, text_col)")
      import graft.pipeline.QualityLM
      val spark = SparkSession.active
      QualityLM.buckets(tableArg(args, 1, "ppl_score_apply"),
        strArg(args, 2, "ppl_score_apply"), strArg(args, 3, "ppl_score_apply"),
        QualityLM.loadModel(spark, strArg(args, 0, "ppl_score_apply")))
    }

    memoTvf(ext, "nb_classify",
      "nb_classify(table, train_table, id_col, text_col, label_col) — " +
        "train a multinomial Naive Bayes doc-quality classifier " +
        "(fastText/DCLM-family: md5-bucket bag-of-token features, " +
        "integer-quantized logs) on the labeled train_table and classify " +
        "every table row: per-class BIGINT scores + argmax label",
      Seq(0, 1)) { args =>
      require(args.length == 5,
        "nb_classify(table, train_table, id_col, text_col, label_col)")
      import graft.pipeline.QualityNB
      val idC = strArg(args, 2, "nb_classify")
      val textC = strArg(args, 3, "nb_classify")
      QualityNB.classify(tableArg(args, 0, "nb_classify"), idC, textC,
        QualityNB.train(tableArg(args, 1, "nb_classify"), idC, textC,
          strArg(args, 4, "nb_classify")))
    }

    memoTvf(ext, "nb_classify_apply",
      "nb_classify_apply(model_dir, table, id_col, text_col) — load a " +
        "persisted NB classifier (QualityNB.saveModel) and classify the " +
        "table broadcast-side: ZERO training jobs — the train-once/" +
        "ship-the-model contract. The model dir is an external path and " +
        "assumed immutable", Seq(1)) { args =>
      require(args.length == 4, "nb_classify_apply(model_dir, table, id_col, text_col)")
      import graft.pipeline.QualityNB
      val spark = SparkSession.active
      QualityNB.classify(tableArg(args, 1, "nb_classify_apply"),
        strArg(args, 2, "nb_classify_apply"), strArg(args, 3, "nb_classify_apply"),
        QualityNB.loadModel(spark, strArg(args, 0, "nb_classify_apply")))
    }

    tvf(ext, "asof_join",
      "asof_join(probe_table, ref_table, keys_csv, time_col, payload_csv, " +
        "tiebreak_csv) — for each probe row, the latest ref row at-or-before " +
        "its time per key; '' tiebreak for none") { args =>
      require(args.length == 6,
        "asof_join(probe_table, ref_table, keys_csv, time_col, payload_csv, tiebreak_csv)")
      TimeSeries.asofJoin(tableArg(args, 0, "asof_join"), tableArg(args, 1, "asof_join"),
        csvArg(args, 2, "asof_join"), strArg(args, 3, "asof_join"),
        csvArg(args, 4, "asof_join"),
        tieBreak = csvArg(args, 5, "asof_join"))
    }

    tvf(ext, "range_join",
      "range_join(points_table, intervals_table, keys_csv, point_time, " +
        "start_col, end_col, bin_seconds) — points joined to every " +
        "containing [start, end] interval via epoch-bin blocking") { args =>
      require(args.length == 7, "range_join(points_table, intervals_table, " +
        "keys_csv, point_time, start_col, end_col, bin_seconds)")
      TimeSeries.rangeJoinBinned(tableArg(args, 0, "range_join"),
        tableArg(args, 1, "range_join"), csvArg(args, 2, "range_join"),
        strArg(args, 3, "range_join"), strArg(args, 4, "range_join"),
        strArg(args, 5, "range_join"), intArg(args, 6, "range_join").toLong)
    }

    tvf(ext, "sessionize",
      "sessionize(table, keys_csv, time_col, gap_expr, tiebreak_csv) — " +
        "gap-based session assignment; gap_expr is a SQL expression " +
        "(e.g. \"INTERVAL '6' HOUR\")") { args =>
      require(args.length == 5,
        "sessionize(table, keys_csv, time_col, gap_expr, tiebreak_csv)")
      TimeSeries.sessionize(tableArg(args, 0, "sessionize"),
        csvArg(args, 1, "sessionize"), strArg(args, 2, "sessionize"),
        org.apache.spark.sql.functions.expr(strArg(args, 3, "sessionize")),
        tieBreak = csvArg(args, 4, "sessionize"))
    }

    tvf(ext, "funnel",
      "funnel(table, keys_csv, time_col, step_col, steps_csv, window_expr) — " +
        "ordered step-completion times per key; window_expr is a SQL " +
        "interval expression string ('' for unbounded)") { args =>
      require(args.length == 6,
        "funnel(table, keys_csv, time_col, step_col, steps_csv, window_expr)")
      val w = strArg(args, 5, "funnel").trim
      TimeSeries.funnel(tableArg(args, 0, "funnel"), csvArg(args, 1, "funnel"),
        strArg(args, 2, "funnel"), strArg(args, 3, "funnel"),
        csvArg(args, 4, "funnel"),
        window = if (w.isEmpty) None
                 else Some(org.apache.spark.sql.functions.expr(w)))
    }

    tvf(ext, "cohort_retention",
      "cohort_retention(table, keys_csv, time_col, signup_pred) — weekly " +
        "cohort retention triangle; signup_pred is a SQL boolean " +
        "expression string marking the cohort-defining events") { args =>
      require(args.length == 4,
        "cohort_retention(table, keys_csv, time_col, signup_pred)")
      TimeSeries.cohortRetention(tableArg(args, 0, "cohort_retention"),
        csvArg(args, 1, "cohort_retention"), strArg(args, 2, "cohort_retention"),
        org.apache.spark.sql.functions.expr(strArg(args, 3, "cohort_retention")))
    }

    tvf(ext, "ann_brute",
      "ann_brute(table, id_col, emb_col, k, query_pred) — exact cosine " +
        "top-k neighbors for every row matching the query predicate " +
        "(a SQL boolean expression over the table's columns)") { args =>
      require(args.length == 5, "ann_brute(table, id_col, emb_col, k, query_pred)")
      Embeddings.bruteForceTopK(
        Embeddings.prepare(tableArg(args, 0, "ann_brute"),
          strArg(args, 1, "ann_brute"), strArg(args, 2, "ann_brute")),
        strArg(args, 1, "ann_brute"), intArg(args, 3, "ann_brute"),
        org.apache.spark.sql.functions.expr(strArg(args, 4, "ann_brute")))
    }

    memoTvf(ext, "ann_ivf",
      "ann_ivf(table, id_col, emb_col, k, cells, nprobe, query_pred) — " +
        "IVF-bucketed approximate cosine top-k: corpus vectors live in one " +
        "Voronoi cell each, queries probe their nprobe nearest cells", Seq(0)) { args =>
      require(args.length == 7,
        "ann_ivf(table, id_col, emb_col, k, cells, nprobe, query_pred)")
      Embeddings.ivfTopKProbed(
        Embeddings.prepare(tableArg(args, 0, "ann_ivf"),
          strArg(args, 1, "ann_ivf"), strArg(args, 2, "ann_ivf")),
        strArg(args, 1, "ann_ivf"), intArg(args, 3, "ann_ivf"),
        intArg(args, 4, "ann_ivf"),
        org.apache.spark.sql.functions.expr(strArg(args, 6, "ann_ivf")),
        intArg(args, 5, "ann_ivf"))
    }

    memoTvf(ext, "knn_graph",
      "knn_graph(table, id_col, emb_col, k, cells) — mutual k-NN cosine " +
        "similarity graph over IVF cells (one row per undirected edge)", Seq(0)) { args =>
      require(args.length == 5, "knn_graph(table, id_col, emb_col, k, cells)")
      Embeddings.knnGraph(
        Embeddings.prepare(tableArg(args, 0, "knn_graph"),
          strArg(args, 1, "knn_graph"), strArg(args, 2, "knn_graph")),
        strArg(args, 1, "knn_graph"), intArg(args, 3, "knn_graph"),
        intArg(args, 4, "knn_graph"))
    }

    memoTvf(ext, "pq_encode",
      "pq_encode(table, id_col, emb_col, m, k) — product-quantization codes " +
        "(Jégou 2011): each vector collapses to m codebook indices " +
        "(deterministic id-strided codebooks, exact integer argmin)", Seq(0)) { args =>
      require(args.length == 5, "pq_encode(table, id_col, emb_col, m, k)")
      Embeddings.pqEncode(
        Embeddings.prepare(tableArg(args, 0, "pq_encode"),
          strArg(args, 1, "pq_encode"), strArg(args, 2, "pq_encode")),
        strArg(args, 1, "pq_encode"), intArg(args, 3, "pq_encode"),
        intArg(args, 4, "pq_encode"))
    }

    memoTvf(ext, "pq_topk",
      "pq_topk(table, id_col, emb_col, topk, query_pred, m, k) — PQ " +
        "asymmetric-distance top-k: corpus side carries only its m codes, " +
        "queries (rows matching query_pred) rank by exact-integer ADC", Seq(0)) { args =>
      require(args.length == 7,
        "pq_topk(table, id_col, emb_col, topk, query_pred, m, k)")
      Embeddings.pqTopK(
        Embeddings.prepare(tableArg(args, 0, "pq_topk"),
          strArg(args, 1, "pq_topk"), strArg(args, 2, "pq_topk")),
        strArg(args, 1, "pq_topk"), intArg(args, 3, "pq_topk"),
        org.apache.spark.sql.functions.expr(strArg(args, 4, "pq_topk")),
        intArg(args, 5, "pq_topk"), intArg(args, 6, "pq_topk"))
    }

    memoTvf(ext, "pq_topk_ivf",
      "pq_topk_ivf(table, id_col, emb_col, topk, query_pred, cells, nprobe, " +
        "m, k) — IVFADC (Jégou 2011 §IV): queries probe their nprobe " +
        "nearest IVF cells and ADC-rank only the PQ codes binned there", Seq(0)) { args =>
      require(args.length == 9,
        "pq_topk_ivf(table, id_col, emb_col, topk, query_pred, cells, nprobe, m, k)")
      Embeddings.pqTopKIVF(
        Embeddings.prepare(tableArg(args, 0, "pq_topk_ivf"),
          strArg(args, 1, "pq_topk_ivf"), strArg(args, 2, "pq_topk_ivf")),
        strArg(args, 1, "pq_topk_ivf"), intArg(args, 3, "pq_topk_ivf"),
        org.apache.spark.sql.functions.expr(strArg(args, 4, "pq_topk_ivf")),
        intArg(args, 5, "pq_topk_ivf"), intArg(args, 6, "pq_topk_ivf"),
        intArg(args, 7, "pq_topk_ivf"), intArg(args, 8, "pq_topk_ivf"))
    }

    memoTvf(ext, "pq_topk_ivf_trained",
      "pq_topk_ivf_trained(table, id_col, emb_col, topk, query_pred, cells, " +
        "nprobe, m, k, train_iters) — Jégou-faithful IVFADC: Lloyd-trained " +
        "coarse cells (empty-cell reseeding) + PQ codes over per-cell " +
        "residuals", Seq(0)) { args =>
      require(args.length == 10,
        "pq_topk_ivf_trained(table, id_col, emb_col, topk, query_pred, cells, " +
          "nprobe, m, k, train_iters)")
      Embeddings.pqTopKIVFTrained(
        Embeddings.prepare(tableArg(args, 0, "pq_topk_ivf_trained"),
          strArg(args, 1, "pq_topk_ivf_trained"), strArg(args, 2, "pq_topk_ivf_trained")),
        strArg(args, 1, "pq_topk_ivf_trained"), intArg(args, 3, "pq_topk_ivf_trained"),
        org.apache.spark.sql.functions.expr(strArg(args, 4, "pq_topk_ivf_trained")),
        intArg(args, 5, "pq_topk_ivf_trained"), intArg(args, 6, "pq_topk_ivf_trained"),
        intArg(args, 7, "pq_topk_ivf_trained"), intArg(args, 8, "pq_topk_ivf_trained"),
        intArg(args, 9, "pq_topk_ivf_trained"))
    }

    memoTvf(ext, "mmr_rerank",
      "mmr_rerank(table, id_col, emb_col, query_pred, k0, topk, lambda) — " +
        "maximal-marginal-relevance re-rank (Carbonell 1998): diversified " +
        "top-k around one probe over the exact top-k0 candidate list " +
        "(greedy λ·rel − (1−λ)·max-sim, bounded driver-side)", Seq(0)) { args =>
      require(args.length == 7,
        "mmr_rerank(table, id_col, emb_col, query_pred, k0, topk, lambda)")
      val fn = "mmr_rerank"
      Embeddings.mmrRerank(
        Embeddings.prepare(tableArg(args, 0, fn), strArg(args, 1, fn), strArg(args, 2, fn)),
        strArg(args, 1, fn),
        org.apache.spark.sql.functions.expr(strArg(args, 3, fn)),
        intArg(args, 4, fn), intArg(args, 5, fn), dblArg(args, 6, fn))
    }

    memoTvf(ext, "maxsim_topk",
      "maxsim_topk(doc_table, id_col, text_col, queries_csv, topk, " +
        "max_doc_tokens) — ColBERT-style late-interaction MaxSim top-k " +
        "(Khattab & Zaharia 2020) over the deterministic md5-slice token " +
        "encoder; queries_csv is ';'-separated 'qid:query text' entries",
      Seq(0)) { args =>
      require(args.length == 6,
        "maxsim_topk(doc_table, id_col, text_col, queries_csv, topk, max_doc_tokens)")
      val fn = "maxsim_topk"
      val qs = strArg(args, 3, fn).split(';').toSeq.map(_.trim).filter(_.nonEmpty).map { s =>
        val i = s.indexOf(':')
        require(i > 0, s"maxsim_topk queries_csv entries are 'qid:query text', got '$s'")
        (s.substring(0, i).trim, s.substring(i + 1).trim)
      }
      graft.pipeline.Embeddings.maxSimTopK(tableArg(args, 0, fn),
        strArg(args, 1, fn), strArg(args, 2, fn), qs,
        intArg(args, 4, fn), intArg(args, 5, fn))
    }

    memoTvf(ext, "hybrid_rrf_topk",
      "hybrid_rrf_topk(doc_table, id_col, text_col, terms_csv, emb_table, " +
        "emb_id_col, emb_col, query_pred, k_each, k_rrf, topk) — hybrid " +
        "retrieval via reciprocal-rank fusion (Cormack 2009): BM25 " +
        "top-k_each fused with exact-cosine top-k_each by exact-integer " +
        "1e12 DIV (k_rrf + rank)", Seq(0, 4)) { args =>
      require(args.length == 11,
        "hybrid_rrf_topk(doc_table, id_col, text_col, terms_csv, emb_table, " +
          "emb_id_col, emb_col, query_pred, k_each, k_rrf, topk)")
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val fn = "hybrid_rrf_topk"
      val idCol = strArg(args, 1, fn)
      val embId = strArg(args, 5, fn)
      val kEach = intArg(args, 8, fn)
      val sparse = TextOps.bm25TopK(tableArg(args, 0, fn), idCol,
          strArg(args, 2, fn), csvArg(args, 3, fn), kEach)
        .select(col(idCol), row_number()
          .over(Window.orderBy(col("bm25_q").desc, col(idCol).asc)).as("rnk"))
      val dense = Embeddings.bruteForceTopK(
          Embeddings.prepare(tableArg(args, 4, fn), embId, strArg(args, 6, fn)),
          embId, kEach, org.apache.spark.sql.functions.expr(strArg(args, 7, fn)))
        .select(col("neighbor_id").as(idCol), col("rnk"))
      TextOps.rrfFuse(Seq(sparse, dense), idCol, "rnk",
        intArg(args, 9, fn), intArg(args, 10, fn))
    }

    memoTvf(ext, "semantic_dedup",
      "semantic_dedup(table, id_col, emb_col, cells, threshold) — SemDeDup: " +
        "within-cell embedding pairs with cosine ≥ threshold", Seq(0)) { args =>
      require(args.length == 5, "semantic_dedup(table, id_col, emb_col, cells, threshold)")
      Embeddings.semanticDedup(
        Embeddings.prepare(tableArg(args, 0, "semantic_dedup"),
          strArg(args, 1, "semantic_dedup"), strArg(args, 2, "semantic_dedup")),
        strArg(args, 1, "semantic_dedup"), intArg(args, 3, "semantic_dedup"),
        dblArg(args, 4, "semantic_dedup"))
    }

    memoTvf(ext, "pack_token_ids",
      "pack_token_ids(table, id_col, text_col, stratum_col, num_merges, " +
        "budget_tokens, buckets) — train a BPE tokenizer on the table and " +
        "emit packed token-id sequences (one row per ~budget-token pack)", Seq(0)) { args =>
      require(args.length == 7,
        "pack_token_ids(table, id_col, text_col, stratum_col, num_merges, budget_tokens, buckets)")
      val t = tableArg(args, 0, "pack_token_ids")
      val model = graft.pipeline.BpeOps.trainModel(t,
        strArg(args, 2, "pack_token_ids"), intArg(args, 4, "pack_token_ids"))
      graft.pipeline.BpeOps.packTokenIds(t, strArg(args, 1, "pack_token_ids"),
        strArg(args, 2, "pack_token_ids"), strArg(args, 3, "pack_token_ids"),
        model, intArg(args, 5, "pack_token_ids").toLong,
        intArg(args, 6, "pack_token_ids"))
    }

    tvf(ext, "chunk_sequences",
      "chunk_sequences(table, ids_col, window, stride) — split each row's " +
        "token-id array into window-token chunks whose starts advance by " +
        "stride (overlap = window - stride); rows gain chunk_idx and a " +
        "chunk array column") { args =>
      require(args.length == 4, "chunk_sequences(table, ids_col, window, stride)")
      TrainingSet.chunkSequences(tableArg(args, 0, "chunk_sequences"),
        strArg(args, 1, "chunk_sequences"), "chunk",
        intArg(args, 2, "chunk_sequences"), intArg(args, 3, "chunk_sequences"))
    }

    tvf(ext, "heavy_hitters",
      "heavy_hitters(table, value_col, depth, width, k) — count-min-sketch " +
        "top-k hot values (Cormode & Muthukrishnan 2005) with exact counts " +
        "alongside; est_count >= exact_count always (one-sided error)") { args =>
      require(args.length == 5, "heavy_hitters(table, value_col, depth, width, k)")
      graft.pipeline.Profile.cmsHeavyHitters(tableArg(args, 0, "heavy_hitters"),
        strArg(args, 1, "heavy_hitters"), intArg(args, 2, "heavy_hitters"),
        intArg(args, 3, "heavy_hitters"), intArg(args, 4, "heavy_hitters"))
    }

    tvf(ext, "script_profile",
      "script_profile(table, id_col, text_col) — unicode-script profile " +
        "(Latin/Cyrillic/CJK/Arabic/Hangul counts + dominant script label), " +
        "the script-detection step before language ID") { args =>
      require(args.length == 3, "script_profile(table, id_col, text_col)")
      TextOps.scriptProfile(tableArg(args, 0, "script_profile"),
        strArg(args, 1, "script_profile"), strArg(args, 2, "script_profile"))
    }

    tvf(ext, "quality_score",
      "quality_score(table, id_col, text_col) — per-document quality " +
        "score (type-token ratio, stopword/punct/length heuristics)") { args =>
      require(args.length == 3, "quality_score(table, id_col, text_col)")
      TextOps.qualityScore(tableArg(args, 0, "quality_score"),
        strArg(args, 1, "quality_score"), strArg(args, 2, "quality_score"))
    }

    // memoized: the builder runs a stratum-counting Spark job at analysis
    // time (the memoTvf contract — same class as dup_clusters/pq_encode)
    memoTvf(ext, "temperature_mix",
      "temperature_mix(table, key_col, stratum_col, alpha, max_copies) — " +
        "p ∝ n^alpha stratum resampling (XLM/mT5): low-resource strata " +
        "upsample across `epoch` copies, high-resource downsample; " +
        "alpha = 0.5 is the cross-engine-exact default", Seq(0)) { args =>
      require(args.length == 5,
        "temperature_mix(table, key_col, stratum_col, alpha, max_copies)")
      TrainingSet.temperatureMix(tableArg(args, 0, "temperature_mix"),
        strArg(args, 1, "temperature_mix"), strArg(args, 2, "temperature_mix"),
        dblArg(args, 3, "temperature_mix"), dblArg(args, 4, "temperature_mix"))
    }

    tvf(ext, "cap_per_group",
      "cap_per_group(table, group_col, score_col, id_col, k) — keep the " +
        "best k rows per group (WindowGroupLimit top-k; hot-key safe)") { args =>
      require(args.length == 5, "cap_per_group(table, group_col, score_col, id_col, k)")
      TrainingSet.capPerGroup(tableArg(args, 0, "cap_per_group"),
        strArg(args, 1, "cap_per_group"), strArg(args, 2, "cap_per_group"),
        strArg(args, 3, "cap_per_group"), intArg(args, 4, "cap_per_group"))
    }
  }

  // ---- plumbing ------------------------------------------------------

  private def scalar(ext: SparkSessionExtensions, name: String, arity: Int)
                    (build: Seq[Expression] => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name takes $arity argument(s)")
        // eager node→expression conversion: the lazy wrapper
        // GraftShim.expression returns cannot be codegen'd inside a
        // parsed plan
        GraftShim.resolvableExpression(build(args))
      }))

  private def tvf(ext: SparkSessionExtensions, name: String, usage: String)
                 (build: Seq[Expression] => org.apache.spark.sql.DataFrame): Unit =
    ext.injectTableFunction((FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, null, name, usage, ""),
      (args: Seq[Expression]) => plan(build(args))))

  /** TVF result memo for the builders that do DRIVER-SIDE work at analysis
    * time (clustering loops, tokenizer training, k-means, eager
    * checkpoints): keyed on the function's literal argument list, guarded
    * by a per-table version token, holding the built logical plan. Session
    * eviction follows the PipelineQueries pairsCache pattern (identity
    * `eq`, stopped sessions evicted on lookup) — a memoized plan may
    * reference localCheckpointed RDDs owned by its session and must never
    * be served to another. */
  private val tvfMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String, LogicalPlan)]()

  /** Memo bound: entries strongly reference a session and (often) eager
    * localCheckpoint blocks, and the literal-arg key space is unbounded —
    * a threshold sweep from a long-lived service must not grow driver
    * heap forever. A full clear at the cap is sound (pure cache; the cost
    * is one rebuild per cleared entry actually re-issued) — the
    * [[graft.pipeline.BpeOps.MemoCap]] pattern. */
  private val TvfMemoCap = 64

  /** Number of real (non-memoized) expensive-TVF builds — the
    * observability hook GraftSqlSpec's memo gate counts. */
  val tvfBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  /** Version token of a table-name argument — three mutation-sensitive
    * components:
    *   (1) the canonicalized analyzed-plan string (exprIds normalized,
    *       no object identities): catches a re-registered view whose
    *       DEFINITION changed (different filter/limit/source);
    *   (2) per graft table, (ident, pinned-or-current snapshot id,
    *       branch): an INSERT/DELETE/MERGE moves the snapshot and
    *       invalidates even though the plan shape is unchanged;
    *   (3) per LocalRelation leaf, the row data's hash: a re-registered
    *       literal view with same schema but different rows invalidates.
    * External files behind an unchanged path (someone overwriting a
    * parquet dir in place) are assumed immutable — the same assumption
    * Spark's own CACHE TABLE makes. */
  /** Version token for a NON-graft DataSourceV2 leaf (ADVICE r13): a
    * name-only token would serve stale memoized results forever after the
    * foreign table mutates. Use a snapshot-ish table property when the
    * connector exposes one; otherwise emit a per-call nonce — the memo
    * then never hits for that table, degrading to plain (correct) rebuild
    * instead of silent staleness. */
  private[graft] def foreignV2Token(name: String,
                                  props: java.util.Map[String, String]): String = {
    val ver = Seq("current-snapshot-id", "snapshot-id", "current-version", "version")
      .iterator.flatMap(k => Option(props.get(k))).nextOption()
    ver.map(v => s"v2:$name:$v")
      .getOrElse(s"v2:$name:nocache:${java.util.UUID.randomUUID()}")
  }

  private def versionToken(spark: SparkSession, table: String): String = {
    val analyzed = spark.table(table).queryExecution.analyzed
    val perLeaf = analyzed.collectLeaves().map {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case g: GraftSparkTable =>
            s"ice:${g.ice.ident}:${g.snapshotId.orElse(g.ice.metadata.currentSnapshotId)}:${g.branch.getOrElse("")}"
          case t => foreignV2Token(t.name, t.properties())
        }
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        s"local:${l.data.hashCode}"
      case l => s"h:${l.semanticHash()}"
    }
    (s"shape:${analyzed.canonicalized.toString.hashCode}" +: perLeaf).mkString(";")
  }

  /** [[tvf]] with the memo: `tableArgs` are the argument positions holding
    * table/view names (the staleness guard). */
  private def memoTvf(ext: SparkSessionExtensions, name: String, usage: String,
                      tableArgs: Seq[Int])
                     (build: Seq[Expression] => org.apache.spark.sql.DataFrame): Unit =
    ext.injectTableFunction((FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, null, name, usage, ""),
      (args: Seq[Expression]) => {
        // wrong arity falls through to build() for its usage-message require
        if (tableArgs.exists(_ >= args.length)) plan(build(args))
        else {
          val spark = SparkSession.active
          // the key carries the SESSION identity: two live sessions
          // issuing the same call must each keep their own entry (a
          // memoized plan may reference session-owned checkpoint RDDs,
          // and a shared key would make them evict each other on every
          // alternation — the memo silently defeated exactly where it
          // matters). The value still holds the session reference for
          // the eq-guard; an identityHashCode collision only costs a
          // rebuild, never a wrong plan.
          val key = System.identityHashCode(spark).toString + ":" + name +
            args.map(_.sql).mkString("(", ",", ")")
          val ver = tableArgs.map(i => versionToken(spark, strArg(args, i, name)))
            .mkString("|")
          val cur = tvfMemo.get(key)
          if (cur != null && cur._1.sparkContext.isStopped) tvfMemo.remove(key, cur)
          if (cur != null && (cur._1 eq spark) && !spark.sparkContext.isStopped
              && cur._2 == ver) cur._3
          else {
            tvfBuilds.incrementAndGet()
            val p = plan(build(args))
            if (tvfMemo.size >= TvfMemoCap) tvfMemo.clear()
            tvfMemo.put(key, (spark, ver, p))
            p
          }
        }
      }))

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  /** Resolves a table/view NAME literal to its DataFrame (temp views,
    * catalog tables, and graft tables all resolve through
    * `spark.table`). */
  private def tableArg(args: Seq[Expression], i: Int, fn: String) =
    SparkSession.active.table(strArg(args, i, fn))

  /** Comma-separated column list; empty string → Nil. */
  private def csvArg(args: Seq[Expression], i: Int, fn: String): Seq[String] =
    strArg(args, i, fn).split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private def strArg(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def dblArg(args: Seq[Expression], i: Int, fn: String): Double =
    args(i) match {
      case Literal(d: Decimal, _) => d.toDouble // SQL `0.5` parses as DECIMAL
      case Literal(d: java.lang.Double, _) => d.doubleValue()
      case Literal(f: java.lang.Float, _) => f.doubleValue()
      case Literal(n: java.lang.Integer, _) => n.doubleValue()
      case Literal(n: java.lang.Long, _) => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a numeric literal, got $other")
    }

  private def intArg(args: Seq[Expression], i: Int, fn: String): Int =
    args(i) match {
      case Literal(n: java.lang.Integer, _) => n.intValue()
      case Literal(n: java.lang.Long, _) => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }
}
