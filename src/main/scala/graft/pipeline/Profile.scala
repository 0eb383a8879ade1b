package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus profiling: per-column row/null/distinct counts and min/max in ONE
  * distributed aggregation — the data-quality health check that runs before
  * (and after) every large pipeline stage, answering "did a source go null",
  * "did a column collapse to one value", "what's the id range" without N
  * separate scans.
  *
  * All requested columns aggregate in a single `agg` (Catalyst plans the
  * multi-distinct via one Expand pass), then a `stack` unpivots the single
  * result row into one row per column. Values render as strings so the
  * output schema is uniform across column types. Distinct counts are EXACT
  * (engine-portable, oracle-reproducible); at extreme cardinalities swap
  * `countDistinct` for `approx_count_distinct` — same shape, one pass, no
  * Expand.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs: Seq[Column] = cols.flatMap { c =>
      Seq(lit(c), col("__n"), col(s"__nn_$c"), col(s"__nd_$c"),
        col(s"__min_$c"), col(s"__max_$c"))
    }
    one.select(stack((lit(cols.size) +: stackArgs): _*)
        .as(Seq("column_name", "n_rows", "n_nonnull", "n_distinct",
          "min_value", "max_value")))
  }

  /** KMV (k-minimum-values) bottom-k sketch per group with the classic
    * distinct-count estimate — the mergeable cardinality sketch
    * (Bar-Yossef et al. 2002) that answers "roughly how many distinct
    * values per source" in one bounded-memory pass, where exact
    * countDistinct would shuffle the full domain.
    *
    * Hash = the 60-bit md5 fraction in [0,1) the samplers use (exact,
    * engine-portable). Estimate: (k-1)/f_k where f_k is the k-th smallest
    * fraction; groups with fewer than k distinct hashes report their exact
    * count. Scale shape: one distinct on (group, 8-byte fraction) with
    * map-side partial dedup, then a per-group bottom-k window —
    * `row_number() <= k` is rank-limit-pushed (WindowGroupLimit), so each
    * map task forwards at most k rows per group to the shuffle. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val f = conv(substring(md5(col(valueCol).cast("binary")), 1, 15), 16, 10)
      .cast("long") / lit(1152921504606846976.0)
    val h = df.select(col(groupCol), f.as("f")).distinct()
    val counts = h.groupBy(col(groupCol)).agg(count(lit(1)).as("n_distinct"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("f").asc)
    h.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .join(broadcast(counts), Seq(groupCol))
      .groupBy(col(groupCol), col("n_distinct"))
      .agg(max(col("f")).as("fk"))
      .select(col(groupCol),
        least(col("n_distinct"), lit(k.toLong)).as("k_used"),
        when(col("n_distinct") < k, col("n_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("fk")).as("est_distinct"))
  }

  /** Count–min-sketch heavy hitters (Cormode & Muthukrishnan 2005): the
    * mergeable-sketch hot-key detector. The sketch is `depth` hash rows ×
    * `width` buckets of instance counts — a few KB regardless of corpus
    * size, built by ONE aggregate whose key space is bounded at
    * depth·width (map-side combine collapses the instance stream); the
    * estimate for a value is the min of its row cells, an ε-overestimate
    * with one-sided error (est ≥ exact always — the q104 spec asserts it).
    * Hashing is the md5-hex-prefix convention (`bucket_r(v) =
    * md5(r ':' v)[0,8) mod width`), so every engine reproduces the sketch
    * CELL-FOR-CELL — the oracle recomputes it in SQL, no golden needed.
    *
    * Output: top `k` values by (estimate desc, value asc — a total order,
    * so LIMIT is deterministic) with the exact count alongside. The exact
    * side is a vocabulary-scale aggregate here because the testdata gate
    * wants truth next to the estimate; at 100 TB the sketch side is the
    * point — it merges across partitions/streams in O(depth·width) and
    * never shuffles the value domain. */
  /** The md5-hex-prefix CMS bucket (`bucket_r(v) = md5(r ':' v)[0,8) mod
    * width`) — the ONE hashing convention every sketch producer and
    * consumer shares, so sketches built by different jobs (or the DuckDB
    * oracle) merge and compare cell-for-cell. */
  private def cmsBucket(r: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat(r.cast("string"), lit(":"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  def cmsHeavyHitters(df: DataFrame, valueCol: String, depth: Int = 4,
                      width: Int = 1024, k: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2 && k >= 1,
      s"depth=$depth width=$width k=$k out of range")
    def bucket(r: Column, v: Column): Column = cmsBucket(r, v, width)
    // NULL is not a value: it hashes to a NULL bucket and has no defined
    // string form, so null rows are EXCLUDED explicitly (a null-heavy
    // column's null mass is Profile.profile's n_null job, and SkewOps
    // handles null-key join skew) — silently dropping them inside a
    // null-unsafe join would be the same result with a lie attached.
    // Values keep their ORIGINAL type end-to-end; only the hash input is
    // stringified.
    val inst = df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
    val rs = explode(sequence(lit(0), lit(depth - 1)))
    // ONE corpus-scale pass (the per-value aggregate); the sketch cells
    // then build from vocabulary-scale rows weighted by their counts —
    // Σ_v count(v) per cell is EXACTLY the instance-stream cell count,
    // without hashing the corpus `depth` times
    val exact = inst.groupBy(col("v")).agg(count(lit(1)).as("exact_count"))
    // the cell table is cmsSketch — ONE shared implementation, so the
    // producer/consumer cell-for-cell contract cannot drift
    val cms = cmsSketch(df, valueCol, depth, width)
    exact.select(col("v"), col("exact_count"), rs.as("r"))
      .select(col("v"), col("exact_count"), col("r"),
        bucket(col("r"), col("v")).as("bkt"))
      .join(broadcast(cms), Seq("r", "bkt"))
      .groupBy(col("v"), col("exact_count"))
      .agg(min(col("c")).as("est_count"))
      .orderBy(col("est_count").desc, col("v").asc)
      .limit(k)
      .select(col("v").as(valueCol), col("est_count"), col("exact_count"))
  }

  /** The raw CMS cell table for `df`'s instance stream: one row per
    * OCCUPIED (r, bkt) with the exact instance count — this IS the sketch
    * (a missing cell means 0; at most depth×width rows regardless of
    * corpus size). Built like [[cmsHeavyHitters]]'s internal frame: one
    * corpus-scale per-value aggregate, then cells from vocabulary-scale
    * rows. Exposed because the cell table is the mergeable / persistable
    * artifact: cell-wise sum over sketches of two disjoint slices equals
    * the whole-data sketch exactly (Cormode & Muthukrishnan 2005's
    * mergeability), which is what [[mergeSketches]], the q107 oracle, and
    * the streaming profile all lean on. NULL values are excluded by the
    * [[cmsHeavyHitters]] contract. */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
                width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width out of range")
    val exact = df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    exact.select(col("v"), col("c"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), cmsBucket(col("r"), col("v"), width).as("bkt"), col("c"))
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("c"))
  }

  /** Cell-wise sum of two (or N, by folding) sketch cell tables built with
    * the SAME (depth, width): the O(depth·width) merge that lets sketches
    * accumulate across partitions, table slices, or stream micro-batches
    * without ever rescanning the data they summarized. */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.select("r", "bkt", "c").unionByName(b.select("r", "bkt", "c"))
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("c"))

  /** Persists a sketch cell table as plain parquet (any engine can read,
    * merge, and estimate from it — the model-persistence convention of
    * [[graft.pipeline.BpeOps.saveModel]]). */
  def saveSketch(sketch: DataFrame, path: String): Unit =
    sketch.select(col("r").cast("int").as("r"), col("bkt").cast("long").as("bkt"),
        col("c").cast("long").as("c"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Loads a [[saveSketch]] cell table. */
  def loadSketch(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("r", "bkt", "c")

  /** Point estimates for `values` against a standing sketch: min over the
    * depth rows of the value's cells (a missing sparse cell is 0), via one
    * broadcast join — the sketch is KB, the probe never shuffles. The
    * estimate keeps CMS's one-sided error: ≥ the true count of the value
    * IN THE SKETCHED DATA whenever every row cell is present. `depth` and
    * `width` must be the sketch's own. */
  def cmsEstimate(sketch: DataFrame, values: DataFrame, valueCol: String,
                  depth: Int, width: Int): DataFrame =
    values.select(col(valueCol).as("v")).filter(col("v").isNotNull).distinct()
      .select(col("v"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("v"), col("r"), cmsBucket(col("r"), col("v"), width).as("bkt"))
      .join(broadcast(sketch.select("r", "bkt", "c")), Seq("r", "bkt"), "left")
      .groupBy(col("v")).agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
      .select(col("v").as(valueCol), col("est_count"))

  /** Equal-width histogram: bin = ⌊value / width⌋, with count, exact
    * min/max, and the bin's sum (decimal-exact for 2-dp monetary data,
    * surfaced as double). One hash aggregate — the distributed binning
    * primitive behind range-partition planning and distribution checks. */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).cast("double").as("lo"),
        max(col(valueCol)).cast("double").as("hi"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Per-group EXACT interpolated percentiles of a numeric column — the
    * sequence-length planning stat (context-window budgeting, pack-size
    * tuning) run per source/stratum before training-set assembly.
    *
    * Weighted-histogram formulation: rows fold into per-(group, value)
    * counts (a codegen'd hash aggregate with map-side combine), then each
    * fraction reads value-at-rank over cumulative weights. Spark's own
    * `percentile` aggregate reaches the same distinct-value memory bound
    * but holds each group's value→count map as ONE agg-buffer object
    * (ObjectHashAggregate: no codegen, whole maps through the shuffle,
    * fallback sorts on buffer pressure); the histogram spreads the same
    * state over ordinary spillable rows. For unbounded continuous domains
    * swap in `approx_percentile` (t-digest sketch, no exact oracle).
    * Output: one row per group with a `p<nn>` double column per requested
    * fraction, interpolated bit-identically to `percentile`.
    */
  def groupedPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                         fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0 && f <= 1),
      "fractions must be within [0, 1]")
    // p50, p99, p99_9: decimals keep their digits (never rounded away —
    // 0.995 and 1.0 must not both label as p100). Scale in DECIMAL space:
    // BigDecimal(0.29 * 100) would preserve the binary artifact
    // 28.999999999999996 in the column name
    def label(f: Double): String = {
      val s = (BigDecimal(f.toString) * 100).underlying.stripTrailingZeros.toPlainString
      "p" + s.replace("-", "m").replace(".", "_")
    }
    val labels = fractions.map(label)
    require(labels.distinct.size == labels.size,
      s"fractions produce duplicate column labels: ${labels.mkString(", ")}")
    // The interpolation below reproduces Percentile.getPercentile
    // bit-for-bit (same vlo·(hi−pos) + vhi·(pos−lo) double expression,
    // same take-the-value short-circuit on integral positions), so
    // results are unchanged vs the builtin aggregate.
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
    // builtin-percentile null semantics: percentiles rank NON-NULL values
    // only, while n_rows counts every row (count(lit(1))) and sum skips
    // nulls — so the rank machinery runs on the null-free histogram and a
    // base aggregate over ALL buckets supplies n_rows/sum_value (a group
    // whose values are all null keeps its row with null percentiles, via
    // the left join below)
    val base = hist.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_rows"), sum(col("__s")).as("sum_value"))
    val histNN = hist.filter(col("__v").isNotNull)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val staged = histNN.select(col(groupCol), col("__v"), col("__c"),
      sum(col("__c")).over(wCum).as("__cum"),
      sum(col("__c")).over(wAll).as("__n"))
    // value-at-rank r (1-based): the bucket where cum − c < r ≤ cum; each
    // rank hits exactly one bucket, so the conditional sum IS the value
    def atRank(r: Column): Column =
      sum(when(col("__cum") - col("__c") < r && r <= col("__cum"), col("__v"))
        .otherwise(lit(0.0)))
    val bounds = fractions.zipWithIndex.flatMap { case (f, i) =>
      val pos = lit(f) * (col("__n") - 1)
      Seq(atRank(floor(pos) + 1).as(s"__lo$i"), atRank(ceil(pos) + 1).as(s"__hi$i"))
    }
    // interpolation positions rank over the NON-NULL count (__nn), never
    // n_rows — the two differ exactly when nulls exist
    val aggs = Seq(max(col("__n")).as("__nn")) ++ bounds
    val named = fractions.zipWithIndex.map { case (f, i) =>
      val pos = lit(f) * (col("__nn") - 1)
      when(floor(pos) === ceil(pos), col(s"__lo$i"))
        .otherwise(col(s"__lo$i") * (ceil(pos) - pos) + col(s"__hi$i") * (pos - floor(pos)))
        .as(label(f))
    }
    // null-SAFE join key: a null GROUP (the builtin aggregate groups null
    // keys like any other value) must still pick up its percentiles — a
    // plain using-column join would drop them (NULL = NULL is never true)
    val percs = staged.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed(groupCol, "__pg")
    base.join(percs, col(groupCol) <=> col("__pg"), "left")
      .select(col(groupCol) +: col("n_rows") +: col("sum_value") +: named: _*)
  }

  /** Robust per-group outlier detection: flag rows whose value deviates
    * from the group MEDIAN by more than `sigma` times the group MAD
    * (median absolute deviation) — the standard heavy-tail-safe anomaly
    * test (mean/stddev z-scores are poisoned by the outliers themselves).
    *
    * Engine-exact by integer construction: values are floor-quantized to
    * centi-units up front, medians are carried DOUBLED (lower middle +
    * upper middle of the ranked values — integers for both odd and even
    * group sizes, no float interpolation anywhere), and the flag test
    * `2·dev2 > sigma·mad22` is a pure integer comparison, so any SQL
    * engine reproduces the result bit-for-bit.
    *
    * Plan: every statistic here depends on a row only through its
    * QUANTIZED VALUE, so the rows fold into a per-(group, value) WEIGHTED
    * HISTOGRAM first (one map-side-combined hash aggregate carrying count
    * + id-sum per bucket) and both medians come from cumulative-weight
    * windows over the histogram. At 100 TB this is the difference between
    * ranking every event inside a handful of hot key partitions (a
    * per-key single-task sort over the whole corpus — the previous shape)
    * and windowing over (groups × distinct quantized values), which is
    * bounded by the value DOMAIN, not the row count. Bit-identical
    * output: value-at-rank over the cumulative weights selects exactly
    * the values per-row ranking selects.
    *
    * Output per group: `n`, `med2` (2x median, centi-units), `mad22`
    * (4x MAD, centi-units), `n_outliers`, `outlier_id_sum` (id checksum of
    * the flagged rows) — all BIGINT.
    */
  def robustOutliers(df: DataFrame, keyCol: String, valCol: String,
                     idCol: String, sigma: Int = 3): DataFrame = {
    val vq = floor(col(valCol) * 100).cast("long")
    // NOT spread (r19 A/B): the bucketing projection is cheap per row, so a
    // pre-aggregate spread cost more than the single-task partial agg saved
    // (1.92 -> 2.27 s measured) — unlike q1's heavy decimal aggregate
    val base = df.select(col(keyCol).as("k"), col(idCol).cast("long").as("id"),
      vq.as("vq"))
    // the ONLY corpus-scale job: rows → (k, vq) buckets with count + id-sum
    val hist = base.groupBy(col("k"), col("vq"))
      .agg(count(lit(1)).as("c"), sum(col("id")).as("idsum"))

    val dev = hist
      .join(weightedDoubledMedian(hist.select(col("k"), col("vq").as("v"), col("c")), "med2"),
        Seq("k"))
      .withColumn("dev2", abs(col("vq") * 2 - col("med2")))
    // distinct vq buckets can collapse to the same deviation — re-weigh
    val devHist = dev.groupBy(col("k"), col("dev2")).agg(sum(col("c")).as("c"))
    val mad = weightedDoubledMedian(
      devHist.select(col("k"), col("dev2").as("v"), col("c")), "mad22")

    dev.join(mad, Seq("k"))
      .groupBy(col("k").as(keyCol))
      .agg(sum(col("c")).as("n"),
        max(col("med2")).as("med2"),
        max(col("mad22")).as("mad22"),
        sum(when(col("dev2") * 2 > col("mad22") * sigma, col("c")).otherwise(0L))
          .as("n_outliers"),
        coalesce(sum(when(col("dev2") * 2 > col("mad22") * sigma, col("idsum"))),
          lit(0L)).as("outlier_id_sum"))
  }

  /** Doubled median (lower middle + upper middle) of a weighted value
    * histogram `(k, v, c)`: rank r lives in the bucket whose cumulative
    * weight first reaches r, and the two middle ranks are
    * floor((n+1)/2) and floor(n/2)+1 — exact LONG arithmetic throughout
    * (Column./ is double division; the comparison must be integral to
    * mirror the oracle's `//`). Each rank hits exactly one bucket, so the
    * two conditional sums each select one value. */
  private def weightedDoubledMedian(hist: DataFrame, as: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col("k")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("k"))
    hist.select(col("k"), col("v"), col("c"),
        sum(col("c")).over(wCum).as("_cum"),
        sum(col("c")).over(wAll).as("_n"))
      .withColumn("_r1", floor((col("_n") + 1) / 2).cast("long"))
      .withColumn("_r2", floor(col("_n") / 2).cast("long") + 1)
      .groupBy(col("k"))
      .agg((sum(when(col("_cum") - col("c") < col("_r1") && col("_r1") <= col("_cum"),
          col("v")).otherwise(lit(0L))) +
        sum(when(col("_cum") - col("c") < col("_r2") && col("_r2") <= col("_cum"),
          col("v")).otherwise(lit(0L)))).as(as))
  }
}
