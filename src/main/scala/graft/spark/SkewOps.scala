package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation helpers — the salting side of the engine's
  * skew story. AQE's skew-join splitting covers sort-merge JOIN inputs at
  * runtime; these cover the cases AQE cannot re-plan:
  *
  *  - distinct aggregation under a hot group key ([[saltedCountDistinct]]):
  *    partial aggregation does NOT compress count(DISTINCT x) the way it
  *    compresses sum/count, so every distinct value of a hot key lands in
  *    ONE reducer. Salting by a hash of the VALUE splits that key's values
  *    across `buckets` reducers, and — because the salt is a function of
  *    the value — the per-bucket distinct counts are over DISJOINT value
  *    sets and sum exactly. Two shuffles, identical result, hot reducer
  *    `buckets`× smaller.
  *  - broadcast-less joins with a few hot keys ([[saltedJoin]]): the big
  *    side gets a deterministic per-row salt, the small side is replicated
  *    once per bucket, and the join key widens to (keys, salt) — each big
  *    row still meets exactly one copy of its match, so inner/left results
  *    are row-identical while the hot key's probe rows spread over
  *    `buckets` tasks.
  *
  * Salts are hash-derived (never rand()): task retries and speculative
  * execution must re-produce the same salt for the same row.
  */
object SkewOps {

  /** Exact count(DISTINCT valueCol) per `keys`, skew-resistant: values are
    * salted into `buckets` disjoint classes, counted per (keys, salt), and
    * the partial counts summed per key. Also returns the plain row count
    * (cheap to carry in the same pass). */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                          buckets: Int = 32,
                          distinctAs: String = "n_distinct",
                          countAs: String = "n_rows"): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets.toLong)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count_distinct(col(valueCol)).as("__pd"), count(lit(1)).as("__pc"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__pd")).as(distinctAs), sum(col("__pc")).as(countAs))
  }

  /** Skew-spread equi-join: `big` rows are salted by a hash of `spreadBy`
    * (a column that VARIES within the hot key — a row id, a payload, the
    * whole-row struct), `small` is replicated `buckets`×, and the join runs
    * on (keys, salt). Row-identical to `big.join(small, keys, joinType)`
    * for "inner" and "left" (each big row matches exactly one replica of
    * its key's small rows). Use when the small side is too big to
    * broadcast and a handful of keys dominate the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 spreadBy: Column, buckets: Int = 32,
                 joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin preserves row multiplicity for inner/left only, got $joinType")
    val bigS = big.withColumn("__salt", pmod(xxhash64(spreadBy), lit(buckets.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
