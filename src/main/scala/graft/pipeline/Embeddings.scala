package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * All scores are computed over int64-QUANTIZED vectors (×1e6, rounded):
  * dot products and norms are then exact integer arithmetic, so
  * rankings are deterministic across engines, partitionings, and runs — a
  * float dot product's result depends on summation order, which breaks
  * reproducible top-k at scale. The final cosine is one IEEE division of
  * exact inputs.
  *
  * Scale paths: brute-force top-k is an intentionally-bounded
  * queries × corpus join (use for re-ranking candidate sets); the sign-LSH
  * bucketed variant prunes the corpus to one bucket per query via an
  * equi-join, the standard recall/throughput trade.
  */
object Embeddings {

  /** Quantize an Array[Float] embedding to Array[Long] (×1e6). */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1000000).cast("long"))

  /** id, q (quantized vector), n2 (exact squared norm). Repartitions so the
    * vector kernels parallelize even off a single small parquet split. */
  def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol), quantize(col(embCol)).as("q"))
      .withColumn("n2", aggregate(transform(col("q"), x => x * x), lit(0L), (a, x) => a + x))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def cosine(dotCol: Column, na: Column, nb: Column): Column =
    dotCol.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Exact top-k cosine neighbors for each row matching `queryPred`.
    * Deterministic: ranked by (cosine desc, neighbor id asc) over exact
    * integer dots. */
  def bruteForceTopK(prepared: DataFrame, idCol: String, k: Int, queryPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the pair join is a broadcast nested loop (non-equi condition): spread
    // the streamed side across the cluster first or it runs single-task
    val par = prepared.sparkSession.sessionState.conf.numShufflePartitions
    val q = prepared.filter(queryPred).repartition(par)
      .select(col(idCol).as("query_id"), col("q").as("qa"), col("n2").as("na"))
    val c = prepared.select(col(idCol).as("neighbor_id"), col("q").as("qb"), col("n2").as("nb"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** Near-duplicate pairs with cosine ≥ threshold (id_a < id_b). Brute-force
    * form; at scale feed LSH bucket candidates instead of the full square. */
  def nearDupPairs(prepared: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val par = prepared.sparkSession.sessionState.conf.numShufflePartitions
    val dim = vectorDim(prepared)
    // flatten vectors to scalar columns: the O(n²) scoring loop then runs as
    // whole-stage-codegen multiply-adds instead of interpreted array lambdas
    // (~10× on the all-pairs kernel)
    val a = flat(prepared, dim, "a").withColumnRenamed(idCol, "id_a").repartition(par)
    val b = flat(prepared, dim, "b").withColumnRenamed(idCol, "id_b")
    val dotCol = (0 until dim).map(i => col(s"a$i") * col(s"b$i")).reduce(_ + _)
    // broadcast keeps this a BroadcastNestedLoopJoin (codegen) rather than a
    // CartesianProduct evaluating the scoring expression row-at-a-time
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(dotCol, col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding dimensionality (one tiny driver-side metadata job). */
  private def vectorDim(prepared: DataFrame): Int =
    prepared.select(size(col("q"))).head.getInt(0)

  /** id, prefix0..prefixN scalar vector columns, n{prefix} squared norm. */
  private def flat(prepared: DataFrame, dim: Int, prefix: String): DataFrame =
    prepared.select(
      Seq(col(prepared.columns.head), col("n2").as(s"n$prefix")) ++
        (0 until dim).map(i => col("q").getItem(i).as(s"$prefix$i")): _*)

  /** Sign-LSH bucket id per vector: bit j = sign of ⟨hyperplane_j, q⟩ over
    * `planes` deterministic pseudo-random hyperplanes. Hyperplane component
    * h(plane, dim) = first md5 nibble of "plane:dim" mapped to the odd
    * integers {-15,…,15} (never zero → unambiguous signs; all-integer dots →
    * engine-portable buckets). One explode + one hash aggregate per vector.
    */
  def lshBucket(prepared: DataFrame, idCol: String, planes: Int): DataFrame = {
    val planeDot = expr(
      """aggregate(
        |  zip_with(q, sequence(0, size(q) - 1),
        |    (x, d) -> x * (cast(instr('0123456789abcdef',
        |                  substr(md5(cast(concat(_p, ':', d) AS binary)), 1, 1)) - 1 AS bigint) * 2 - 15)),
        |  cast(0 AS bigint), (acc, v) -> acc + v)""".stripMargin)
    prepared
      .select(col(idCol), col("q"), col("n2"), explode(sequence(lit(0), lit(planes - 1))).as("_p"))
      .withColumn("_pd", planeDot)
      .groupBy(col(idCol))
      .agg(sum(when(col("_pd") > 0, expr("shiftleft(1, _p)")).otherwise(lit(0))).as("bucket"),
        first(col("q")).as("q"), first(col("n2")).as("n2"))
  }

  /** Approximate top-k: exact cosine ranking restricted to the query's LSH
    * bucket. Equi-join on bucket id replaces the full cross product — the
    * IVF-style scale path; recall is tunable via `planes`. */
  def annTopK(prepared: DataFrame, idCol: String, k: Int, planes: Int,
              queryPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both join sides read the bucketed vectors — cache so the hyperplane
    // dot aggregation runs once
    val buckets = lshBucket(prepared, idCol, planes).cache()
    val q = buckets.filter(queryPred)
      .select(col(idCol).as("query_id"), col("bucket"), col("q").as("qa"), col("n2").as("na"))
    val c = buckets.select(col(idCol).as("neighbor_id"), col("bucket"), col("q").as("qb"), col("n2").as("nb"))
    val scored = q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(dot(col("qa"), col("qb")), col("na"), col("nb")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }
}
