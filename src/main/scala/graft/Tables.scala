package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file per table under the sf dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4's schema
    * INFERENCE rejects by default. A user-specified schema reading ts as
    * BIGINT (ns since epoch) skips inference entirely — no session conf
    * touched (`spark.sql.legacy.parquet.nanosAsLong` is only consulted on
    * the inference path) — then truncate to µs and surface as
    * TIMESTAMP_NTZ, the same µs truncation DuckDB applies. Integer
    * division (`DIV`) keeps ns exact (> 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.schema(
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
