package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.{FileCatalog, TableIdent}
import graft.spark.IceScan
import graft.spec.{IceSchema, IceType, PartitionSpec}
import graft.streaming.IceStreaming

/** Streaming ingestion correctness, judge-visible: the events table is
  * replayed through Structured Streaming (`readStream` → per-micro-batch
  * ACID appends into an Iceberg table), then aggregated from the TABLE; the
  * oracle aggregates the source directly — the whole
  * stream→commit→MoR-scan path must be lossless and exactly-once.
  */
object StreamingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_stream_ingest" -> ((s, d) => {
      val cat = new FileCatalog(Files.createTempDirectory("graft_stwh").toString)
      val ckpt = Files.createTempDirectory("graft_stck").toString
      val schema = IceSchema(0, Seq(
        graft.spec.NestedField(1, "event_id", required = false, IceType.LongT),
        graft.spec.NestedField(2, "user_id", required = false, IceType.LongT),
        graft.spec.NestedField(3, "event_type", required = false, IceType.StringT),
        graft.spec.NestedField(4, "value", required = false, IceType.DoubleT)))
      val table = cat.createTable(TableIdent(Seq("bench"), "ev"), schema, PartitionSpec(0, Nil))
      // ts is read as a raw LONG and immediately dropped — this query never
      // interprets time, so the physical unit (nanos or micros; the
      // generator has shipped both) is irrelevant here. Where time matters,
      // Tables.events sniffs the footer's logical-type unit.
      val stream = s.readStream
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      IceStreaming.writeStreamToTable(stream, table, ckpt, Trigger.AvailableNow())
        .awaitTermination()
      IceScan.scan(s, table.refresh())
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q33_stream_ingest" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
