package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the `events` table schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streams (every DAG is manually-triggered batch,
  * SURVEY.md §1.1); this module is the generalized streaming surface the
  * brief mandates. Transforms are written against plain DataFrames so the
  * SAME function serves batch (oracle-checkable, queries/StreamShapes) and
  * streaming (readStream/MemoryStream) inputs — the Structured Streaming
  * unification. Watermarks bound state; sinks are idempotent merges.
  */
object Events {

  /** Streaming source over a parquet events directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(batchSchema).parquet(s"$dir/events.parquet")
    if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }

  /** Tumbling 1-hour counts per event type, 10-minute watermark. */
  def tumblingCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_cents"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Sliding 1-hour/30-minute counts per event type. */
  def slidingCounts(events: DataFrame,
                    windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"))

  /** Gap-based session windows per user. */
  def sessionWindows(events: DataFrame,
                     gap: String = "10 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_cents"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("sum_cents"))

  /** Stateful exactly-once dedup by event_id, with state bounded by the
    * watermark (duplicates arriving within the watermark are dropped;
    * state for older keys is reclaimed).
    */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming K1: merge each micro-batch into a Parquet table by key —
    * the reference's `update_one(upsert=True)` discipline applied to a
    * stream. Idempotent per batch, so at-least-once delivery is safe.
    */
  def foreachBatchUpsert(aggregated: DataFrame, path: String, keys: Seq[String],
                         checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    aggregated.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Sinks.upsertByKey(batch.sparkSession, path, batch, keys)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
