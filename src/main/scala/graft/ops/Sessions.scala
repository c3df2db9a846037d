package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): the offline counterpart of
  * the streaming `session_window` aggregate — assign every event a
  * per-user session sequence number where a gap above `gapMinutes`
  * starts a new session.
  *
  * Scale shape: one shuffle on the user key; both window passes (lag and
  * running sum) share the same partitioning/ordering so Spark plans a
  * single sort. Timestamps compare as `unix_micros` longs — integer
  * arithmetic, no float boundary risk, and the DuckDB oracle mirrors it
  * with `epoch_us`.
  */
object Sessions {

  /** Per-event session assignment: adds `session_seq` (1-based per user)
    * ordered by (ts, tieCol) within user.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"session gap must be positive, got $gapMinutes minutes")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        (col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs)
          .cast("long"))
      .withColumn("session_seq",
        sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "is_new")
  }

  /** Session summaries: one row per (user, session) with event count,
    * micros start/end, and duration — all integer columns.
    */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, gapMinutes: Int): DataFrame =
    sessionize(events, userCol, tsCol, tieCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
