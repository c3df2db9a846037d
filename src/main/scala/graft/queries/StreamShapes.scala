package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.streaming.Events

/** Batch-shape equivalents of the streaming aggregations — the same
  * transform functions from graft.streaming.Events applied to the batch
  * events table, which makes the window semantics oracle-checkable in
  * DuckDB (streaming-only semantics — watermark drops, state cleanup —
  * are unit-tested with MemoryStream instead, see StreamingSpec).
  */
object StreamShapes {
  private type Q = (SparkSession, String) => DataFrame

  private val qStreamTumbling: Q = (s, d) =>
    Events.tumblingCounts(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type"))

  private val qStreamSliding: Q = (s, d) =>
    Events.slidingCounts(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type"))

  private val qStreamSession: Q = (s, d) =>
    Events.sessionWindows(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_start"))

  private val qStreamUsers: Q = (s, d) =>
    Events.windowUsers(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type"))

  /** Hourly top-3 spenders — the trending leaderboard: the streaming
    * half is [[Events.windowUserSpend]]; the per-window rank is the
    * consumer step (foreachBatch in a live stream, a window here).
    */
  private val qStreamTopk: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("cents").desc, col("user_id").asc)
    Events.windowUserSpend(Tables.events(s, d))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("window_start"), col("rnk"))
  }

  private val qStreamDedup: Q = (s, d) =>
    Events.firstTouch(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type"))

  /** True end-to-end STREAMING run (not a batch-shape equivalent): the
    * events table replayed out-of-order through the watermarked as-of —
    * file source, one slice per micro-batch, adjacent slices swapped —
    * must reproduce the batch AsOfJoin verdict exactly (every arrival
    * stays inside the watermark delay, so the stream's contract says
    * the results coincide). The oracle is the batch as-of contract in
    * SQL, so this key hash-proves source → watermark → stateful buffer
    * → flush, where StreamingSpec's MemoryStream fixtures only
    * spot-check it. See [[graft.streaming.Events.replayAsOfWatermarked]].
    */
  private val qStreamAsofWm: Q = (s, d) =>
    Events.replayAsOfWatermarked(s, d)

  /** TRUE end-to-end streaming near-dup ingestion gate: documents
    * replayed as 3 ascending doc_id-range micro-batches through
    * foreachBatch against a PERSISTENT band index + shingle store —
    * every doc admitted or rejected with its earliest ≥0.5-Jaccard
    * predecessor. The oracle states the same rule as one all-pairs
    * SQL sentence, so the driver hash-proves the index probe, the
    * same-batch self-join, the verify, and the cross-batch state
    * accumulation. See [[graft.streaming.IngestGate]].
    */
  private val qStreamIngestGate: Q = (s, d) =>
    graft.streaming.IngestGate.replayNearDupGate(s, d)

  val registry: Map[String, Q] = Map(
    "q_stream_asof_wm" -> qStreamAsofWm,
    "q_stream_ingest_gate" -> qStreamIngestGate,
    "q_stream_dedup" -> qStreamDedup,
    "q_stream_topk" -> qStreamTopk,
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession,
    "q_stream_users" -> qStreamUsers,
  )

  val oracle: Map[String, String] = Map(
    // the batch as-of contract (q_join_asof_native's semantics with the
    // view time emitted as epoch micros — the stream's state unit)
    "q_stream_asof_wm" ->
      """SELECT p.event_id, p.user_id, epoch_us(max(v.ts)) AS last_view_us
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin,
    // the gate's decision rule as one sentence: dup iff some SMALLER
    // doc_id reaches Jaccard >= 0.5 on the 3-token shingle sets
    // (string shingles here ≡ the gate's hashed shingles — the
    // q_dedup_minhash collision argument); <3-token docs have no
    // shingle set and are always admitted
    "q_stream_ingest_gate" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                                for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3),
        |p AS (SELECT b.doc_id AS doc_id, min(a.doc_id) AS dup_src
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |    AND len(list_intersect(a.sh, b.sh)) * 1.0 /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
        |  GROUP BY 1)
        |SELECT d.doc_id, (p.dup_src IS NULL) AS admitted, p.dup_src
        |FROM documents d LEFT JOIN p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_stream_dedup" ->
      """WITH r AS (SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, ts AS first_ts,
        |  event_id AS first_event_id
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_stream_topk" ->
      """WITH a AS (SELECT date_trunc('hour', ts) AS window_start, user_id,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY window_start
        |    ORDER BY cents DESC, user_id ASC) AS rnk FROM a)
        |SELECT window_start, user_id, CAST(n AS BIGINT) AS n, cents,
        |  CAST(rnk AS INT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin,
    "q_stream_users" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH w AS (
        |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
        |           AS window_start,
        |         event_type
        |  FROM events)
        |SELECT window_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_stream_session" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 10 MINUTE AS session_end,
        |  user_id, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
