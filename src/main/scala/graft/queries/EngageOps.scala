package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** User-engagement analytics surface: new-vs-returning actor splits,
  * DAU/MAU stickiness, consecutive-activity streaks, inter-event
  * arrival statistics, and the Kaplan–Meier lifetime survival curve —
  * the product-analytics counters every event warehouse serves.
  *
  * Shared scale discipline: raw activity collapses to a bounded grain
  * FIRST — distinct (actor, period) for the four activity counters,
  * one (first, last) row per actor for survival — one keyed shuffle
  * far below event volume, and everything downstream (windows
  * included) runs on that collapsed table. Determinism: integer
  * epoch-day / micros arithmetic; ratios as 10⁶·a DIV b; medians only
  * over integers (midpoints are exactly representable doubles,
  * `quantile_cont` parity).
  */
object EngageOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Daily active customers split new vs returning: a customer is NEW on
    * their first-ever active day, RETURNING on every later one — the
    * acquisition/retention overview. Shape: distinct (customer, day) →
    * per-customer min-day (keyed agg) → broadcast-scale join back →
    * per-day counts. No windows.
    */
  private val qNewVsReturning: Q = (s, d) => {
    val cd = Tables.orders(s, d)
      .select(col("o_custkey").as("c"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .distinct()
    val first = cd.groupBy("c").agg(min("day").as("first_day"))
    cd.join(first, "c")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum((col("day") === col("first_day")).cast("long")).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy("day")
  }

  /** Monthly stickiness: Σ daily-active counts over the month divided by
    * (active-day count × monthly-active count), in exact ppm — the
    * DAU/MAU engagement ratio (1.0 ⇔ every monthly actor shows up every
    * active day). Month = epoch-month integer (year·12+month−1 of the
    * epoch day), so both engines bucket identically. Three keyed
    * aggregates over the collapsed (customer, day) grain; no windows.
    */
  private val qStickiness: Q = (s, d) => {
    val cd = Tables.orders(s, d)
      .select(col("o_custkey").as("c"), to_date(col("o_orderdate")).as("dt"))
      .distinct()
      .select(col("c"), unix_date(col("dt")).cast("long").as("day"),
        (year(col("dt")) * 12 + month(col("dt")) - 1).cast("long").as("mo"))
    val dau = cd.groupBy("mo", "day").agg(count(lit(1)).as("n_day"))
      .groupBy("mo").agg(sum("n_day").as("sum_dau"),
        count(lit(1)).as("n_days"))
    val mau = cd.select("mo", "c").distinct()
      .groupBy("mo").agg(count(lit(1)).as("mau"))
    dau.join(mau, "mo")
      .select(col("mo"), col("sum_dau"), col("n_days"), col("mau"),
        expr("1000000 * sum_dau DIV (n_days * mau)").as("stickiness_ppm"))
      .orderBy("mo")
  }

  /** Longest consecutive-active-day streak per user (events table — the
    * dense activity grain): the gaps-and-islands day−row_number grouping
    * key, per-user partitioned window only, then two keyed aggregates.
    * Work per user is bounded by their active-day count.
    */
  private val qActiveStreaks: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id").as("u"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("u").orderBy("day")
    ud.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("u", "grp").agg(count(lit(1)).as("len"))
      .groupBy("u").agg(max("len").as("longest_streak"),
        sum("len").as("n_active_days"))
      .orderBy("u")
  }

  /** Inter-arrival statistics per event type: consecutive same-type
    * gaps within each user's stream — count, mean (defined as
    * sum DIV n), and the exact median gap in micros. One partitioned
    * lag window (user × type), one keyed aggregate; the median is an
    * integer midpoint (`percentile`/`quantile_cont` parity, the
    * `q_mad_outliers` discipline).
    */
  private val qInterEvent: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sum_us"),
        expr("percentile(gap, 0.5)").as("med"))
      .select(col("event_type"), col("n_gaps"),
        expr("sum_us DIV n_gaps").as("mean_us"),
        floor(col("med")).cast("long").as("median_us"))
      .orderBy("event_type")
  }

  /** Discrete Kaplan–Meier survival curve of customer lifetime: the
    * churn-analysis staple. Lifetime = days between first and last
    * order, bucketed into 90-day periods; a customer whose last order
    * predates the corpus horizon by >180 days counts as churned at
    * their bucket, later actives are right-censored (leave the risk
    * set without a churn event — the distinction that separates KM
    * from a naive churn histogram). Determinism for the cumulative
    * product: each bucket's survival factor is an exact ppm integer
    * (clamped ≥1 so a bucket where everyone churns cannot reach
    * ln(0)), its log floors to an integer BEFORE the running sum, and
    * S(t) exponentiates the integer cumsum — the `q_perplexity_lm`
    * discipline applied to a product. Both running windows scan the
    * BUCKET-sized table (≤ lifetime-span/90 rows), never customers.
    */
  private val qSurvival: Q = (s, d) => {
    val u = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(min(unix_date(to_date(col("o_orderdate"))).cast("long")).as("f"),
        max(unix_date(to_date(col("o_orderdate"))).cast("long")).as("l"))
    val h = u.agg(max("l").as("hend"))
    val per = u.crossJoin(broadcast(h))
      .select(expr("(l - f) DIV 90").as("t"),
        (col("l") < col("hend") - 180L).cast("long").as("ch"))
      .groupBy("t").agg(count(lit(1)).as("n_at"), sum("ch").as("n_churn"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.withColumn("n_risk", sum("n_at").over(wDesc))
      .withColumn("f_ppm",
        greatest(lit(1000000L) - expr("1000000 * n_churn DIV n_risk"), lit(1L)))
      .withColumn("lnf_e9",
        floor(lit(1000000000.0) *
          log(col("f_ppm").cast("double") / lit(1000000.0))).cast("long"))
      .withColumn("surv_e6",
        floor(lit(1000000.0) *
          exp(sum("lnf_e9").over(wAsc).cast("double") / lit(1000000000.0)))
          .cast("long"))
      .select(col("t"), col("n_risk"), col("n_churn"), col("surv_e6"))
      .orderBy("t")
  }

  /** Top-10 opening event paths: each user's first three event types in
    * (ts, event_id) order joined into a `a>b>c` path string, counted
    * across users — the onboarding-flow mining readout. The rank window
    * is user-partitioned; the path string assembles INSIDE the per-user
    * aggregate via sort-then-join over the ≤3 collected (rn, type)
    * structs (bounded payload, no cross-row string concat); the final
    * top-10 is a TakeOrderedAndProject over the path-distinct table
    * with the (count DESC, path) total order.
    */
  private val qTopPaths: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val first3 = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    first3.groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(10)
  }

  /** Per-customer feature-store assembly: the recency / frequency /
    * monetary / urgency block a churn or LTV model trains on, all from
    * ONE keyed aggregate over orders plus the broadcast corpus
    * high-water mark (deterministic recency — no now(), the
    * `q_freshness` posture). Every feature is exact integer arithmetic;
    * the table is the reusable JOIN LEFT input for any downstream
    * label.
    */
  private val qFeatureAssembly: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("day"),
      round(col("o_totalprice") * 100.0).cast("long").as("cents"),
      (col("o_orderpriority") === "1-URGENT").cast("long").as("urgent"))
    val per = o.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"), min("day").as("first_day"),
      max("day").as("last_day"), sum("cents").as("total_cents"),
      sum("urgent").as("n_urgent"))
    per.crossJoin(broadcast(o.agg(max("day").as("hwm"))))
      .select(col("o_custkey"), col("n_orders"),
        (col("hwm") - col("last_day")).as("recency_days"),
        (col("last_day") - col("first_day")).as("tenure_days"),
        col("total_cents"),
        expr("total_cents DIV n_orders").as("avg_cents"),
        expr("1000000 * n_urgent DIV n_orders").as("urgent_ppm"))
      .orderBy("o_custkey")
  }

  val registry: Map[String, Q] = Map(
    "q_top_paths" -> qTopPaths,
    "q_feature_assembly" -> qFeatureAssembly,
    "q_survival" -> qSurvival,
    "q_new_vs_returning" -> qNewVsReturning,
    "q_stickiness" -> qStickiness,
    "q_active_streaks" -> qActiveStreaks,
    "q_inter_event" -> qInterEvent,
  )

  val oracle: Map[String, String] = Map(
    "q_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        |    AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, count(*) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path ASC LIMIT 10""".stripMargin,
    "q_feature_assembly" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS urgent
        |  FROM orders),
        |per AS (SELECT o_custkey, count(*) AS n_orders,
        |    min(day) AS first_day, max(day) AS last_day,
        |    CAST(sum(cents) AS BIGINT) AS total_cents,
        |    CAST(sum(urgent) AS BIGINT) AS n_urgent
        |  FROM o GROUP BY 1),
        |hw AS (SELECT max(day) AS hwm FROM o)
        |SELECT o_custkey, n_orders, hwm - last_day AS recency_days,
        |  last_day - first_day AS tenure_days, total_cents,
        |  CAST(total_cents // n_orders AS BIGINT) AS avg_cents,
        |  CAST(1000000 * n_urgent // n_orders AS BIGINT) AS urgent_ppm
        |FROM per CROSS JOIN hw ORDER BY o_custkey""".stripMargin,
    "q_survival" ->
      """WITH u AS (SELECT o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(min(o_orderdate)
        |      AS DATE)) AS BIGINT) AS f,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(max(o_orderdate)
        |      AS DATE)) AS BIGINT) AS l
        |  FROM orders GROUP BY 1),
        |h AS (SELECT max(l) AS hend FROM u),
        |per AS (SELECT (l - f) // 90 AS t, count(*) AS n_at,
        |    CAST(sum(CASE WHEN l < hend - 180 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_churn
        |  FROM u CROSS JOIN h GROUP BY 1),
        |r AS (SELECT t, n_churn,
        |    CAST(sum(n_at) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |  FROM per),
        |r2 AS (SELECT t, n_risk, n_churn,
        |    greatest(1000000 - 1000000 * n_churn // n_risk, 1) AS f_ppm
        |  FROM r),
        |r3 AS (SELECT t, n_risk, n_churn,
        |    CAST(floor(1000000000.0 *
        |      ln(CAST(f_ppm AS DOUBLE) / 1000000.0)) AS BIGINT) AS lnf
        |  FROM r2)
        |SELECT t, n_risk, n_churn,
        |  CAST(floor(1000000.0 * exp(CAST(sum(lnf) OVER (ORDER BY t ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |    1000000000.0)) AS BIGINT) AS surv_e6
        |FROM r3 ORDER BY t""".stripMargin,
    "q_new_vs_returning" ->
      """WITH cd AS (SELECT DISTINCT o_custkey AS c,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day
        |  FROM orders),
        |f AS (SELECT c, min(day) AS first_day FROM cd GROUP BY 1)
        |SELECT day, count(*) AS n_active,
        |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  count(*) - CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_returning
        |FROM cd JOIN f USING (c) GROUP BY day ORDER BY day""".stripMargin,
    "q_stickiness" ->
      """WITH cd AS (SELECT DISTINCT o_custkey AS c,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(year(CAST(o_orderdate AS DATE)) * 12 +
        |         month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mo
        |  FROM orders),
        |dau AS (SELECT mo, CAST(sum(n_day) AS BIGINT) AS sum_dau,
        |    count(*) AS n_days
        |  FROM (SELECT mo, day, count(*) AS n_day FROM cd GROUP BY 1, 2)
        |  GROUP BY 1),
        |mau AS (SELECT mo, count(*) AS mau
        |  FROM (SELECT DISTINCT mo, c FROM cd) GROUP BY 1)
        |SELECT mo, sum_dau, n_days, CAST(mau AS BIGINT) AS mau,
        |  CAST(1000000 * sum_dau // (n_days * mau) AS BIGINT)
        |    AS stickiness_ppm
        |FROM dau JOIN mau USING (mo) ORDER BY mo""".stripMargin,
    "q_active_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |g AS (SELECT u, day,
        |    day - row_number() OVER (PARTITION BY u ORDER BY day) AS grp
        |  FROM ud),
        |runs AS (SELECT u, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT u, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY u ORDER BY u""".stripMargin,
    "q_inter_event" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY us ASC, event_id ASC) AS gap
        |  FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(CAST(sum(gap) AS BIGINT) // count(*) AS BIGINT) AS mean_us,
        |  CAST(floor(quantile_cont(gap, 0.5)) AS BIGINT) AS median_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
