package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Rolling-window series analytics over the daily revenue/volume series —
  * the monitoring dashboards a revenue platform runs: drawdown from peak,
  * volatility bands, momentum (RSI), rolling volume/revenue correlation,
  * and on-balance volume.
  *
  * Scale posture: every key first collapses the fact table to the DAILY
  * series with one partial-agg shuffle (exact cents BIGINTs). The daily
  * table is CALENDAR-bounded — ~2,400 rows for the corpus's 1992–1998
  * order-date span regardless of scale factor — so the global
  * `Window.orderBy(day)` that follows scans a provably tiny table (the
  * `q_period_over_period` cardinality argument): at 100 TB the series is
  * still ≤ tens of thousands of rows (one per day), never fact-sized.
  *
  * Determinism posture: window moments (n/Σ/Σ²/Σxy) are exact BIGINT;
  * derived statistics that need floats compute them in ONE fixed
  * operation sequence mirrored token-for-token by the DuckDB oracle
  * (the `q_welch_ttest` discipline).
  */
object SeriesOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Daily order-revenue series in exact cents plus the order count —
    * the shared input of every key in this family.
    */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))

  /** Drawdown from running peak over the daily revenue series: how far
    * each day sits below the best day seen so far — the demand-drawdown
    * monitor (max dd = the season's worst slump). Pure BIGINT: running
    * max + subtraction; one day-collapse shuffle + the calendar-sized
    * window.
    */
  private val qMaxDrawdown: Q = (s, d) => {
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily(s, d)
      .select(col("day"), col("cents"), max("cents").over(w).as("peak_cents"))
      .withColumn("drawdown_cents", col("peak_cents") - col("cents"))
      .orderBy("day")
  }

  /** Bollinger bands: 7-day rolling mean ± 2σ over daily revenue, with
    * breach flags — the volatility envelope. Window moments are exact:
    * Σ stays BIGINT (7-day revenue ≪ 2⁶³ cents at any plausible scale)
    * but the squared moment rides DECIMAL(38,0) from the first multiply
    * — a single day's cents² is already ~5×10¹⁸ at sf0.1, AT the BIGINT
    * limit (HUGEINT oracle-side, the `q_grouped_regression` promotion).
    * The population σ is the integer discriminant disc = n·Σ² − Σ·Σ in
    * decimal plus ONE mirrored float sequence sd = floor(sqrt(disc)/n·
    * 100). Bands and flags are then integer arithmetic in e2
    * (hundredths of a cent).
    */
  private val qBollinger: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily(s, d)
      .select(col("day"), col("cents"),
        count(lit(1)).over(w).as("n"),
        sum("cents").over(w).as("s"),
        sum(dec(col("cents")) * dec(col("cents"))).over(w).as("ss"))
      .filter(col("n") === 7L)
      .withColumn("mean_cents", expr("s DIV n"))
      .withColumn("disc",
        dec(col("n")) * col("ss") - dec(col("s")) * dec(col("s")))
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .withColumn("sd_e2",
        floor(sqrt(col("disc").cast("double")) / col("n").cast("double")
          * lit(100.0)).cast("long"))
      .select(col("day"), col("cents"), col("mean_cents"), col("sd_e2"),
        (col("mean_cents") * 100L + col("sd_e2") * 2L).as("upper_e2"),
        (col("mean_cents") * 100L - col("sd_e2") * 2L).as("lower_e2"))
      .withColumn("breach",
        when(col("cents") * 100L > col("upper_e2"), 1)
          .when(col("cents") * 100L < col("lower_e2"), -1).otherwise(0))
      .orderBy("day")
  }

  /** 14-day RSI (simple-average form) over daily revenue: momentum as
    * the share of up-moves in total movement, rsi_ppm = 10⁶·Σgain DIV
    * (Σgain+Σloss) — PURE integer end-to-end (no float at all; the
    * Wilder-smoothed variant is the recursive form, this is the SMA one
    * every charting library also ships). Day-over-day diffs via lag;
    * the first 14 days have no full window and are dropped; flat
    * 14-day stretches (Σgain+Σloss = 0) are guarded out.
    */
  private val qRsi: Q = (s, d) => {
    val wl = Window.orderBy("day")
    val diffed = daily(s, d)
      .select(col("day"), col("cents"),
        (col("cents") - lag("cents", 1).over(wl)).as("diff"),
        row_number().over(wl).as("rn"))
      .filter(col("rn") >= 2)
      .select(col("day"), col("cents"),
        greatest(col("diff"), lit(0L)).as("gain"),
        greatest(-col("diff"), lit(0L)).as("loss"))
    val w14 = Window.orderBy("day").rowsBetween(-13, Window.currentRow)
    diffed
      .select(col("day"), col("cents"),
        count(lit(1)).over(w14).as("n"),
        sum("gain").over(w14).as("sum_gain"),
        sum("loss").over(w14).as("sum_loss"))
      .filter(col("n") === 14L && col("sum_gain") + col("sum_loss") > 0L)
      .select(col("day"), col("cents"), col("sum_gain"), col("sum_loss"),
        expr("1000000 * sum_gain DIV (sum_gain + sum_loss)").as("rsi_ppm"))
      .orderBy("day")
  }

  /** 30-day rolling Pearson correlation between daily order COUNT and
    * daily revenue — does volume explain revenue this month, or is the
    * mix shifting? The count-side and cross moments are exact BIGINT
    * (x ~ orders/day keeps n·Σxy and ΣxΣy around 10¹⁴); the y-side
    * squared moment rides DECIMAL(38,0) from the first multiply (a
    * single day's cents² is ~5×10¹⁸ at sf0.1 — HUGEINT oracle-side).
    * cov/varx/vary are integer discriminants; corr is ONE mirrored
    * float sequence. Windows with zero variance on either side are
    * guarded out on both engines.
    */
  private val qRollingCorr: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val w = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    daily(s, d)
      .select(col("day"),
        count(lit(1)).over(w).as("n"),
        sum("n_orders").over(w).as("sx"),
        sum("cents").over(w).as("sy"),
        sum(col("n_orders") * col("n_orders")).over(w).as("sxx"),
        sum(dec(col("cents")) * dec(col("cents"))).over(w).as("syy"),
        sum(col("n_orders") * col("cents")).over(w).as("sxy"))
      .filter(col("n") === 30L)
      .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary",
        dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
      .filter(col("varx") > 0L &&
        col("vary") > lit(0).cast("decimal(38,0)"))
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .select(col("day"), col("n"), col("cov"),
        floor(lit(1000000.0) * col("cov").cast("double") /
          sqrt(col("varx").cast("double") * col("vary").cast("double")))
          .cast("long").as("corr_e6"))
      .orderBy("day")
  }

  /** On-balance volume: running sum of order count signed by the
    * day-over-day revenue direction — the classic volume-confirms-price
    * accumulation line, here "volume confirms revenue". Pure BIGINT:
    * sign via lag comparison, one calendar-sized running sum.
    */
  private val qObv: Q = (s, d) => {
    val wl = Window.orderBy("day")
    val signed = daily(s, d)
      .select(col("day"), col("cents"), col("n_orders"),
        (col("cents") - lag("cents", 1).over(wl)).as("diff"),
        row_number().over(wl).as("rn"))
      .filter(col("rn") >= 2)
      .select(col("day"), col("cents"),
        (signum(col("diff")).cast("long") * col("n_orders")).as("signed_vol"))
    signed
      .select(col("day"), col("cents"), col("signed_vol"),
        sum("signed_vol").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("obv"))
      .orderBy("day")
  }

  /** Lead–lag cross-correlation: corr(order count_t, revenue_{t+lag})
    * for lags −3..+3 — does volume LEAD revenue (positive-lag peak) or
    * just track it (peak at 0)? One 7-way lag explode of the calendar-
    * bounded daily table self-joined on shifted day; per-lag exact
    * moments (y² rides DECIMAL(38,0)/HUGEINT as in `q_rolling_corr`)
    * and ONE mirrored float sequence each. 7 output rows.
    */
  private val qLeadLagCorr: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val base = daily(s, d)
    val lags = s.range(-3, 4).select(col("id").as("lag"))
    val xl = base.select(col("day"), col("n_orders").as("x"))
      .crossJoin(broadcast(lags))
    val y = base.select(col("day").as("yday"), col("cents").as("y"))
    val m = xl.join(y, xl("day") + xl("lag") === y("yday"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary",
        dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
      .filter(col("varx") > 0L &&
        col("vary") > lit(0).cast("decimal(38,0)"))
    // Fixed float sequence, mirrored token-for-token by the oracle.
    m.select(col("lag"), col("n"),
        floor(lit(1000000.0) * col("cov").cast("double") /
          sqrt(col("varx").cast("double") * col("vary").cast("double")))
          .cast("long").as("corr_e6"))
      .orderBy("lag")
  }

  /** Linear interpolation over the gap-filled daily spine: every
    * calendar day between the series endpoints gets a revenue value —
    * observed days pass through, gap days take the straight line
    * between their bracketing observations, pv + (nv−pv)·(day−pd) DIV
    * (nd−pd), PURE integer (leading/trailing gaps clamp to the nearest
    * observation). Bracketing neighbors ride IGNORE-NULLS running
    * first/last over the calendar-bounded spine — the standard
    * gap-repair before any fixed-step window op (`q_time_spine` is the
    * zero-fill sibling; this is the shape-preserving one).
    */
  private val qInterpolate: Q = (s, d) => {
    val base = daily(s, d).select(col("day"), col("cents").as("c0"))
    val span = base.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = span.select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(base, Seq("day"), "left")
    val wb = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine
      .withColumn("pv", last("c0", ignoreNulls = true).over(wb))
      .withColumn("pd", last(when(col("c0").isNotNull, col("day")),
        ignoreNulls = true).over(wb))
      .withColumn("nv", first("c0", ignoreNulls = true).over(wf))
      .withColumn("nd", first(when(col("c0").isNotNull, col("day")),
        ignoreNulls = true).over(wf))
      .select(col("day"),
        // weighted-average form keeps every operand non-negative, so
        // integer division agrees across engines (Spark DIV truncates,
        // DuckDB // floors — identical only above zero)
        when(col("c0").isNotNull, col("c0"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            expr("(pv * (nd - day) + nv * (day - pd)) DIV (nd - pd)"))
          .when(col("pv").isNotNull, col("pv"))
          .otherwise(col("nv")).cast("long").as("cents_filled"),
        col("c0").isNull.cast("int").as("was_gap"))
      .orderBy("day")
  }

  /** Truncated-kernel EWMA (α=0.3) of daily revenue: the exponential
    * smoother every monitoring dashboard runs, in the DISTRIBUTABLE
    * form — the textbook recurrence s_t = αx_t + (1−α)s_{t−1} is
    * inherently sequential, but the kernel decays geometrically, so a
    * 14-tap truncation (last tap carries 0.29% weight) turns it into a
    * fixed weighted sum over a bounded window. The 14 weights are
    * integer-ppm literals from the exact recurrence w_k = w_{k−1}·7
    * DIV 10 (identical literals in the oracle), the numerator is an
    * exact BIGINT dot product, and ONE divide by the kernel mass
    * (993208 ppm) normalizes — no float anywhere. Window scans the
    * calendar-bounded daily table only; the first 13 days (incomplete
    * kernel) drop on both engines via the null-propagating sum.
    */
  private val qEwma: Q = (s, d) => {
    val w = Seq(300000L, 210000L, 147000L, 102900L, 72030L, 50421L,
      35294L, 24705L, 17293L, 12105L, 8473L, 5931L, 4151L, 2905L)
    val win = Window.orderBy("day")
    val num = w.zipWithIndex.map { case (wt, k) =>
      if (k == 0) col("cents") * lit(wt)
      else lag(col("cents"), k).over(win) * lit(wt)
    }.reduce(_ + _)
    daily(s, d).select(col("day"), col("cents"))
      .withColumn("num", num)
      .filter(col("num").isNotNull)
      .select(col("day"), col("cents"),
        expr("num DIV 993208").as("ewma_cents"))
      .orderBy("day")
  }

  /** 7-day rolling MEDIAN of daily revenue — the robust moving level
    * (`q_bollinger`'s mean band chases one outlier day; the median
    * doesn't). Exact by construction: the trailing 7-row frame's values
    * are collected, sorted, and the 4th smallest read out — an integer
    * order statistic, no percentile interpolation — and only full
    * frames emit. The collect is bounded by the FRAME (7 values), and
    * the window scans the calendar-bounded daily table; at a 100 TB
    * fact scale the frame buffer is still 7 BIGINTs per row.
    */
  private val qRollingMedian: Q = (s, d) => {
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily(s, d).select(col("day"), col("cents"))
      .withColumn("win", sort_array(collect_list(col("cents")).over(w)))
      .filter(size(col("win")) === 7)
      .select(col("day"), col("cents"),
        element_at(col("win"), 4).as("med7_cents"))
      .orderBy("day")
  }

  val registry: Map[String, Q] = Map(
    "q_ewma" -> qEwma,
    "q_rolling_median" -> qRollingMedian,
    "q_max_drawdown" -> qMaxDrawdown,
    "q_lead_lag_corr" -> qLeadLagCorr,
    "q_interpolate" -> qInterpolate,
    "q_bollinger" -> qBollinger,
    "q_rsi" -> qRsi,
    "q_rolling_corr" -> qRollingCorr,
    "q_obv" -> qObv,
  )

  private val dailySql =
    """daily AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
      |      AS cents,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_rolling_median" ->
      s"""WITH $dailySql,
         |l AS (SELECT day, cents,
         |    list_sort(list(cents) OVER (ORDER BY day
         |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
         |  FROM daily)
         |SELECT day, cents, CAST(win[4] AS BIGINT) AS med7_cents
         |FROM l WHERE len(win) = 7 ORDER BY day""".stripMargin,
    "q_ewma" ->
      s"""WITH $dailySql,
         |l AS (SELECT day, cents,
         |    cents * 300000
         |      + lag(cents, 1) OVER w * 210000
         |      + lag(cents, 2) OVER w * 147000
         |      + lag(cents, 3) OVER w * 102900
         |      + lag(cents, 4) OVER w * 72030
         |      + lag(cents, 5) OVER w * 50421
         |      + lag(cents, 6) OVER w * 35294
         |      + lag(cents, 7) OVER w * 24705
         |      + lag(cents, 8) OVER w * 17293
         |      + lag(cents, 9) OVER w * 12105
         |      + lag(cents, 10) OVER w * 8473
         |      + lag(cents, 11) OVER w * 5931
         |      + lag(cents, 12) OVER w * 4151
         |      + lag(cents, 13) OVER w * 2905 AS num
         |  FROM daily WINDOW w AS (ORDER BY day))
         |SELECT day, cents, CAST(num // 993208 AS BIGINT) AS ewma_cents
         |FROM l WHERE num IS NOT NULL ORDER BY day""".stripMargin,
    "q_interpolate" ->
      s"""WITH $dailySql,
         |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |spine AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span),
         |j AS (SELECT spine.day, daily.cents AS c0
         |  FROM spine LEFT JOIN daily ON spine.day = daily.day),
         |n AS (SELECT day, c0,
         |    last_value(c0 IGNORE NULLS) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    last_value(CASE WHEN c0 IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |    first_value(c0 IGNORE NULLS) OVER (ORDER BY day
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    first_value(CASE WHEN c0 IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER (ORDER BY day
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM j)
         |SELECT day,
         |  CAST(CASE WHEN c0 IS NOT NULL THEN c0
         |    WHEN pv IS NOT NULL AND nv IS NOT NULL
         |    THEN (pv * (nd - day) + nv * (day - pd)) // (nd - pd)
         |    WHEN pv IS NOT NULL THEN pv ELSE nv END AS BIGINT)
         |    AS cents_filled,
         |  CAST(c0 IS NULL AS INT) AS was_gap
         |FROM n ORDER BY day""".stripMargin,
    "q_lead_lag_corr" ->
      s"""WITH $dailySql,
         |lags AS (SELECT unnest(range(-3, 4)) AS lag),
         |j AS (SELECT lag, a.n_orders AS x, b.cents AS y
         |  FROM daily a CROSS JOIN lags JOIN daily b ON a.day + lag = b.day),
         |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    sum(CAST(y AS HUGEINT) * y) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM j GROUP BY 1),
         |c AS (SELECT lag, n,
         |    n * sxy - sx * sy AS cov,
         |    n * sxx - sx * sx AS varx,
         |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary
         |  FROM m)
         |SELECT CAST(lag AS BIGINT) AS lag, n,
         |  CAST(floor(1000000.0 * CAST(cov AS DOUBLE) /
         |    sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))) AS BIGINT)
         |    AS corr_e6
         |FROM c WHERE varx > 0 AND vary > 0 ORDER BY lag""".stripMargin,
    "q_max_drawdown" ->
      s"""WITH $dailySql
         |SELECT day, cents,
         |  CAST(max(cents) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS peak_cents,
         |  CAST(max(cents) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cents
         |    AS BIGINT) AS drawdown_cents
         |FROM daily ORDER BY day""".stripMargin,
    "q_bollinger" ->
      s"""WITH $dailySql,
         |w AS (SELECT day, cents,
         |    CAST(count(*) OVER win AS BIGINT) AS n,
         |    CAST(sum(cents) OVER win AS BIGINT) AS s,
         |    sum(CAST(cents AS HUGEINT) * cents) OVER win AS ss
         |  FROM daily
         |  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |b AS (SELECT day, cents, n, s // n AS mean_cents,
         |    CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS disc
         |  FROM w WHERE n = 7),
         |c AS (SELECT day, cents, mean_cents,
         |    CAST(floor(sqrt(CAST(disc AS DOUBLE)) / CAST(n AS DOUBLE) * 100.0)
         |      AS BIGINT) AS sd_e2
         |  FROM b)
         |SELECT day, cents, CAST(mean_cents AS BIGINT) AS mean_cents, sd_e2,
         |  CAST(mean_cents * 100 + 2 * sd_e2 AS BIGINT) AS upper_e2,
         |  CAST(mean_cents * 100 - 2 * sd_e2 AS BIGINT) AS lower_e2,
         |  CAST(CASE WHEN cents * 100 > mean_cents * 100 + 2 * sd_e2 THEN 1
         |    WHEN cents * 100 < mean_cents * 100 - 2 * sd_e2 THEN -1
         |    ELSE 0 END AS INT) AS breach
         |FROM c ORDER BY day""".stripMargin,
    "q_rsi" ->
      s"""WITH $dailySql,
         |diffed AS (SELECT day, cents,
         |    cents - lag(cents, 1) OVER (ORDER BY day) AS diff,
         |    row_number() OVER (ORDER BY day) AS rn
         |  FROM daily),
         |g AS (SELECT day, cents,
         |    greatest(diff, 0) AS gain, greatest(-diff, 0) AS loss
         |  FROM diffed WHERE rn >= 2),
         |w AS (SELECT day, cents,
         |    CAST(count(*) OVER win AS BIGINT) AS n,
         |    CAST(sum(gain) OVER win AS BIGINT) AS sum_gain,
         |    CAST(sum(loss) OVER win AS BIGINT) AS sum_loss
         |  FROM g
         |  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT day, cents, sum_gain, sum_loss,
         |  CAST(1000000 * sum_gain // (sum_gain + sum_loss) AS BIGINT)
         |    AS rsi_ppm
         |FROM w WHERE n = 14 AND sum_gain + sum_loss > 0
         |ORDER BY day""".stripMargin,
    "q_rolling_corr" ->
      s"""WITH $dailySql,
         |w AS (SELECT day,
         |    CAST(count(*) OVER win AS BIGINT) AS n,
         |    CAST(sum(n_orders) OVER win AS BIGINT) AS sx,
         |    CAST(sum(cents) OVER win AS BIGINT) AS sy,
         |    CAST(sum(n_orders * n_orders) OVER win AS BIGINT) AS sxx,
         |    sum(CAST(cents AS HUGEINT) * cents) OVER win AS syy,
         |    CAST(sum(n_orders * cents) OVER win AS BIGINT) AS sxy
         |  FROM daily
         |  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
         |m AS (SELECT day, n,
         |    n * sxy - sx * sy AS cov,
         |    n * sxx - sx * sx AS varx,
         |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary
         |  FROM w WHERE n = 30)
         |SELECT day, n, CAST(cov AS BIGINT) AS cov,
         |  CAST(floor(1000000.0 * CAST(cov AS DOUBLE) /
         |    sqrt(CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE))) AS BIGINT)
         |    AS corr_e6
         |FROM m WHERE varx > 0 AND vary > 0 ORDER BY day""".stripMargin,
    "q_obv" ->
      s"""WITH $dailySql,
         |diffed AS (SELECT day, cents, n_orders,
         |    cents - lag(cents, 1) OVER (ORDER BY day) AS diff,
         |    row_number() OVER (ORDER BY day) AS rn
         |  FROM daily),
         |g AS (SELECT day, cents,
         |    CAST(sign(diff) AS BIGINT) * n_orders AS signed_vol
         |  FROM diffed WHERE rn >= 2)
         |SELECT day, cents, signed_vol,
         |  CAST(sum(signed_vol) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS obv
         |FROM g ORDER BY day""".stripMargin,
  )
}
