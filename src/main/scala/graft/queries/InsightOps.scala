package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Behavioral / robust-statistics analytics surface: event funnels,
  * per-label embedding centroids, median-absolute-deviation outliers,
  * and a distributed 2-D skyline (Pareto frontier).
  *
  * Determinism posture matches the rest of the registry: integer
  * aggregates wherever a sum crosses a partition boundary, exact
  * percentile interpolation (midpoints of integers — exactly
  * representable doubles, so DuckDB's `quantile_cont` agrees
  * bit-for-bit), and fixed-operation-order float formulas mirrored
  * token-for-token by the oracles.
  */
object InsightOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Centroid-mean quantization scale — THE shared constant
    * ([[graft.ops.Similarity.MeanScale]]), not a copy: sums accumulate
    * as exact integers so the mean is bit-deterministic under any
    * partitioning/aggregation order, and the oracle's literal
    * (16777216.0) must track this exact value.
    */
  private val MeanScale = graft.ops.Similarity.MeanScale

  /** Conversion funnel view→click→purchase per user: first view, first
    * click strictly after it, first purchase strictly after that — the
    * product-analytics progression query. Three keyed aggregates and
    * two keyed joins, no windows: every stage shuffles one row per
    * surviving user, the right shape at any event volume.
    */
  private val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t_view_us"))
      .groupBy("user_id").agg(min("us").as("t_click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("t_click_us"))
      .groupBy("user_id").agg(min("us").as("t_purchase_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"),
        (lit(1) + col("t_click_us").isNotNull.cast("int") +
          col("t_purchase_us").isNotNull.cast("int")).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Conversion-window funnel: view→click→purchase where each step must
    * land within 24 h of the previous one — the funnel variant product
    * analytics actually ships (an unbounded funnel credits a purchase
    * months after the view). Same keyed-aggregate shape as `q_funnel`
    * (no windows, one row per surviving user per stage); the window
    * bound is a residual predicate on the stage join.
    */
  private val qFunnelWindow: Q = (s, d) => {
    val W = 86400000000L // 24 h in micros
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("t_view_us") && col("us") <= col("t_view_us") + W)
      .groupBy("user_id").agg(min("us").as("t_click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("t_click_us") && col("us") <= col("t_click_us") + W)
      .groupBy("user_id").agg(min("us").as("t_purchase_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"),
        (lit(1) + col("t_click_us").isNotNull.cast("int") +
          col("t_purchase_us").isNotNull.cast("int")).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Classical seasonal decomposition (trend / weekly seasonal /
    * residual) of the daily revenue series: trend = centered 7-day
    * moving average over the GAP-FILLED calendar spine (missing days
    * are explicit zeros — without the spine the "7-day" frame silently
    * spans more than 7 calendar days), seasonal = per-weekday median of
    * the detrended series, residual = what's left. Exactness: the MA is
    * sum DIV 7 on exact cents over full frames only (edges emit null
    * trend); medians are integer midpoints; the residual is defined
    * integer arithmetic. All windows run over the day-collapsed table
    * (the `q_autocorr`/`q_period_over_period` posture).
    */
  private val qSeasonalDecompose: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("c0"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val full = span.select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("day"), "left")
      .withColumn("cents", coalesce(col("c0"), lit(0L)))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val t = full
      .withColumn("cnt7", count(lit(1)).over(w7))
      .withColumn("s7", sum("cents").over(w7))
      .withColumn("trend", when(col("cnt7") === 7L, expr("s7 DIV 7")))
      .withColumn("dow", (col("day") + 3L) % 7L)
      .withColumn("detr", col("cents") - col("trend"))
    val sea = t.filter(col("detr").isNotNull)
      .groupBy("dow").agg(expr("percentile(detr, 0.5)").as("med"))
      .select(col("dow"), floor(col("med") * 100).cast("long").as("sea_e2"))
    t.join(broadcast(sea), "dow")
      .select(col("day"), col("cents"), col("trend"), col("sea_e2"),
        (col("detr") * 100L - col("sea_e2")).as("resid_e2"))
      .orderBy("day")
  }

  /** CUSUM change-point candidates: the 10 days maximizing the exact
    * integer statistic |n·S_t − t·S_n| (the scaled gap between the
    * prefix mean and the global mean — the classical level-shift
    * locator), with the before/after means for interpretation. Prefix
    * sums and ranks ride one window over the day-collapsed table;
    * top-10 plans as TakeOrderedAndProject. BIGINT headroom:
    * n·S_t needs days × total-cents under 2⁶³ (~10⁶ days at 10¹³
    * cents); past that the statistic moves to DECIMAL(38,0).
    */
  private val qChangepoint: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("st", sum("cents").over(w))
    val tot = pre.agg(max("t").as("n"), max("st").as("sn"))
    pre.crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .select(col("day"),
        abs(col("n") * col("st") - col("t") * col("sn")).as("stat"),
        expr("st DIV t").as("mean_before_cents"),
        expr("(sn - st) DIV (n - t)").as("mean_after_cents"))
      .orderBy(col("stat").desc, col("day"))
      .limit(10)
  }

  /** Per-label mean embedding (the class-centroid feature): positional
    * explode → exact integer-scaled sums per (label, dimension) → one
    * division. The distributed mean with NO float-summation-order
    * dependence — the same discipline `Similarity.kmeansCentroids` uses,
    * here as an oracled key (long format: one row per label×dimension,
    * since oracled outputs cannot carry array cells).
    */
  private val qLabelCentroids: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("x") * MeanScale).cast("long")).as("sx"))
      .select(col("label"), col("pos"), col("n_vecs"),
        floor(col("sx").cast("double") / col("n_vecs") / MeanScale * 1e6)
          .cast("long").as("mean_e6"))
      .orderBy(col("label"), col("pos"))

  /** Robust outliers via median absolute deviation: |x − median| >
    * 3·MAD per event_type. Medians interpolate midpoints of integer
    * cents (halves/quarters — exactly representable), so every
    * comparison is exact on both engines and there is NO division in
    * the flagging predicate (nothing to guard under ANSI). The
    * complement of `q_zscore_outliers`: immune to the outliers
    * inflating the spread estimate itself.
    */
  private val qMadOutliers: Q = (s, d) => {
    val c = Tables.events(s, d).select(col("event_id"), col("event_type"),
      round(col("value") * 100.0).cast("long").as("cents"))
    val med = c.groupBy("event_type")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = c.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("cents").cast("double") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev") > col("mad") * 3.0)
      .select(col("event_id"), col("event_type"),
        floor(col("dev") * 100).cast("long").as("dev_e2"),
        floor(col("mad") * 100).cast("long").as("mad_e2"))
      .orderBy(col("event_id"))
  }

  /** 2-D skyline (Pareto frontier) of orders: maximize value, minimize
    * date — no other order has ≥ value AND ≤ date with one strict. The
    * O(n²) NOT-EXISTS definition collapses to a sort sweep: aggregate
    * min-date per distinct price (keyed shuffle), take the EXCLUSIVE
    * running min of those dates over strictly-higher prices
    * ([[graft.ops.Ranks.globalRunningMinExcl]] — range-partitioned, no
    * single-partition stage), and keep rows beaten by neither the
    * strictly-higher sweep nor an equal-price earlier date. One
    * aggregate + one sweep + one keyed join at any scale.
    */
  private val qSkyline: Q = (s, d) => {
    val b = Tables.orders(s, d).select(col("o_orderkey"),
      round(col("o_totalprice") * 100.0).cast("long").as("cents"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("d"))
    val perPrice = b.groupBy("cents").agg(min("d").as("md"))
    val swept = graft.ops.Ranks.globalRunningMinExcl(
      perPrice, Seq(col("cents").desc), col("md"), "m_strict")
    b.join(swept, "cents")
      .filter((col("m_strict").isNull || col("m_strict") > col("d")) &&
        col("md") === col("d"))
      .select(col("o_orderkey"), col("cents"), col("d").as("date_day"))
      .orderBy(col("o_orderkey"))
  }

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; each later week-offset counts how many of them came back —
    * the product-analytics retention triangle. Week indices are integer
    * day-counts from the corpus epoch (2024-01-01, a Monday) DIV 7, so
    * both engines bucket identically with no week-truncation dialect
    * risk. Shape: one distinct (keyed shuffle), one min-aggregate, one
    * keyed join, one count-distinct aggregate — no windows, each stage
    * shuffles at most one row per (user, active week) at any volume.
    */
  private val qCohortRetention: Q = (s, d) => {
    val wk = Tables.events(s, d)
      .select(col("user_id"),
        expr("CAST(datediff(to_date(ts), DATE '2024-01-01') DIV 7 AS BIGINT)")
          .as("week"))
      .distinct()
    val first = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    wk.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Exponential-decay weighted activity: per user, ordered by event
    * time, an 8-tap dyadic decay sum Σ_{j=0..7} cents(t−j)·2^(7−j) —
    * the truncated-EWMA trend feature. Dyadic integer weights keep
    * every term (and the sum) an exact BIGINT, so both engines agree
    * bit-for-bit — no float recurrence to diverge. The window is
    * partitioned by user and frame-bounded (8 lags): scale-safe, no
    * global sort, and the whole tap chain is one Window node.
    */
  private val qDecayWavg: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val base = Tables.events(s, d).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("us"),
      round(col("value") * 100.0).cast("long").as("cents"))
    val taps = (0 to 7).map { j =>
      val tap = if (j == 0) col("cents") else coalesce(lag(col("cents"), j).over(w), lit(0L))
      tap * lit(1L << (7 - j))
    }
    base.select(col("event_id"), col("user_id"),
        taps.reduce(_ + _).as("decay_x256"))
      .orderBy("event_id")
  }

  /** Exact per-group lower median WITHOUT per-group value
    * materialization — [[graft.ops.Quantiles.medianLow]]'s two-scan
    * bucket-bisect (coarse histogram → crossing bucket → in-bucket
    * rank). The scale counterpart of `q_percentile`: built-in exact
    * `percentile` buffers every group's values in memory; this needs
    * only groups × buckets state however large a group grows. Discrete
    * convention (smallest value reaching rank ceil(n/2)), so both
    * engines agree exactly with no interpolation arithmetic.
    */
  private val qExactMedian: Q = (s, d) =>
    graft.ops.Quantiles.medianLow(
      Tables.events(s, d).select(col("event_type"),
        round(col("value") * 100.0).cast("long").as("cents")),
      "event_type", col("cents"), as = "median_cents")
      .orderBy("event_type")

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next type | current type) as exact floored
    * millionths. One partitioned window (lag per user — scale-safe),
    * one keyed aggregate, integer ratio arithmetic both engines
    * execute identically. The behavioral-model complement of
    * `q_funnel`: the funnel fixes one path, this measures all of them.
    */
  private val qMarkovTransitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val seq = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val trans = seq.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("prev_type").agg(sum("n").as("out_n"))
    trans.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"), col("out_n"),
        expr("1000000L * n DIV out_n").as("p_e6"))
      .orderBy("prev_type", "next_type")
  }

  /** Stationary distribution of the event-type Markov chain by THREE
    * fixed power-iteration steps over the `q_markov_transitions`
    * matrix — "where does user behavior settle" (the long-run state
    * mass behind that key's one-step probabilities). Everything is
    * exact integer: the transition matrix is the e6-floored DIV,
    * each step's state mass is Σᵢ vᵢ·p_e6(i→j) DIV 10⁶ (the products
    * are exact BIGINTs — v stays ≈10⁶ per state, so Σ is bounded by
    * |states|·10¹², far under 2⁶³ — and ONE floor per state per
    * step), and the final share renormalizes the drift the per-step
    * floors and any substochastic sink rows leak. The iteration runs
    * as a driver-side fold of |states|-sized (category-bounded, never
    * data-sized) joins; only the lag window touches event volume.
    */
  private val qMarkovStationary: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val seq0 = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val trans = seq0.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("prev_type").agg(sum("n").as("out_n"))
    val p = trans.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"),
        expr("1000000 * n DIV out_n").as("p_e6"))
    // The DISTRIBUTED stage is the event-volume lag window + the
    // transition aggregate above; the matrix is |states|² cells —
    // CATEGORY-bounded, never data-sized — so the three power steps
    // run as driver arithmetic over the collected cells (r16, the
    // qTopEigenvector exception): ≤ |states|² rows ever cross the
    // driver, and the former join-based rounds re-evaluated the whole
    // event-window subtree once per round. Every integer operation is
    // the SAME sequence the former plan (and the unchanged oracle)
    // executes — exact Longs, order-independent sums, one truncating
    // division per state per step — so results are bit-identical.
    import s.implicits._
    val pRows = p.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (pRows.map(_._1) ++ pRows.map(_._2)).distinct
    var v: Map[String, Long] = states.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val stepped = pRows.groupBy(_._2).map { case (nt, rows) =>
        // sum(vin * p_e6) DIV 1e6: operands non-negative, so Scala /
        // (truncate toward zero) ≡ Spark DIV ≡ DuckDB // here
        nt -> rows.iterator.map { case (pt, _, pe6) => v(pt) * pe6 }.sum / 1000000L
      }
      v = states.map(st => st -> stepped.getOrElse(st, 0L)).toMap
    }
    val tv = v.values.sum
    val out: Seq[(String, Long, Long)] =
      if (tv <= 0L) Seq.empty
      else states.sorted.toSeq.map(st =>
        (st, v(st), 1000000L * v(st) / tv))
    out.toDF("state", "mass_e6", "pi_ppm").orderBy("state")
  }

  /** Time-weighted average value per user (TWAP): each event's value
    * holds until the next event, so the mean weights by holding
    * duration, not event count — the metrics/finance complement of the
    * event-weighted `q_decay_wavg`. Σ(cents·gap_µs) and Σ(gap_µs) are
    * exact BIGINTs (bounded by max-cents × observed span ≈ 2e18 even
    * at multi-year spans) and the final ratio is one integer division,
    * so both engines agree bit-for-bit. One partitioned lead window +
    * one keyed aggregate; users with a single event carry no interval
    * and drop out (also guarding the division).
    */
  private val qTwap: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100.0).cast("long").as("cents"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("gap", col("next_us") - col("us"))
      .groupBy("user_id")
      .agg(sum(col("cents") * col("gap")).as("wsum"),
        sum(col("gap")).as("tsum"),
        count(lit(1)).as("n_intervals"))
      .filter(col("tsum") > 0L)
      .select(col("user_id"), expr("wsum DIV tsum").as("twap_cents"),
        col("n_intervals"))
      .orderBy("user_id")
  }

  /** Sequence-pattern matching over event streams (MATCH_RECOGNIZE
    * lite): each user's events collapse — in deterministic (time, id)
    * order — into a string of type initials, and conversion paths are
    * counted as non-overlapping regex matches of `v[^p]*p` (a view
    * followed by its first purchase). The sort happens INSIDE
    * `array_sort` on collected per-user structs (bounded per-user
    * payload, no global sort); the regex is anchored to simple
    * character classes so Java and RE2 agree (the same cross-engine
    * envelope `q_regex_funcs` pins). The general-pattern analytics
    * shape SQL calls MATCH_RECOGNIZE, built from composable pieces.
    */
  private val qSeqPattern: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), col("seq"),
        regexp_count(col("seq"), lit("v[^p]*p")).cast("long").as("n_conv"))
      .orderBy("user_id")

  /** RFM customer segmentation (recency / frequency / monetary): each
    * customer's three metrics rank into quintiles and compose the
    * classic 3-digit segment code. Quintiles are arithmetic buckets
    * over a DISTRIBUTED total-order rank ([[graft.ops.Ranks
    * .globalRowNumber]] — range-partitioned, no single-partition
    * window), with the customer key as tiebreak so both engines bucket
    * identically; the bucket formula ((rn−1)·5 DIV n)+1 is mirrored
    * token-for-token instead of relying on cross-engine `ntile`
    * edge-case parity. Higher score = more recent / more orders / more
    * spend.
    */
  private val qRfm: Q = (s, d) => {
    // materialized before count(): the three rank passes AND the size
    // probe all read the same aggregate — without this, count() ran
    // the orders aggregation as a separate duplicate job
    val base = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(unix_date(to_date(col("o_orderdate"))).cast("long")).as("rec"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100.0).cast("long")).as("mon"))
      .localCheckpoint(true)
    val n = base.count()
    def score(rn: String): org.apache.spark.sql.Column =
      (expr(s"(CAST($rn AS BIGINT) - 1) * 5 DIV ${n}L") + 1L)
    val ranked = graft.ops.Ranks.globalRowNumber(
      graft.ops.Ranks.globalRowNumber(
        graft.ops.Ranks.globalRowNumber(base,
          Seq(col("rec").asc, col("o_custkey").asc), "rn_r"),
        Seq(col("freq").asc, col("o_custkey").asc), "rn_f"),
      Seq(col("mon").asc, col("o_custkey").asc), "rn_m")
    ranked.select(col("o_custkey"),
        score("rn_r").as("r_score"), score("rn_f").as("f_score"),
        score("rn_m").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .orderBy("o_custkey")
  }

  /** Merged-interval coverage (interval union) per user: each event
    * opens a 5-minute activity interval; overlapping intervals fuse
    * into islands and the report is islands + total covered time — the
    * "how long was the user actually active" question sessionization's
    * gap rule approximates from the other direction. The sweep is the
    * gaps-and-islands discipline in exact integer micros: one
    * partitioned window for the exclusive running max of interval ends
    * (an interval starts an island iff it begins strictly after every
    * earlier end), one for the island id running sum — both partitioned
    * by user, so work shards by key at any event volume.
    */
  private val qIntervalUnion: Q = (s, d) => {
    val iv = 300000000L // 5 minutes in micros
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + iv)
    val w = Window.partitionBy("user_id").orderBy(col("st"), col("en"))
    val flagged = ev
      .withColumn("pmax",
        max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("pmax").isNull || col("st") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("opens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(min("st").as("ist"), max("en").as("ien"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist")).as("covered_us"))
      .orderBy("user_id")
  }

  /** Missing-successor gap detection over a key sequence: keys k whose
    * successor k+1 is absent mark the start of a hole in the id space —
    * the sequence-integrity audit (dropped batches, burned identity
    * ranges). ONE self anti join on the shifted key, no global window,
    * no sort: the formulation that scans a 100 TB key column in one
    * shuffle. The corpus's order keys are dense, so the fixture drops
    * multiples of 97 first (documented, mirrored by the oracle) to
    * plant real holes; the trailing max key is excluded via a
    * broadcast single-row max (open-ended, not a gap).
    */
  private val qIdGaps: Q = (s, d) => {
    val keys = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"))
      .filter(col("k") % 97L =!= 0L)
      .distinct()
    keys
      .join(keys.select((col("k") - 1L).as("k")), Seq("k"), "left_anti")
      .crossJoin(broadcast(keys.agg(max(col("k")).as("mx"))))
      .filter(col("k") < col("mx"))
      .select((col("k") + 1L).as("gap_start"))
      .orderBy("gap_start")
  }

  /** Equi-depth (equal-frequency) histogram of order value: 10 buckets
    * of (near-)equal row count with per-bucket min/max/count — the
    * histogram CBO and monitoring actually want for skewed money
    * columns, where [[qHistogram]]-style fixed-width buckets collapse
    * into one hot bin. Bucketing needs every row's global rank:
    * [[graft.ops.Ranks.globalRowNumber]] provides it with no
    * single-partition window anywhere (range-shuffle sort + collected
    * per-partition counts), and `(rank-1)·B DIV n` is exact integer
    * math mirrored token-for-token by the oracle.
    */
  private val qEquidepthHist: Q = (s, d) => {
    val cents = Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
    graft.ops.Ranks
      .globalRowNumber(cents, Seq(col("cents"), col("o_orderkey")), "rn")
      .crossJoin(broadcast(cents.agg(count(lit(1)).as("n"))))
      .withColumn("bucket",
        expr("(CAST(rn AS BIGINT) - 1) * 10 DIV n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), min("cents").as("lo"), max("cents").as("hi"))
      .orderBy("bucket")
  }

  /** Last-touch marketing attribution: each purchase is credited to
    * the user's most recent PRECEDING non-purchase touch (view/click/
    * signup/error — whatever the channel taxonomy is, the op only
    * assumes "not the conversion event"). One user-partitioned window
    * with `last(..., ignoreNulls)` over the strictly-preceding frame —
    * the IGNORE NULLS forward-fill applied to the attribution problem;
    * per-user state is frame-bounded, no global sort, shards by user
    * at any event volume. Purchases with no preceding touch surface
    * with null attribution (first-session conversions), kept —
    * dropping them would silently misreport conversion counts.
    */
  private val qAttribution: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("touch_id",
        last(when(col("event_type") =!= "purchase", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("touch_id"), col("touch_type"))
      .orderBy("user_id", "purchase_id")
  }

  /** Period-over-period revenue report: monthly order revenue with the
    * previous month's value, absolute delta, and growth in exact ppm.
    * The month aggregate collapses the fact table first (the window
    * then runs over #months rows — never data-sized), and the growth
    * ratio is integer division, portable even for NEGATIVE deltas:
    * both Spark's `DIV` and DuckDB's integer `//` truncate toward
    * zero (measured — DuckDB floors only for float operands). Bound:
    * |delta| ≤ ~9.2e12 cents before the e6 scaling overflows Long.
    */
  private val qPeriodOverPeriod: Q = (s, d) => {
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("cents"))
    val w = Window.orderBy(col("month_start"))
    monthly
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("delta_cents", col("cents") - col("prev_cents"))
      .withColumn("growth_ppm",
        expr("CAST(1000000 * delta_cents DIV prev_cents AS BIGINT)"))
      .orderBy("month_start")
  }

  /** Per-priority OLS revenue trend: daily revenue regressed on the
    * day index, slope reported as exact integer cents/day plus the raw
    * regression numerator/denominator. The fact table collapses to one
    * row per (priority, day) FIRST (keyed shuffle — the window-free
    * shape), x is centered per group at its first day so every moment
    * fits a BIGINT (bound: n·Σxy needs n·span²·daily_cents ≤ 9.2e18 —
    * holds through ~decade spans at ~1e8 daily cents per group; past
    * that, promote the two products to DECIMAL(38,0) on both engines),
    * and slope = (n·Σxy − Σx·Σy) DIV (n·Σx² − (Σx)²) is integer
    * arithmetic both engines truncate identically. n_days ≥ 2 on the
    * COLLAPSED table guarantees den > 0 (two distinct x values).
    */
  private val qLinregTrend: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("y"))
    val first = daily.groupBy("priority").agg(min("day").as("d0"))
    daily.join(broadcast(first), "priority")
      .withColumn("x", col("day") - col("d0"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n_days") >= 2L)
      .select(col("priority"), col("n_days"), col("sy").as("sum_cents"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"),
        expr("(n_days * sxy - sx * sy) DIV (n_days * sxx - sx * sx)")
          .as("slope_cpd"))
      .orderBy("priority")
  }

  /** Lag-1 autocorrelation of the daily order-count series: Pearson r
    * over consecutive-calendar-day pairs (y_t, y_{t+1}) — the "is
    * yesterday's volume predictive" seasonality probe. All six moments
    * are exact BIGINTs; r derives from them in ONE fixed float
    * sequence (num / √den₁ / √den₂ — IEEE sqrt and division are
    * correctly rounded, so both engines agree bit-for-bit, the
    * `q_stats_moments` discipline). The lead window runs over the
    * COLLAPSED day table only — calendar-bounded, never data-sized
    * (the `q_period_over_period` precedent); gaps in the calendar
    * pair with nothing and drop out rather than faking adjacency.
    */
  private val qAutocorr: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.orderBy("day")
    daily
      .withColumn("dn", lead(col("day"), 1).over(w))
      .withColumn("yn", lead(col("y"), 1).over(w))
      .filter(col("dn") === col("day") + 1L)
      .agg(count(lit(1)).as("m"), sum("y").as("sa"), sum("yn").as("sb"),
        sum(col("y") * col("yn")).as("sab"),
        sum(col("y") * col("y")).as("saa"),
        sum(col("yn") * col("yn")).as("sbb"))
      .filter(col("m") * col("saa") - col("sa") * col("sa") > 0L &&
        col("m") * col("sbb") - col("sb") * col("sb") > 0L)
      .select(col("m"), col("sa"), col("sb"), col("sab"),
        floor((col("m") * col("sab") - col("sa") * col("sb")).cast("double") /
          sqrt((col("m") * col("saa") - col("sa") * col("sa")).cast("double")) /
          sqrt((col("m") * col("sbb") - col("sb") * col("sb")).cast("double")) *
          lit(1000000.0)).cast("long").as("r_e6"))
      .orderBy("m")
  }

  /** Winsorization: clamp event values to their group's exact discrete
    * [p10, p90] order statistics — the outlier treatment that CAPS
    * instead of dropping (the robust-prep complement of
    * `q_mad_outliers`). Bounds use the INCLUSIVE rank ceil(q·n) =
    * (q·n + 9) DIV 10 — integer arithmetic mirrored token-for-token,
    * no interpolation to drift cross-engine. One partitioned rank
    * window finds the bounds; the 5-row bound table broadcasts back —
    * per-group work shards by event_type at any volume.
    */
  private val qWinsorize: Q = (s, d) => {
    val c = Tables.events(s, d).select(col("event_id"), col("event_type"),
      round(col("value") * 100.0).cast("long").as("cents"))
    val w = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
    val r = c.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val lo = r.filter(expr("rn = (n + 9) DIV 10"))
      .select(col("event_type"), col("cents").as("lo"))
    val hi = r.filter(expr("rn = (9 * n + 9) DIV 10"))
      .select(col("event_type"), col("cents").as("hi"))
    c.join(broadcast(lo), "event_type").join(broadcast(hi), "event_type")
      .select(col("event_id"), col("event_type"), col("cents"),
        least(greatest(col("cents"), col("lo")), col("hi")).as("w_cents"))
      .orderBy("event_id")
  }

  /** Gini coefficient of customer spend concentration — the standard
    * inequality measure G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over
    * ascending-sorted per-customer totals. The global rank comes from
    * [[graft.ops.Ranks.globalRowNumber]] (range-partitioned — no
    * single-partition window), ties break on the customer key but the
    * rank-weighted sum is tie-order-invariant (equal x across a tied
    * rank block sums the same ranks either way). gini_e6 =
    * num DIV (den DIV 10⁶) is DEFINED arithmetic, not a rounding of
    * the real ratio — both engines execute the identical token
    * sequence. BIGINT bound: Σi·xᵢ ≤ n²·avg_cents needs n ≲ 6e8
    * dollar-scale customers; past that promote to DECIMAL(38,0).
    */
  private val qGini: Q = (s, d) => {
    val mon = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("mon"))
    graft.ops.Ranks.globalRowNumber(mon,
        Seq(col("mon").asc, col("o_custkey").asc), "i")
      .agg(count(lit(1)).as("n"), sum("mon").as("s"),
        sum(col("i").cast("long") * col("mon")).as("si"))
      .filter(col("n") * col("s") >= 1000000L)
      .select(col("n"), col("s").as("sum_cents"),
        (lit(2L) * col("si") - (col("n") + 1L) * col("s")).as("num"),
        (col("n") * col("s")).as("den"),
        expr("(2 * si - (n + 1) * s) DIV ((n * s) DIV 1000000)").as("gini_e6"))
      .orderBy("n")
  }

  /** Chi-square contingency analysis of market segment × order
    * priority: the observed-vs-expected independence test behind every
    * "are these two categoricals related" question. Each cell's
    * χ² contribution (o−e)²/e is re-expressed over the common
    * denominator — (o·N − r·c)² / (r·c·N) — so the whole table is
    * integer arithmetic: expected counts as exact floored millionths,
    * contributions via the `num DIV (den DIV 10⁶)` defined-arithmetic
    * discipline. One broadcast dim join + one keyed count; row/column
    * totals re-join as broadcasts (cells = |segments|×|priorities|,
    * tiny at any fact volume). BIGINT bound: |o·N − r·c| stays ≤ ~3e9
    * (square ≤ 9.2e18) while no row/column holds more than ~⅓ of a
    * 1.5e5-order corpus slice — holds with wide margin for
    * near-uniform marginals at every test SF; promote the square to
    * DECIMAL(38,0) for adversarial skew at larger N.
    */
  private val qChisqContingency: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy("seg").agg(sum("o").as("r"))
    val colT = cells.groupBy("prio").agg(sum("o").as("c"))
    cells.join(broadcast(rowT), "seg").join(broadcast(colT), "prio")
      .crossJoin(broadcast(cells.agg(sum("o").as("n"))))
      .select(col("seg"), col("prio"), col("o"),
        expr("1000000 * r * c DIV n").as("e_e6"),
        expr("(o * n - r * c) * (o * n - r * c) DIV ((r * c * n) DIV 1000000)")
          .as("chi2_e6"))
      .orderBy("seg", "prio")
  }

  /** Running distinct-user counts per day — the cumulative-reach curve
    * ("how many unique users have we EVER seen as of day d"). Naive
    * running COUNT(DISTINCT) over an expanding frame rescans history
    * per day; the first-seen collapse makes it incremental: each
    * user's min event day (one keyed aggregate), new users per day,
    * then one running sum over the CALENDAR-bounded day table (the
    * `q_period_over_period` window-over-collapsed-table discipline).
    * Days with activity but no first-timers still appear, with
    * new_users = 0 — the left join from active days keeps them.
    */
  private val qRunningDistinct: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
    val firstSeen = days.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val active = days.select("day").distinct()
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    active.join(firstSeen, Seq("day"), "left")
      .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("day")
  }

  /** Gap-filled time spine: daily order counts where days with NO
    * orders appear explicitly as zero rows — the spine generation every
    * time-series report needs before rates, moving averages, or SLA
    * charts mean anything (`q_window_fill` forward-fills values on
    * EXISTING rows; this materializes the missing rows themselves).
    * The spine explodes from a single min/max row and is
    * calendar-bounded — ~2.4k days here, never data-sized — and the
    * zero-fill left join shuffles only the day-collapsed count table.
    * sf0.001's 1.5k orders over those days leave real holes, so the
    * fixture exercises genuine gap rows at every test scale.
    */
  private val qTimeSpine: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    daily.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** Spearman rank correlation between per-customer order count and
    * total spend — the robust (monotone-invariant, outlier-resistant)
    * complement of `q_autocorr`'s Pearson machinery. Both rankings are
    * DISTRIBUTED total-order row numbers ([[graft.ops.Ranks
    * .globalRowNumber]], range-partitioned — no single-partition
    * window), ties broken by the customer key and mirrored
    * token-for-token by the oracle (documented deviation from
    * average-rank Spearman: with row-number ranks the statistic is
    * still distribution-free and cross-engine EXACT, which this
    * registry values over textbook tie handling). n and Σd² are exact
    * BIGINTs; ρ_e6 = floor(10⁶·(1 − 6·Σd²/(n(n²−1)))) derives from
    * them in ONE fixed float sequence — IEEE division/multiplication
    * are correctly rounded, so both engines agree bit-for-bit (the
    * `q_autocorr` discipline; an all-integer 6·10⁶·Σd² numerator
    * would overflow BIGINT already at n ≈ 1.6e4). Headroom: den =
    * n(n²−1) and Σd² ≤ den/3 stay in BIGINT through n ≈ 2e6 ranked
    * keys — promote the sums to DECIMAL(38,0) past that.
    */
  private val qSpearman: Q = (s, d) => {
    val base = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("freq"),
        sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("mon"))
    val ranked = graft.ops.Ranks.globalRowNumber(
      graft.ops.Ranks.globalRowNumber(base,
        Seq(col("freq").asc, col("o_custkey").asc), "rx"),
      Seq(col("mon").asc, col("o_custkey").asc), "ry")
    ranked
      .select((col("rx").cast("long") - col("ry").cast("long")).as("dd"))
      .agg(count(lit(1)).as("n"), sum(col("dd") * col("dd")).as("sd2"))
      .filter(col("n") >= 2L)
      .select(col("n"), col("sd2"),
        floor(lit(1000000.0) * (lit(1.0) - lit(6.0) *
          (col("sd2").cast("double") /
            (col("n") * (col("n") * col("n") - 1L)).cast("double"))))
          .cast("long").as("rho_e6"))
      .orderBy("n")
  }

  /** Per-group mode (most frequent value, smallest wins ties) with its
    * frequency — the categorical summary statistic. Two keyed hash
    * aggregates: value-level counts, then max_by over ONE scalar
    * composite key cnt·10⁵ − cents that encodes "highest count, then
    * smallest value" (DuckDB's max_by takes no struct keys, so the
    * ordering must be arithmetic to mirror). Precondition 0 ≤ cents <
    * 10⁵ (holds for this corpus: values ∈ [0, 560.21] — and the spec
    * asserts it on the fixture); cnt·10⁵ fits BIGINT everywhere.
    * No window, no per-group value buffering: shards by (group, value)
    * then group at any volume.
    */
  private val qMode: Q = (s, d) => {
    val counts = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
    counts
      .groupBy("event_type")
      .agg(max_by(col("cents"), col("cnt") * lit(100000L) - col("cents"))
          .as("mode_cents"),
        max("cnt").as("n_mode"))
      .orderBy("event_type")
  }

  /** Per-brand OLS slope of quantity on order value (the grouped-
    * regression / elasticity readout): slope_e9 from exact integer
    * moments, n·Σxy − Σx·Σy over n·Σx² − (Σx)². Dollars (not cents)
    * keep Σx² BIGINT-safe to ~10⁸ rows/brand; the cross PRODUCTS still
    * promote to DECIMAL(38,0)/HUGEINT (the q_assortativity discipline)
    * with one float division at the end. Degenerate single-price
    * brands (zero denominator) report slope 0 on both engines.
    */
  private val qGroupedRegression: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        round(col("l_extendedprice")).cast("long").as("x"),
        round(col("l_quantity")).cast("long").as("y"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    li.groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n"),
        when(dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
            === lit(0).cast("decimal(38,0)"), lit(0L))
          .otherwise(floor(lit(1000000000.0) *
            (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy")))
              .cast("double") /
            (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
              .cast("double")).cast("long"))
          .as("slope_e9"))
      .orderBy(col("p_brand"))
  }

  /** Cohort revenue curve: customers grouped by first-order month, each
    * cohort's per-member average revenue at every month age — the ARPU
    * trajectory behind LTV models (q_cohort_retention's revenue
    * sibling). Cohort month and age are pure integer month indexes
    * (immune to date-diff convention splits); ARPU is exact
    * `Σcents DIV cohort_size`. Two shuffles: the per-customer min-month
    * aggregate and the (cohort, age) rollup.
    */
  private val qCohortRevenue: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("m"),
      round(col("o_totalprice") * 100.0).cast("long").as("cents"))
    val cohort = o.groupBy("o_custkey").agg(min("m").as("cm"))
    val size = cohort.groupBy("cm").agg(count(lit(1)).as("n_customers"))
    o.join(cohort, "o_custkey")
      .groupBy(col("cm"), (col("m") - col("cm")).as("age"))
      .agg(sum("cents").as("sum_cents"))
      .join(size, "cm")
      .select(col("cm").as("cohort_month"), col("age"), col("n_customers"),
        col("sum_cents"),
        expr("sum_cents DIV n_customers").as("arpu_cents"))
      .orderBy(col("cohort_month"), col("age"))
  }

  /** Peak concurrency of order→ship intervals: the max number of
    * lineitems simultaneously in flight, plus the first day the peak is
    * reached — the warehouse-load high-water mark. Sweep-line as data:
    * each interval emits (+1 at order day, −1 at ship day, half-open),
    * the running sum rides [[graft.ops.Ranks.globalRunningSum]]
    * (per-partition subtotal offsets — no single-partition window), and
    * the peak is one scalar aggregate over the boundary stream. Ends
    * sort before starts on the same day, so touching intervals never
    * double-count.
    */
  private val qPeakConcurrency: Q = (s, d) => {
    val iv = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("d0"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("d1"))
      .filter(col("d1") > col("d0"))
    val bounds = iv.select(col("d0").as("day"), lit(1L).as("delta"))
      .unionAll(iv.select(col("d1").as("day"), lit(-1L).as("delta")))
    val run = graft.ops.Ranks.globalRunningSum(bounds,
      Seq(col("day").asc, col("delta").asc), col("delta"), "conc")
    // peak and its first day in ONE pass: max(struct(conc, −day)) is
    // (max conc, −(min day among peak rows)) under lexicographic struct
    // order — referencing `run` twice would re-run the global sort
    run.agg(max(struct(col("conc"), (-col("day")).as("nd"))).as("m"))
      .select(col("m.conc").as("peak"), (-col("m.nd")).as("peak_day"))
      .orderBy(col("peak"))
  }

  /** Order→ship cycle-time percentiles per priority: exact discrete
    * order statistics (value at rank ⌈q·n⌉, the `q_trimmed_mean` rank
    * convention) over day-granularity latency — the fulfillment-SLA
    * readout. Integer days end to end; ranks ride per-priority windows
    * (5 balanced partitions), ties broken on the line identity, which
    * cannot change the k-th smallest VALUE.
    */
  private val qCycleTime: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lat"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("priority"))
      .orderBy(col("lat"), col("l_orderkey"), col("l_linenumber"))
    val n = li.groupBy("priority").agg(count(lit(1)).as("n"))
    li.withColumn("rn", row_number().over(w))
      .join(n, "priority")
      .groupBy(col("priority"), col("n"))
      .agg(max(when(col("rn") === expr("(50 * n + 99) DIV 100"), col("lat")))
        .as("p50_days"),
        max(when(col("rn") === expr("(90 * n + 99) DIV 100"), col("lat")))
          .as("p90_days"))
      .orderBy(col("priority"))
  }

  /** Basket-size distribution: how many orders contain k lineitems —
    * the order-composition histogram behind packaging/pricing analyses.
    * Two partial-agg shuffles, output bounded by max basket size.
    */
  private val qBasketSizeDist: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("basket_size"))
      .groupBy("basket_size").agg(count(lit(1)).as("n_orders"))
      .orderBy(col("basket_size"))

  /** 2-D histogram: order-value decile × basket-size band heat counts
    * — the joint-distribution readout behind a pricing/mix heatmap (do
    * big orders have big baskets?). Deciles ride the distributed
    * total-order rank; bands are fixed integer cuts; output is a
    * ≤30-cell table from one join + one partial-agg shuffle.
    */
  private val qHist2d: Q = (s, d) => {
    val b = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("basket"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"))
      .join(b, col("o_orderkey") === col("l_orderkey"))
    val ranked = graft.ops.Ranks.globalRowNumber(o,
      Seq(col("cents").asc, col("o_orderkey").asc), "rnk")
    val tot = o.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .select(expr("(CAST(rnk AS BIGINT) - 1) * 10 DIV n").as("price_decile"),
        when(col("basket") <= 2L, "1-2").when(col("basket") <= 4L, "3-4")
          .otherwise("5+").as("basket_band"))
      .groupBy("price_decile", "basket_band")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("price_decile", "basket_band")
  }

  /** Second frequency moment F₂ of user activity per event type — the
    * self-join-size / skew statistic (F₂ ≫ n·mean ⟹ a hot-key shuffle
    * hazard at scale), exact from the per-user frequency table, PLUS
    * the AMS sign-sketch estimate of the same quantity: four
    * Rademacher streams from bits 0–3 of the user md5, est = mean of
    * (Σ±f_u)² — the sketch that estimates F₂ in O(1) memory when the
    * user grain itself won't fit. Both exact and estimate are pure
    * BIGINT (z ≤ n_events, z² headroom to ~3·10⁹ events/type) and
    * bit-identical cross-engine, so the key doubles as an accuracy
    * readout of the sketch against truth. One user-grain partial agg,
    * then a per-type reduce.
    */
  private val qAmsF2: Q = (s, d) => {
    val f = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("fu"))
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
    val aggs = Seq(count(lit(1)).as("n_users"), sum("fu").as("n_events"),
      sum(col("fu") * col("fu")).as("f2")) ++
      (0 until 4).map { j =>
        sum(expr(s"(1 - 2 * ((h DIV ${1 << j}) % 2)) * fu")).as(s"z$j")
      }
    f.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), col("n_users"), col("n_events"), col("f2"),
        expr("(z0*z0 + z1*z1 + z2*z2 + z3*z3) DIV 4").as("ams_f2_est"))
      .orderBy("event_type")
  }

  /** Position-based (U-shaped) multi-touch attribution: each purchase's
    * journey — the view/click touches since the user's previous
    * purchase — splits one conversion's credit 40% first / 40% last /
    * 20% across middles, the model between `q_attribution`'s
    * last-touch-takes-all and linear splits. Credit is integer ppm with
    * deterministic remainders (middles floor 200000 DIV (k−2); the mod
    * lands on the LAST touch), so Σchannel credit = 10⁶ · attributed
    * conversions EXACTLY — the conservation law the spec pins. Every
    * window is user- or journey-partitioned; the journey id is an
    * exclusive running purchase count, one pass.
    */
  private val qAttributionPosition: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), expr("unix_micros(ts)").as("us"))
    val prior = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val jny = ev.withColumn("journey",
      coalesce(sum((col("event_type") === "purchase").cast("long"))
        .over(prior), lit(0L)))
    val touches = jny.filter(col("event_type").isin("view", "click"))
    val convs = jny.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("journey"), col("event_id").as("conv_id"))
    val tw = Window.partitionBy("user_id", "journey")
      .orderBy(col("us").asc, col("event_id").asc)
    val ranked = touches.join(convs, Seq("user_id", "journey"))
      .withColumn("rn", row_number().over(tw))
      .withColumn("k",
        count(lit(1)).over(Window.partitionBy("user_id", "journey")))
    ranked
      .withColumn("w_ppm",
        when(col("k") === 1L, 1000000L)
          .when(col("k") === 2L, 500000L)
          .when(col("rn") === 1, 400000L)
          .when(col("rn") === col("k"), expr("400000 + 200000 % (k - 2)"))
          .otherwise(expr("200000 DIV (k - 2)")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum("w_ppm").as("credit_ppm"))
      .orderBy("event_type")
  }

  /** Shapley-value channel attribution under the standard "any
    * nonempty touched set converts" coalition game: each DISTINCT
    * channel in a converting journey gets exactly 1/k of the credit
    * (the Shapley value of the symmetric game — by symmetry and
    * efficiency, no enumeration needed), which is what separates it
    * from `q_attribution`'s per-touch linear split (a channel touched
    * five times earns 5× there, 1× here) and the position-based
    * U-shape. Credit 10⁶ DIV k is exact integer; the journey
    * segmentation is the shared prior-purchase running count.
    */
  private val qAttributionShapley: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), expr("unix_micros(ts)").as("us"))
    val prior = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val jny = ev.withColumn("journey",
      coalesce(sum((col("event_type") === "purchase").cast("long"))
        .over(prior), lit(0L)))
    val touches = jny.filter(col("event_type").isin("view", "click"))
    val convs = jny.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("journey"), col("event_id").as("conv_id"))
    val dist = touches.join(convs, Seq("user_id", "journey"))
      .select(col("user_id"), col("journey"), col("conv_id"),
        col("event_type")).distinct()
    dist
      .withColumn("k",
        count(lit(1)).over(Window.partitionBy("user_id", "journey")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_journeys"),
        sum(expr("1000000 DIV k")).as("credit_ppm"))
      .orderBy("event_type")
  }

  /** Hour-of-day × day-of-week activity heatmap over the event stream —
    * the load-profile readout behind capacity planning and send-time
    * optimization. Both axes are pure integer arithmetic on epoch
    * micros (immune to the engines' hour/weekday function numbering),
    * one partial-agg shuffle into ≤168 cells.
    */
  private val qHourDowHeatmap: Q = (s, d) =>
    Tables.events(s, d)
      .select(expr("((unix_micros(ts) DIV 86400000000) + 3) % 7").as("dow"),
        expr("(unix_micros(ts) DIV 3600000000) % 24").as("hr"),
        round(col("value") * 100.0).cast("long").as("cents"))
      .groupBy("dow", "hr")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .orderBy("dow", "hr")

  val registry: Map[String, Q] = Map(
    "q_ams_f2" -> qAmsF2,
    "q_attribution_position" -> qAttributionPosition,
    "q_attribution_shapley" -> qAttributionShapley,
    "q_hour_dow_heatmap" -> qHourDowHeatmap,
    "q_hist2d" -> qHist2d,
    "q_basket_size_dist" -> qBasketSizeDist,
    "q_cycle_time" -> qCycleTime,
    "q_grouped_regression" -> qGroupedRegression,
    "q_cohort_revenue" -> qCohortRevenue,
    "q_peak_concurrency" -> qPeakConcurrency,
    "q_spearman" -> qSpearman,
    "q_mode" -> qMode,
    "q_time_spine" -> qTimeSpine,
    "q_chisq_contingency" -> qChisqContingency,
    "q_running_distinct" -> qRunningDistinct,
    "q_linreg_trend" -> qLinregTrend,
    "q_autocorr" -> qAutocorr,
    "q_winsorize" -> qWinsorize,
    "q_gini" -> qGini,
    "q_attribution" -> qAttribution,
    "q_period_over_period" -> qPeriodOverPeriod,
    "q_interval_union" -> qIntervalUnion,
    "q_id_gaps" -> qIdGaps,
    "q_equidepth_hist" -> qEquidepthHist,
    "q_rfm" -> qRfm,
    "q_seq_pattern" -> qSeqPattern,
    "q_twap" -> qTwap,
    "q_markov_transitions" -> qMarkovTransitions,
    "q_markov_stationary" -> qMarkovStationary,
    "q_exact_median" -> qExactMedian,
    "q_cohort_retention" -> qCohortRetention,
    "q_decay_wavg" -> qDecayWavg,
    "q_funnel" -> qFunnel,
    "q_funnel_window" -> qFunnelWindow,
    "q_seasonal_decompose" -> qSeasonalDecompose,
    "q_changepoint" -> qChangepoint,
    "q_label_centroids" -> qLabelCentroids,
    "q_mad_outliers" -> qMadOutliers,
    "q_skyline" -> qSkyline,
  )

  val oracle: Map[String, String] = Map(
    "q_attribution_position" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |jny AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS journey
        |  FROM ev),
        |touches AS (SELECT * FROM jny WHERE event_type IN ('view', 'click')),
        |convs AS (SELECT user_id, journey, event_id AS conv_id
        |  FROM jny WHERE event_type = 'purchase'),
        |ranked AS (SELECT t.user_id, t.event_type, t.us, t.event_id, conv_id,
        |    row_number() OVER (PARTITION BY t.user_id, t.journey
        |      ORDER BY t.us ASC, t.event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY t.user_id, t.journey) AS k
        |  FROM touches t JOIN convs c
        |    ON t.user_id = c.user_id AND t.journey = c.journey),
        |credit AS (SELECT event_type, conv_id,
        |    CASE WHEN k = 1 THEN 1000000
        |         WHEN k = 2 THEN 500000
        |         WHEN rn = 1 THEN 400000
        |         WHEN rn = k THEN 400000 + 200000 % (k - 2)
        |         ELSE 200000 // (k - 2) END AS w_ppm
        |  FROM ranked)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
        |  CAST(sum(w_ppm) AS BIGINT) AS credit_ppm
        |FROM credit GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_attribution_shapley" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |jny AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS journey
        |  FROM ev),
        |touches AS (SELECT * FROM jny WHERE event_type IN ('view', 'click')),
        |convs AS (SELECT user_id, journey, event_id AS conv_id
        |  FROM jny WHERE event_type = 'purchase'),
        |dist AS (SELECT DISTINCT t.user_id, t.journey, conv_id,
        |    t.event_type
        |  FROM touches t JOIN convs c
        |    ON t.user_id = c.user_id AND t.journey = c.journey),
        |k AS (SELECT *, count(*) OVER (PARTITION BY user_id, journey)
        |    AS k FROM dist)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_journeys,
        |  CAST(sum(1000000 // k) AS BIGINT) AS credit_ppm
        |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_hour_dow_heatmap" ->
      """SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
        |  (epoch_us(ts) // 3600000000) % 24 AS hr,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin,
    "q_ams_f2" ->
      """WITH f AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS fu
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, fu,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM f),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(fu) AS BIGINT) AS n_events,
        |    CAST(sum(fu * fu) AS BIGINT) AS f2,
        |    CAST(sum((1 - 2 * ((h // 1) % 2)) * fu) AS BIGINT) AS z0,
        |    CAST(sum((1 - 2 * ((h // 2) % 2)) * fu) AS BIGINT) AS z1,
        |    CAST(sum((1 - 2 * ((h // 4) % 2)) * fu) AS BIGINT) AS z2,
        |    CAST(sum((1 - 2 * ((h // 8) % 2)) * fu) AS BIGINT) AS z3
        |  FROM h GROUP BY 1)
        |SELECT event_type, n_users, n_events, f2,
        |  CAST((z0*z0 + z1*z1 + z2*z2 + z3*z3) // 4 AS BIGINT) AS ams_f2_est
        |FROM g ORDER BY event_type""".stripMargin,
    "q_hist2d" ->
      """WITH b AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS basket
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents, basket
        |  FROM orders JOIN b ON o_orderkey = l_orderkey),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (ORDER BY cents ASC, o_orderkey ASC) AS BIGINT) AS rnk
        |  FROM o),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |c AS (SELECT (rnk - 1) * 10 // n AS price_decile,
        |    CASE WHEN basket <= 2 THEN '1-2' WHEN basket <= 4 THEN '3-4'
        |      ELSE '5+' END AS basket_band
        |  FROM r CROSS JOIN t)
        |SELECT CAST(price_decile AS BIGINT) AS price_decile, basket_band,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM c GROUP BY 1, 2 ORDER BY price_decile, basket_band""".stripMargin,
    "q_basket_size_dist" ->
      """WITH b AS (SELECT l_orderkey, CAST(count(*) AS BIGINT)
        |    AS basket_size
        |  FROM lineitem GROUP BY 1)
        |SELECT basket_size, CAST(count(*) AS BIGINT) AS n_orders
        |FROM b GROUP BY 1 ORDER BY basket_size""".stripMargin,
    "q_cycle_time" ->
      """WITH li AS (SELECT o_orderpriority AS priority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lat,
        |    l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |n AS (SELECT priority, CAST(count(*) AS BIGINT) AS n
        |  FROM li GROUP BY 1),
        |r AS (SELECT li.priority, lat, n,
        |    CAST(row_number() OVER (PARTITION BY li.priority
        |      ORDER BY lat, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM li JOIN n ON li.priority = n.priority)
        |SELECT priority, n,
        |  max(CASE WHEN rn = (50 * n + 99) // 100 THEN lat END) AS p50_days,
        |  max(CASE WHEN rn = (90 * n + 99) // 100 THEN lat END) AS p90_days
        |FROM r GROUP BY 1, 2 ORDER BY priority""".stripMargin,
    "q_grouped_regression" ->
      """WITH li AS (SELECT p_brand,
        |    CAST(round(l_extendedprice) AS BIGINT) AS x,
        |    CAST(round(l_quantity) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM li GROUP BY 1)
        |SELECT p_brand, n,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
        |    THEN 0
        |    ELSE CAST(floor(1000000000.0 *
        |      CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |        AS DOUBLE) /
        |      CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |        AS DOUBLE)) AS BIGINT) END AS slope_e9
        |FROM m ORDER BY p_brand""".stripMargin,
    "q_cohort_revenue" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS m,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
        |sz AS (SELECT cm, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM c GROUP BY 1),
        |a AS (SELECT c.cm, o.m - c.cm AS age,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM o JOIN c USING (o_custkey) GROUP BY 1, 2)
        |SELECT a.cm AS cohort_month, age, n_customers, sum_cents,
        |  CAST(sum_cents // n_customers AS BIGINT) AS arpu_cents
        |FROM a JOIN sz ON a.cm = sz.cm
        |ORDER BY cohort_month, age""".stripMargin,
    "q_peak_concurrency" ->
      """WITH iv0 AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS d0,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS d1
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |iv AS (SELECT * FROM iv0 WHERE d1 > d0),
        |b AS (SELECT d0 AS day, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL SELECT d1, CAST(-1 AS BIGINT) FROM iv),
        |r AS (SELECT day, delta,
        |    sum(delta) OVER (ORDER BY day, delta ROWS UNBOUNDED PRECEDING)
        |      AS conc
        |  FROM b),
        |p AS (SELECT CAST(max(conc) AS BIGINT) AS peak FROM r)
        |SELECT peak,
        |  CAST((SELECT min(day) FROM r WHERE conc = peak) AS BIGINT)
        |    AS peak_day
        |FROM p ORDER BY peak""".stripMargin,
    "q_spearman" ->
      """WITH b AS (SELECT o_custkey, count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS mon
        |  FROM orders GROUP BY 1),
        |r AS (SELECT
        |    row_number() OVER (ORDER BY freq, o_custkey) AS rx,
        |    row_number() OVER (ORDER BY mon, o_custkey) AS ry
        |  FROM b),
        |a AS (SELECT count(*) AS n,
        |        sum((rx - ry) * (rx - ry)) AS sd2 FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sd2 AS BIGINT) AS sd2,
        |  CAST(floor(1000000.0 * (1.0 - 6.0 *
        |    (CAST(sd2 AS DOUBLE) / CAST(n * (n * n - 1) AS DOUBLE))))
        |    AS BIGINT) AS rho_e6
        |FROM a WHERE n >= 2 ORDER BY n""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(max_by(cents, cnt * 100000 - cents) AS BIGINT) AS mode_cents,
        |  CAST(max(cnt) AS BIGINT) AS n_mode
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_time_spine" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS n
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(unnest(generate_series(d0, d1)) AS BIGINT) AS day
        |      FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily))
        |SELECT s.day, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM s LEFT JOIN daily ON s.day = daily.day
        |ORDER BY s.day""".stripMargin,
    "q_chisq_contingency" ->
      """WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
        |    count(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT prio, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
        |SELECT seg, prio, CAST(o AS BIGINT) AS o,
        |  CAST(1000000 * r * c // n AS BIGINT) AS e_e6,
        |  CAST((o * n - r * c) * (o * n - r * c) // ((r * c * n) // 1000000)
        |    AS BIGINT) AS chi2_e6
        |FROM cells JOIN rt USING (seg) JOIN ct USING (prio) CROSS JOIN nt
        |ORDER BY seg, prio""".stripMargin,
    "q_running_distinct" ->
      """WITH d AS (SELECT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |fs AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |       FROM (SELECT user_id, min(day) AS day FROM d GROUP BY user_id)
        |       GROUP BY day),
        |act AS (SELECT DISTINCT day FROM d)
        |SELECT act.day, coalesce(new_users, 0) AS new_users,
        |  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY act.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM act LEFT JOIN fs ON act.day = fs.day
        |ORDER BY act.day""".stripMargin,
    "q_linreg_trend" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT priority, min(day) AS d0 FROM daily GROUP BY 1),
        |c AS (SELECT daily.priority, day - d0 AS x, y
        |      FROM daily JOIN m ON daily.priority = m.priority),
        |a AS (SELECT priority, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM c GROUP BY 1)
        |SELECT priority, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(sy AS BIGINT) AS sum_cents,
        |  CAST(n_days * sxy - sx * sy AS BIGINT) AS num,
        |  CAST(n_days * sxx - sx * sx AS BIGINT) AS den,
        |  CAST((n_days * sxy - sx * sy) // (n_days * sxx - sx * sx) AS BIGINT)
        |    AS slope_cpd
        |FROM a WHERE n_days >= 2 ORDER BY priority""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT day, y,
        |    lead(day) OVER (ORDER BY day) AS dn,
        |    lead(y) OVER (ORDER BY day) AS yn
        |  FROM daily),
        |a AS (SELECT count(*) AS m, sum(y) AS sa, sum(yn) AS sb,
        |        sum(y * yn) AS sab, sum(y * y) AS saa, sum(yn * yn) AS sbb
        |      FROM p WHERE dn = day + 1)
        |SELECT CAST(m AS BIGINT) AS m, CAST(sa AS BIGINT) AS sa,
        |  CAST(sb AS BIGINT) AS sb, CAST(sab AS BIGINT) AS sab,
        |  CAST(floor(CAST(m * sab - sa * sb AS DOUBLE)
        |    / sqrt(CAST(m * saa - sa * sa AS DOUBLE))
        |    / sqrt(CAST(m * sbb - sb * sb AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS r_e6
        |FROM a
        |WHERE m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
        |ORDER BY m""".stripMargin,
    "q_winsorize" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c),
        |lo AS (SELECT event_type, cents AS lo FROM r WHERE rn = (n + 9) // 10),
        |hi AS (SELECT event_type, cents AS hi FROM r
        |       WHERE rn = (9 * n + 9) // 10)
        |SELECT event_id, c.event_type, cents,
        |  least(greatest(cents, lo), hi) AS w_cents
        |FROM c JOIN lo ON c.event_type = lo.event_type
        |       JOIN hi ON c.event_type = hi.event_type
        |ORDER BY event_id""".stripMargin,
    "q_gini" ->
      """WITH mon AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS mon
        |  FROM orders GROUP BY 1),
        |r AS (SELECT mon,
        |    row_number() OVER (ORDER BY mon, o_custkey) AS i FROM mon),
        |a AS (SELECT count(*) AS n, sum(mon) AS s, sum(i * mon) AS si FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_cents,
        |  CAST(2 * si - (n + 1) * s AS BIGINT) AS num,
        |  CAST(n * s AS BIGINT) AS den,
        |  CAST((2 * si - (n + 1) * s) // ((n * s) // 1000000) AS BIGINT)
        |    AS gini_e6
        |FROM a WHERE n * s >= 1000000 ORDER BY n""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |t AS (SELECT user_id, event_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_id,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type
        |  FROM e)
        |SELECT user_id, event_id AS purchase_id, touch_id, touch_type
        |FROM t WHERE event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin,
    "q_period_over_period" ->
      """WITH m AS (SELECT date_trunc('month', o_orderdate) AS month_start,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month_start, cents,
        |    lag(cents) OVER (ORDER BY month_start) AS prev_cents
        |  FROM m)
        |SELECT month_start, cents, prev_cents,
        |  cents - prev_cents AS delta_cents,
        |  CAST(1000000 * (cents - prev_cents) // prev_cents AS BIGINT)
        |    AS growth_ppm
        |FROM l ORDER BY month_start""".stripMargin,
    "q_interval_union" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + 300000000 AS en FROM events),
        |fl AS (SELECT user_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM ev),
        |isl AS (SELECT user_id, st, en,
        |    sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fl),
        |g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(ien - ist) AS BIGINT) AS covered_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_id_gaps" ->
      """WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |           WHERE o_orderkey % 97 <> 0)
        |SELECT k + 1 AS gap_start FROM k
        |WHERE k + 1 NOT IN (SELECT k FROM k)
        |  AND k < (SELECT max(k) FROM k)
        |ORDER BY gap_start""".stripMargin,
    "q_equidepth_hist" ->
      """WITH c AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders),
        |r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
        |    count(*) OVER () AS n
        |  FROM c)
        |SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_rfm" ->
      """WITH b AS (SELECT o_custkey,
        |    max(CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT)) AS rec,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS mon
        |  FROM orders GROUP BY o_custkey),
        |n AS (SELECT count(*) AS n FROM b),
        |r AS (SELECT o_custkey,
        |    row_number() OVER (ORDER BY rec, o_custkey) AS rn_r,
        |    row_number() OVER (ORDER BY freq, o_custkey) AS rn_f,
        |    row_number() OVER (ORDER BY mon, o_custkey) AS rn_m
        |  FROM b)
        |SELECT o_custkey,
        |  CAST((rn_r - 1) * 5 // n + 1 AS BIGINT) AS r_score,
        |  CAST((rn_f - 1) * 5 // n + 1 AS BIGINT) AS f_score,
        |  CAST((rn_m - 1) * 5 // n + 1 AS BIGINT) AS m_score,
        |  CAST(((rn_r - 1) * 5 // n + 1) * 100
        |    + ((rn_f - 1) * 5 // n + 1) * 10
        |    + ((rn_m - 1) * 5 // n + 1) AS BIGINT) AS rfm
        |FROM r CROSS JOIN n
        |ORDER BY o_custkey""".stripMargin,
    "q_seq_pattern" ->
      """WITH s AS (SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id)
        |      AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, seq,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS BIGINT) AS n_conv
        |FROM s ORDER BY user_id""".stripMargin,
    "q_twap" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
        |g AS (SELECT user_id, cents,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
        |          AS gap
        |      FROM b),
        |a AS (SELECT user_id,
        |        CAST(sum(cents * gap) AS BIGINT) AS wsum,
        |        CAST(sum(gap) AS BIGINT) AS tsum,
        |        CAST(count(*) AS BIGINT) AS n_intervals
        |      FROM g WHERE gap IS NOT NULL GROUP BY user_id)
        |SELECT user_id, CAST(wsum // tsum AS BIGINT) AS twap_cents, n_intervals
        |FROM a WHERE tsum > 0
        |ORDER BY user_id""".stripMargin,
    "q_markov_transitions" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |       FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
        |        FROM tr GROUP BY 1)
        |SELECT tr.prev_type, next_type, CAST(n AS BIGINT) AS n, out_n,
        |  CAST(1000000 * n // out_n AS BIGINT) AS p_e6
        |FROM tr JOIN tot ON tr.prev_type = tot.prev_type
        |ORDER BY tr.prev_type, next_type""".stripMargin,
    "q_markov_stationary" ->
      """WITH s AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |       FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
        |        FROM tr GROUP BY 1),
        |p AS (SELECT tr.prev_type, next_type,
        |    CAST(1000000 * n // out_n AS BIGINT) AS p_e6
        |  FROM tr JOIN tot ON tr.prev_type = tot.prev_type),
        |st AS (SELECT DISTINCT state FROM (
        |    SELECT prev_type AS state FROM p
        |    UNION ALL SELECT next_type FROM p)),
        |v0 AS (SELECT state, CAST(1000000 AS BIGINT) AS v FROM st),
        |s1 AS (SELECT next_type AS state,
        |    CAST(CAST(sum(v * p_e6) AS BIGINT) // 1000000 AS BIGINT) AS v
        |  FROM p JOIN v0 ON p.prev_type = v0.state GROUP BY 1),
        |v1 AS (SELECT st.state, coalesce(s1.v, 0) AS v
        |  FROM st LEFT JOIN s1 USING (state)),
        |s2 AS (SELECT next_type AS state,
        |    CAST(CAST(sum(v * p_e6) AS BIGINT) // 1000000 AS BIGINT) AS v
        |  FROM p JOIN v1 ON p.prev_type = v1.state GROUP BY 1),
        |v2 AS (SELECT st.state, coalesce(s2.v, 0) AS v
        |  FROM st LEFT JOIN s2 USING (state)),
        |s3 AS (SELECT next_type AS state,
        |    CAST(CAST(sum(v * p_e6) AS BIGINT) // 1000000 AS BIGINT) AS v
        |  FROM p JOIN v2 ON p.prev_type = v2.state GROUP BY 1),
        |v3 AS (SELECT st.state, coalesce(s3.v, 0) AS v
        |  FROM st LEFT JOIN s3 USING (state)),
        |tv AS (SELECT CAST(sum(v) AS BIGINT) AS tv FROM v3)
        |SELECT state, CAST(v AS BIGINT) AS mass_e6,
        |  CAST(1000000 * v // tv AS BIGINT) AS pi_ppm
        |FROM v3 CROSS JOIN tv WHERE tv > 0 ORDER BY state""".stripMargin,
    "q_exact_median" ->
      """WITH c AS (SELECT event_type,
        |        CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
        |g AS (SELECT event_type, cents, count(*) AS n FROM c GROUP BY 1, 2),
        |r AS (SELECT event_type, cents,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum
        |      FROM g),
        |t AS (SELECT event_type, (count(*) + 1) // 2 AS rk FROM c GROUP BY 1)
        |SELECT r.event_type, min(cents) AS median_cents
        |FROM r JOIN t ON r.event_type = t.event_type
        |WHERE cum >= rk
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
        |      AS BIGINT) AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        |FROM wk JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_decay_wavg" ->
      """WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id,
        |  CAST(cents * 128
        |    + coalesce(lag(cents, 1) OVER w, 0) * 64
        |    + coalesce(lag(cents, 2) OVER w, 0) * 32
        |    + coalesce(lag(cents, 3) OVER w, 0) * 16
        |    + coalesce(lag(cents, 4) OVER w, 0) * 8
        |    + coalesce(lag(cents, 5) OVER w, 0) * 4
        |    + coalesce(lag(cents, 6) OVER w, 0) * 2
        |    + coalesce(lag(cents, 7) OVER w, 0) AS BIGINT) AS decay_x256
        |FROM b
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS t_view_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS t_click_us FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND us > t_view_us GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS t_purchase_us FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND us > t_click_us GROUP BY e.user_id)
        |SELECT v.user_id, t_view_us, t_click_us, t_purchase_us,
        |  1 + CAST(t_click_us IS NOT NULL AS INT)
        |    + CAST(t_purchase_us IS NOT NULL AS INT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS t_view_us FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(us) AS t_click_us FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND us > t_view_us
        |        AND us <= t_view_us + 86400000000 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(us) AS t_purchase_us FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND us > t_click_us
        |        AND us <= t_click_us + 86400000000 GROUP BY e.user_id)
        |SELECT v.user_id, t_view_us, t_click_us, t_purchase_us,
        |  1 + CAST(t_click_us IS NOT NULL AS INT)
        |    + CAST(t_purchase_us IS NOT NULL AS INT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q_seasonal_decompose" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS c0
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(unnest(generate_series(d0, d1)) AS BIGINT) AS day
        |      FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
        |full0 AS (SELECT s.day, coalesce(c0, 0) AS cents
        |          FROM s LEFT JOIN daily ON s.day = daily.day),
        |t AS (SELECT day, cents,
        |    count(*) OVER w7 AS cnt7,
        |    CAST(sum(cents) OVER w7 AS BIGINT) AS s7,
        |    (day + 3) % 7 AS dow
        |  FROM full0
        |  WINDOW w7 AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT day, cents, dow,
        |    CASE WHEN cnt7 = 7 THEN s7 // 7 END AS trend,
        |    CASE WHEN cnt7 = 7 THEN cents - s7 // 7 END AS detr
        |  FROM t),
        |sea AS (SELECT dow,
        |    CAST(floor(quantile_cont(detr, 0.5) * 100) AS BIGINT) AS sea_e2
        |  FROM t2 WHERE detr IS NOT NULL GROUP BY 1)
        |SELECT day, cents, trend, sea.sea_e2,
        |  detr * 100 - sea.sea_e2 AS resid_e2
        |FROM t2 JOIN sea ON t2.dow = sea.dow
        |ORDER BY day""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |pre AS (SELECT day,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(sum(cents) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS st
        |  FROM daily),
        |tot AS (SELECT max(t) AS n, max(st) AS sn FROM pre)
        |SELECT day, abs(n * st - t * sn) AS stat,
        |  CAST(st // t AS BIGINT) AS mean_before_cents,
        |  CAST((sn - st) // (n - t) AS BIGINT) AS mean_after_cents
        |FROM pre CROSS JOIN tot WHERE t < n
        |ORDER BY stat DESC, day LIMIT 10""".stripMargin,
    "q_label_centroids" ->
      """WITH u AS (SELECT label,
        |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |a AS (SELECT label, pos, count(*) AS n_vecs,
        |        CAST(sum(CAST(round(x * 16777216.0) AS BIGINT)) AS BIGINT) AS sx
        |      FROM u GROUP BY label, pos)
        |SELECT label, pos, n_vecs,
        |  CAST(floor(CAST(sx AS DOUBLE) / n_vecs / 16777216.0 * 1000000.0)
        |       AS BIGINT) AS mean_e6
        |FROM a ORDER BY label, pos""".stripMargin,
    "q_mad_outliers" ->
      """WITH c AS (SELECT event_id, event_type,
        |        CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
        |      FROM c GROUP BY event_type),
        |dv AS (SELECT event_id, c.event_type,
        |         abs(CAST(cents AS DOUBLE) - med) AS dev
        |       FROM c JOIN m ON c.event_type = m.event_type),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |       FROM dv GROUP BY event_type)
        |SELECT event_id, dv.event_type,
        |  CAST(floor(dev * 100) AS BIGINT) AS dev_e2,
        |  CAST(floor(mad * 100) AS BIGINT) AS mad_e2
        |FROM dv JOIN md ON dv.event_type = md.event_type
        |WHERE dev > mad * 3.0
        |ORDER BY event_id""".stripMargin,
    "q_skyline" ->
      """WITH b AS (SELECT o_orderkey,
        |        CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
        |        CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |      FROM orders),
        |pc AS (SELECT cents, min(d) AS md FROM b GROUP BY cents),
        |sw AS (SELECT cents, md,
        |         min(md) OVER (ORDER BY cents DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_strict
        |       FROM pc)
        |SELECT o_orderkey, b.cents, d AS date_day
        |FROM b JOIN sw ON b.cents = sw.cents
        |WHERE (m_strict IS NULL OR m_strict > d) AND md = d
        |ORDER BY o_orderkey""".stripMargin,
  )
}
