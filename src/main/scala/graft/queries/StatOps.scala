package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Statistical-testing / distribution-diagnostics surface: the
  * experiment-analysis and data-monitoring queries an analytics engine
  * runs over fact tables — Welch's two-sample t, Benford first-digit
  * conformance, day-of-week seasonality profiles, and seasonal-baseline
  * anomaly flagging.
  *
  * Determinism posture (registry-wide discipline): every cross-partition
  * aggregate is an exact integer moment; derived statistics that need
  * floats compute them in ONE fixed operation sequence mirrored
  * token-for-token by the DuckDB oracle — IEEE 754 ops are individually
  * exact-rounded, so identical sequences give identical bits on both
  * engines (the `q_autocorr` discipline).
  */
object StatOps {
  private type Q = (SparkSession, String) => DataFrame

  /** Welch's unequal-variance two-sample t-test of mean order value,
    * each customer market segment vs the REST of the corpus — the A/B
    * significance query. Per-group n/Σx/Σx² are exact BIGINT moments in
    * whole dollars (sumsq headroom: at the corpus's ≤5·10⁵ dollar
    * prices, Σx² stays under 2⁶³ through ~3.7·10⁷ rows per group; past
    * that the moments move to DECIMAL(38,0), same plan). The "rest"
    * side is total−segment — ONE pass over the fact join, a 5-row
    * aggregate, and a scalar broadcast; no second scan, no windows.
    * t and the Welch–Satterthwaite df are the only float math, one
    * mirrored sequence each.
    */
  private val qWelchTtest: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"), round(col("o_totalprice")).cast("long").as("x"))
    val per = base.groupBy("seg").agg(count(lit(1)).as("n1"),
      sum("x").as("s1"), sum(col("x") * col("x")).as("ss1"))
    // Totals re-aggregate from the 5-row per-segment moments (counts and
    // integer sums compose exactly) — deriving them from `base` instead
    // would plan a second scan of the fact join: the per-segment and
    // global aggregates exchange on different keys, so ReuseExchange
    // cannot dedupe them.
    val tot = per.agg(sum("n1").as("nt"), sum("s1").as("st"),
      sum("ss1").as("sst"))
    val m = per.crossJoin(broadcast(tot))
      .withColumn("n2", col("nt") - col("n1"))
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("ss2", col("sst") - col("ss1"))
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .withColumn("m1", col("s1").cast("double") / col("n1").cast("double"))
      .withColumn("m2", col("s2").cast("double") / col("n2").cast("double"))
      .withColumn("q1", (col("ss1").cast("double") - col("s1").cast("double") * col("m1")) /
        (col("n1").cast("double") - lit(1.0)) / col("n1").cast("double"))
      .withColumn("q2", (col("ss2").cast("double") - col("s2").cast("double") * col("m2")) /
        (col("n2").cast("double") - lit(1.0)) / col("n2").cast("double"))
    // q1+q2 > 0 guards the degenerate both-groups-constant corpus: Spark
    // would floor(NaN) to 0/Long.MaxValue under non-ANSI cast while DuckDB
    // errors on the same cast — filter the zero denominator on BOTH engines
    // (the qAutocorr/qSpearman discipline).
    m.filter(col("n1") >= 2L && col("n2") >= 2L &&
        col("q1") + col("q2") > lit(0.0))
      .select(col("seg"), col("n1"), col("n2"), col("s1"), col("s2"),
        floor(lit(1000000.0) * (col("m1") - col("m2")) /
          sqrt(col("q1") + col("q2"))).cast("long").as("t_e6"),
        floor(lit(1000.0) * (col("q1") + col("q2")) * (col("q1") + col("q2")) /
          (col("q1") * col("q1") / (col("n1").cast("double") - lit(1.0)) +
            col("q2") * col("q2") / (col("n2").cast("double") - lit(1.0))))
          .cast("long").as("df_e3"))
      .orderBy("seg")
  }

  /** Benford first-significant-digit conformance of order prices — the
    * fraud/synthetic-data screen. Digit extraction is string-first-char
    * of the exact cents BIGINT (identical decimal rendering in both
    * engines, no float log in the bucketing); observed shares are exact
    * integer ppm; the 9 expected Benford shares log10(1+1/d) are the
    * only float math — verified >10⁻⁷ away from every floor boundary at
    * e6 scale, so one-ulp libm drift cannot flip a bucket. Output is
    * digit-sized (9 rows): one partial-agg shuffle + a scalar broadcast.
    */
  private val qBenford: Q = (s, d) => {
    val c = Tables.orders(s, d)
      .select(substring(round(col("o_totalprice") * 100.0).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = c.agg(sum("n").as("nt"))
    c.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("1000000 * n DIV nt").as("obs_ppm"),
        floor(lit(1000000.0) *
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
          .cast("long").as("benford_ppm"))
      .orderBy("digit")
  }

  /** Day-of-week order seasonality profile: count, exact cents revenue,
    * and mean order value per weekday — the seasonality baseline table.
    * Weekday = (epoch_day + 3) mod 7 (0 = Monday): pure integer
    * arithmetic on the epoch-day count, immune to the engines'
    * conflicting dayofweek numbering conventions. avg_cents is defined
    * as sum DIV n. One partial-agg shuffle into 7 groups.
    */
  private val qDowProfile: Q = (s, d) => {
    Tables.orders(s, d)
      .select(((unix_date(to_date(col("o_orderdate"))).cast("long") + 3L) % 7L)
        .as("dow"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .withColumn("avg_cents", expr("sum_cents DIV n"))
      .orderBy("dow")
  }

  /** Seasonal-baseline anomaly flags over the daily revenue series:
    * each calendar day's exact cents total compared against its OWN
    * weekday's median via the median-absolute-deviation rule
    * (|x−med| > 3·MAD) — the robust monitor that a Monday/weekend
    * seasonal mix would break if the baseline were global
    * (`q_mad_outliers` is the global form; this is the seasonal one).
    * Medians are exact midpoints of integers (exactly representable
    * doubles — `quantile_cont` agrees bit-for-bit); the weekday
    * baseline table is 7 rows, broadcast back. Every day is emitted
    * with its deviation and flag so the result is non-degenerate even
    * when nothing exceeds the gate. Work: one day-collapse shuffle +
    * two 7-row aggregates.
    */
  private val qAnomalyDays: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
      .withColumn("dow", (col("day") + 3L) % 7L)
      // calendar-bounded spine, materialized once — see qTheilSen (r16)
      .localCheckpoint(true)
    val med = daily.groupBy("dow")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = daily.join(broadcast(med), "dow")
      .withColumn("dev", abs(col("cents").cast("double") - col("med")))
    val mad = dev.groupBy("dow").agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "dow")
      .select(col("day"), col("dow"), col("cents"),
        floor(col("dev") * 100).cast("long").as("dev_e2"),
        floor(col("mad") * 100).cast("long").as("mad_e2"),
        (col("dev") > col("mad") * 3.0).cast("int").as("anom"))
      .orderBy("day")
  }

  /** Pareto concentration: the top decile of customers (by exact cents
    * spend, ties broken on the key) and their share of total revenue in
    * exact ppm — the "does 10% of the base carry the business" headline
    * that `q_gini` summarizes as one index. The decile cut is the
    * INCLUSIVE rank ceil(n/10) = (n+9) DIV 10 on a distributed
    * total-order rank ([[graft.ops.Ranks.globalRowNumber]] — range-
    * partitioned, no single-partition window). Two passes over the
    * customer-sized rollup by design (rank pass + scalar totals — the
    * totals cannot ride the rank's exchange). BIGINT headroom:
    * 10⁶·top_cents needs total revenue under ~9.2·10¹² cents; past that
    * the share moves to DECIMAL(38,0).
    */
  private val qParetoShare: Q = (s, d) => {
    val pc = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
    val ranked = graft.ops.Ranks.globalRowNumber(pc,
      Seq(col("cents").desc, col("o_custkey").asc), "rnk")
    val tot = pc.agg(count(lit(1)).as("n_cust"), sum("cents").as("total_cents"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("rnk") <= expr("(n_cust + 9) DIV 10"))
      .groupBy("n_cust", "total_cents")
      .agg(count(lit(1)).as("top_n"), sum("cents").as("top_cents"))
      .select(col("n_cust"), col("top_n"), col("top_cents"),
        col("total_cents"),
        expr("1000000 * top_cents DIV total_cents").as("share_ppm"))
      .orderBy("n_cust")
  }

  /** Mutual information between customer segment and order priority, in
    * per-cell µnat contributions — the dependence measure that catches
    * what `q_chisq_contingency`'s variance test summarizes differently
    * (MI is the quantity a feature-selection pipeline thresholds on).
    * Contract: each cell's term (n_xy/N)·ln(n_xy·N / (n_x·n_y)) floors
    * to e6 BEFORE any cross-cell total (the `q_perplexity_lm`
    * discipline — the integer cell table is exact, the log is one
    * mirrored float sequence per cell, and any downstream sum of the
    * published terms is order-independent). Marginals and N re-aggregate
    * from the category²-sized cell table; everything after the one
    * fact-join shuffle is broadcast-sized.
    */
  private val qMutualInfo: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("seg"), col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("nxy"))
    val nx = cells.groupBy("seg").agg(sum("nxy").as("nx"))
    val ny = cells.groupBy("prio").agg(sum("nxy").as("ny"))
    val tot = cells.agg(sum("nxy").as("nn"))
    cells.join(broadcast(nx), "seg").join(broadcast(ny), "prio")
      .crossJoin(broadcast(tot))
      .select(col("seg"), col("prio"), col("nxy"),
        // log argument in DOUBLE throughout: the BIGINT products nxy·N
        // and nx·ny would overflow past ~3·10⁹ fact rows (the
        // assoc-rules-lift lesson); doubles trade exactness of the
        // PRODUCTS (still one mirrored sequence) for unbounded scale
        floor(lit(1000000.0) *
          (col("nxy").cast("double") / col("nn")) *
          log(col("nxy").cast("double") * col("nn").cast("double") /
            (col("nx").cast("double") * col("ny").cast("double"))))
          .cast("long").as("mi_term_e6"))
      .orderBy("seg", "prio")
  }

  /** Wilson 95% confidence interval for per-segment conversion (share
    * of customers with at least one urgent order) — the uncertainty
    * quantification an A/B readout needs beside the point estimate
    * (`q_welch_ttest` compares means; this bounds a proportion, and
    * Wilson, unlike the naive Wald interval, stays inside [0,1] at
    * small n / extreme p). k and n are exact integers off two keyed
    * aggregates; the interval is one mirrored float sequence with
    * z = 1.96 literal on both engines.
    */
  private val qConversionCi: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val conv = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val per = base
      .join(conv, base("c_custkey") === conv("o_custkey"), "left")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        sum(col("o_custkey").isNotNull.cast("long")).as("k"))
    per
      .withColumn("ph", col("k").cast("double") / col("n").cast("double"))
      .withColumn("z2n", lit(3.8416) / col("n").cast("double"))
      .withColumn("ctr", (col("ph") + col("z2n") / lit(2.0)) / (lit(1.0) + col("z2n")))
      .withColumn("hw",
        lit(1.96) * sqrt(col("ph") * (lit(1.0) - col("ph")) / col("n").cast("double") +
          col("z2n") / (lit(4.0) * col("n").cast("double"))) / (lit(1.0) + col("z2n")))
      // clamp to the unit interval: at k=0 (or k=n) the exact Wilson
      // bound IS 0 (or 1), but ctr and hw reach it via different float
      // sequences, so ctr−hw can round a hair negative — the floor
      // would then emit −1 and break the documented [0,1] invariant
      .select(col("seg"), col("n"), col("k"),
        floor(lit(1000000.0) * col("ph")).cast("long").as("p_e6"),
        greatest(floor(lit(1000000.0) * (col("ctr") - col("hw"))).cast("long"),
          lit(0L)).as("lo_e6"),
        least(floor(lit(1000000.0) * (col("ctr") + col("hw"))).cast("long"),
          lit(1000000L)).as("hi_e6"))
      .orderBy("seg")
  }

  /** 10%-trimmed mean of event values per type — the robust location
    * estimate that DROPS the tails (`q_winsorize` is the clamp
    * counterpart). Interior = ranks in (ceil(n/10), n − ceil(n/10)];
    * the cut is pure integer arithmetic on a per-group rank window,
    * and the trimmed mean is sum DIV count over the interior — exact
    * and order-independent. Work shards by event_type.
    */
  private val qTrimmedMean: Q = (s, d) => {
    val c = Tables.events(s, d).select(col("event_id"), col("event_type"),
      round(col("value") * 100.0).cast("long").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cents"), col("event_id"))
    c.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .filter(col("rn") > expr("(n + 9) DIV 10") &&
        col("rn") <= col("n") - expr("(n + 9) DIV 10"))
      .groupBy("event_type")
      .agg(max("n").as("n"), count(lit(1)).as("n_kept"),
        expr("sum(cents) DIV count(1)").as("trimmed_mean_cents"))
      .orderBy("event_type")
  }

  /** Quantity-weighted median of lineitem price: the first price (in
    * ascending order) whose running weight reaches half the total —
    * the inventory-weighted "typical price". The running weight rides
    * [[graft.ops.Ranks.globalRunningSum]] (range-partitioned, no
    * single-partition window); the crossing row's PRICE is invariant
    * to tie order within an equal-price block (any reordering crosses
    * inside the same block), so `min(price | 2·cumw ≥ total)` is
    * deterministic on both engines.
    */
  private val qWeightedMedian: Q = (s, d) => {
    val b = Tables.lineitem(s, d)
      .select(round(col("l_extendedprice") * 100.0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
    val r = graft.ops.Ranks.globalRunningSum(b,
      Seq(col("cents").asc), col("qty"), "cumw")
    val tot = b.agg(sum("qty").as("totw"))
    r.crossJoin(broadcast(tot))
      .filter(col("cumw") * 2L >= col("totw"))
      .groupBy("totw")
      .agg(min("cents").as("wmedian_cents"))
      .select(col("totw"), col("wmedian_cents"))
      .orderBy("totw")
  }

  /** Sample-ratio-mismatch check for a hash-bucketed 50/50 experiment
    * assignment — the first gate every A/B platform runs (an SRM means
    * the randomizer, not the treatment, explains the difference).
    * Assignment reuses the `q_sample_split` md5-bucket discipline
    * (content-independent, reproducible cross-engine); the 2-cell χ²
    * collapses algebraically to (o₀−o₁)²/n, so the statistic is exact
    * integer ppm — no float at all. One partial-agg shuffle into 2
    * groups.
    */
  private val qAbSrm: Q = (s, d) => {
    val g = Tables.customer(s, d)
      .withColumn("grp",
        pmod(conv(substring(md5(col("c_custkey").cast("string")), 1, 8),
          16, 10).cast("long"), lit(2L)))
      .groupBy("grp").agg(count(lit(1)).as("o"))
    g.agg(sum("o").as("n"),
        sum(when(col("grp") === 0L, col("o")).otherwise(0L)).as("o0"),
        sum(when(col("grp") === 1L, col("o")).otherwise(0L)).as("o1"))
      .select(col("n"), col("o0"), col("o1"),
        expr("1000000 * (o0 - o1) * (o0 - o1) DIV n").as("srm_chi2_e6"))
      .orderBy("n")
  }

  /** Deterministic Poisson bootstrap 95% CI for the mean order value:
    * B=100 resamples drawn WITHOUT any RNG state — each (order, b)
    * pair's multiplicity k is the inverse-CDF Poisson(1) draw of its
    * md5 ppm bucket (fixed integer thresholds 367879/735759/919699/
    * 981012/996340/999406/999917 = the cumulative e⁻¹·Σ1/k! table, so
    * both engines draw identical k) — the resampling scheme that
    * parallelizes: B partial aggregates in ONE pass over the exploded
    * fact, no permutation, no sequential sampling (Poisson bootstrap,
    * the standard trick for bootstrap-at-scale). ONE md5 per order
    * yields two 32-bit words h1/h2; resample b's uniform is
    * (h1 + (b+1)·h2) mod 10⁶ — the Kirsch–Mitzenmacher double-hash
    * stream (the Bloom-filter construction), so the B× explode costs
    * integer arithmetic, not B hashes per row (measured 12.4 s → the
    * md5 was 90% of the key at sf0.1). Each resample mean is exact
    * Σk·x DIV Σk; the CI endpoints are order statistics at ceil ranks
    * 2.5%/97.5% over the B-row mean table (the only window, B rows).
    */
  private val qBootstrapCi: Q = (s, d) => {
    val B = 100
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      round(col("o_totalprice") * 100.0).cast("long").as("cents"),
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h1"),
      conv(substring(md5(col("o_orderkey").cast("string")), 9, 8), 16, 10)
        .cast("long").as("h2"))
    val rep = o.select(col("o_orderkey"), col("cents"), col("h1"), col("h2"),
      explode(sequence(lit(0), lit(B - 1))).as("b"))
    val u = pmod(col("h1") + (col("b").cast("long") + lit(1L)) * col("h2"),
      lit(1000000L))
    val k = when(u < 367879L, 0L).when(u < 735759L, 1L)
      .when(u < 919699L, 2L).when(u < 981012L, 3L).when(u < 996340L, 4L)
      .when(u < 999406L, 5L).when(u < 999917L, 6L).otherwise(7L)
    val means = rep.withColumn("k", k)
      .groupBy("b")
      .agg(sum(col("k") * col("cents")).as("s"), sum("k").as("n"))
      .filter(col("n") > 0L)
      .select(col("b"), expr("s DIV n").as("mean_cents"))
    val ranked = means.withColumn("rnk", row_number().over(
      Window.orderBy(col("mean_cents").asc, col("b").asc)))
    val nb = means.agg(count(lit(1)).as("n_resamples"))
    val est = o.agg(expr("sum(cents) DIV count(1)").as("mean_cents_full"))
    ranked.crossJoin(broadcast(nb))
      .agg(max("n_resamples").as("n_resamples"),
        max(when(col("rnk") === expr("(25 * n_resamples + 999) DIV 1000"),
          col("mean_cents"))).as("ci_lo_cents"),
        max(when(col("rnk") === expr("(975 * n_resamples + 999) DIV 1000"),
          col("mean_cents"))).as("ci_hi_cents"))
      .crossJoin(broadcast(est))
      .select(col("n_resamples"), col("mean_cents_full"),
        col("ci_lo_cents"), col("ci_hi_cents"))
      .orderBy("n_resamples")
  }

  /** Cumulative gains by spend decile: customers ranked by total spend
    * (the "model score"), bucketed into 10 equal-population deciles,
    * each reporting its urgent-order conversion rate and the running
    * share of all conversions captured — the gains/lift chart behind
    * every targeting-model readout. Ranks ride the distributed
    * total-order rank; the only window scans the 10-row decile table.
    */
  private val qGainsDeciles: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").desc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"), sum("conv").as("k_tot"))
    val dec = ranked.crossJoin(broadcast(tot))
      .select(expr("(CAST(rnk AS BIGINT) - 1) * 10 DIV n_cust").as("decile"),
        col("conv"), col("k_tot"))
      .groupBy("decile", "k_tot")
      .agg(count(lit(1)).as("n"), sum("conv").as("k"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_k", sum("k").over(w))
      .select(col("decile"), col("n"), col("k"),
        expr("1000000 * k DIV n").as("conv_ppm"),
        expr("1000000 * cum_k DIV k_tot").as("cum_capture_ppm"))
      .orderBy("decile")
  }

  /** Threshold-classifier confusion matrix: predict urgent-order
    * conversion by spend > lower-median spend, report TP/FP/FN/TN and
    * accuracy/precision/recall/F1 — the fixed-threshold readout next
    * to `q_rank_auc`'s threshold-free one. The cut is the exact order
    * statistic at rank (n+1) DIV 2 from the distributed rank (scalar
    * broadcast), every tally an exact BIGINT, F1 = 2·tp DIV (2·tp+fp+
    * fn) pure integer — no float anywhere.
    */
  private val qConfusionMatrix: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").asc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"))
    val med = ranked.crossJoin(broadcast(tot))
      .filter(col("rnk") === expr("(n_cust + 1) DIV 2"))
      .select(col("cents").as("med_cents"))
    spend.crossJoin(broadcast(med))
      .select((col("cents") > col("med_cents")).cast("long").as("pred"),
        col("conv"))
      .agg(sum(col("pred") * col("conv")).as("tp"),
        sum(col("pred") * (lit(1L) - col("conv"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("conv")).as("fn"),
        sum((lit(1L) - col("pred")) * (lit(1L) - col("conv"))).as("tn"))
      .filter(col("tp") + col("fp") > 0L && col("tp") + col("fn") > 0L)
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("1000000 * (tp + tn) DIV (tp + fp + fn + tn)").as("accuracy_ppm"),
        expr("1000000 * tp DIV (tp + fp)").as("precision_ppm"),
        expr("1000000 * tp DIV (tp + fn)").as("recall_ppm"),
        expr("2000000 * tp DIV (2 * tp + fp + fn)").as("f1_ppm"))
      .orderBy("tp")
  }

  /** Calibration curve: the rank-transformed spend score (10⁶-scaled
    * empirical quantile — a probability-shaped score) in 10 equal-width
    * score bins, each with its mean score and observed urgent-order
    * rate in exact ppm — is the score's magnitude meaningful, not just
    * its order (`q_rank_auc` answers order, this answers level)? Ranks
    * ride the distributed total-order rank; everything after is
    * integer arithmetic on a 10-row table.
    */
  private val qCalibration: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").asc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("n_cust") > 1L)
      .select(
        expr("1000000 * (CAST(rnk AS BIGINT) - 1) DIV (n_cust - 1)")
          .as("score_ppm"), col("conv"))
      .withColumn("bin", least(expr("score_ppm DIV 100000"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("score_ppm").as("sscore"),
        sum("conv").as("k"))
      .select(col("bin"), col("n"),
        expr("sscore DIV n").as("mean_score_ppm"),
        expr("1000000 * k DIV n").as("observed_ppm"))
      .orderBy("bin")
  }

  /** Rank AUC (Mann–Whitney): does customer spend rank urgent-order
    * converters above non-converters? AUC = (Σranks₊ − n₊(n₊+1)/2) /
    * (n₊·n₀) — the threshold-free binary-ranking metric, computed
    * entirely from the distributed total-order rank in exact BIGINT
    * (auc_e6 = 10⁶·U DIV (n₊·n₀)). Ties in spend break on the customer
    * key (row-number ranks — the `q_spearman` documented deviation
    * from average-rank ties, which is what makes the statistic exact
    * cross-engine). Headroom: auc_e6 scales U ≤ n²/4 by 10⁶ before the
    * divide, so 10⁶·n²/4 < 2⁶³ bounds it — BIGINT-safe to ~6·10⁶ ranked
    * customers; past that, promote the auc_e6 numerator to DECIMAL(38,0)
    * (the q_pareto_share/q_gini promotion point), same plan shape.
    */
  private val qRankAuc: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").asc, col("o_custkey").asc), "rnk")
    ranked
      .agg(sum("conv").as("n1"),
        sum(lit(1L) - col("conv")).as("n0"),
        sum(when(col("conv") === 1L, col("rnk").cast("long"))
          .otherwise(0L)).as("sumr"))
      .filter(col("n1") > 0L && col("n0") > 0L)
      .select(col("n1"), col("n0"),
        expr("1000000 * (sumr - n1 * (n1 + 1) DIV 2) DIV (n1 * n0)")
          .as("auc_e6"))
      .orderBy("n1")
  }

  /** Difference-in-differences: the 2×2 (treated × pre/post) causal
    * readout — did the BUILDING segment's mean order value move more
    * across the 1998 cutoff than everyone else's? Each cell mean is an
    * exact integer (`Σcents DIV n` — the `q_dow_profile` convention),
    * so the DID contrast is pure BIGINT arithmetic. One fact⋈dimension
    * join + a 4-row conditional pivot: the join shuffles on custkey
    * like any enrichment, everything after is cell-count sized.
    */
  private val qDiffInDiff: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").as("treated"),
        (to_date(col("o_orderdate")) >= lit("1998-01-01").cast("date"))
          .as("post"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"))
    val cells = o.groupBy("treated", "post")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      .withColumn("m", expr("sc DIV n"))
    cells.agg(
        sum(when(col("treated") && col("post"), col("m"))).as("m_t_post"),
        sum(when(col("treated") && !col("post"), col("m"))).as("m_t_pre"),
        sum(when(!col("treated") && col("post"), col("m"))).as("m_c_post"),
        sum(when(!col("treated") && !col("post"), col("m"))).as("m_c_pre"),
        sum("n").as("n_orders"))
      .select(col("n_orders"), col("m_t_post"), col("m_t_pre"),
        col("m_c_post"), col("m_c_pre"),
        ((col("m_t_post") - col("m_t_pre")) -
          (col("m_c_post") - col("m_c_pre"))).as("did_cents"))
      .orderBy(col("n_orders"))
  }

  /** Seasonal-naive forecast backtest: predict each day's event-value
    * total from the SAME weekday one week earlier, report MAE and WAPE
    * over the scored days — the baseline every forecasting pipeline
    * must beat before shipping a model. Exact integer cents end to
    * end; the "model" is a self-join of the day-grain rollup on
    * day = day−7, so the whole evaluation is bounded by distinct days,
    * not event volume.
    */
  private val qSeasonalNaiveEval: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100.0).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").as("total"))
    val pred = daily.select(date_add(col("day"), 7).as("day"),
      col("total").as("pred"))
    daily.join(pred, Seq("day"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("total") - col("pred"))).as("sum_abs_err"),
        expr("sum(abs(total - pred)) DIV count(1)").as("mae_cents"),
        expr("1000000 * sum(abs(total - pred)) DIV sum(total)")
          .as("wape_ppm"))
      .orderBy(col("n_days"))
  }

  /** Burstiness (Fano factor) of daily event arrivals per type: the
    * variance-to-mean ratio of day-grain counts — ≫1 means bursty
    * (campaign spikes), ≈1 Poisson-like, <1 regular. Exact integer:
    * VMR = (n·Σx² − (Σx)²) DIV (n·Σx) on the ppm grid, moments from
    * one day-grain rollup so the stat is bounded by types×days.
    */
  private val qBurstiness: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"), col("sx"),
        expr("1000000 * (n_days * sxx - sx * sx) DIV (n_days * sx)")
          .as("vmr_e6"))
      .orderBy(col("event_type"))
  }

  /** Two-sample Kolmogorov–Smirnov: does the BUILDING segment's order
    * value distribution differ from everyone else's? D = max over the
    * pooled support of |F₁(x) − F₂(x)|, computed ENTIRELY in integers by
    * cross-multiplying the running counts (|c₁·n₂ − c₂·n₁| avoids the
    * F floats altogether); ks_e6 = 10⁶·D_num DIV (n₁·n₂). The pooled
    * sample first COLLAPSES to its distinct values (one partial-agg
    * shuffle — the running-sum table is bounded by price cardinality,
    * not row count), then both running counts ride ONE
    * [[graft.ops.Ranks.globalRunningSums]] range-sort. The CDF step
    * convention (evaluate after the whole equal-value block) falls out
    * of the per-value collapse. `at_cents` is the smallest value
    * attaining the max — a deterministic argmax. Headroom: cum·n ≤
    * n₁·n₂ and 10⁶·n₁·n₂ < 2⁶³ bounds BIGINT safety at ~3·10⁶ rows per
    * group; past that promote the cross-products to DECIMAL(38,0)
    * (the q_pareto_share promotion point), same plan shape.
    */
  private val qKsTest: Q = (s, d) => {
    val b = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("g1"))),
        col("o_custkey") === col("c_custkey"))
      .select(round(col("o_totalprice") * 100.0).cast("long").as("cents"),
        col("g1"))
    val per = b.groupBy("cents")
      .agg(sum("g1").as("c1"), count(lit(1)).as("ct"))
    val r = graft.ops.Ranks.globalRunningSums(per, Seq(col("cents").asc),
      Seq(col("c1") -> "cum1", col("ct") -> "cumt"))
    // totals read off the checkpointed running-sum tail — no second
    // scan of the fact join (max cumt = n, max cum1 = n1)
    val tot = r.agg(max("cum1").as("n1"),
      (max("cumt") - max("cum1")).as("n2"))
    val dif = r.crossJoin(broadcast(tot))
      .select(col("cents"), col("n1"), col("n2"),
        abs(col("cum1") * col("n2") -
          (col("cumt") - col("cum1")) * col("n1")).as("dnum"))
    val mx = dif.groupBy("n1", "n2").agg(max("dnum").as("d_num"))
    dif.join(broadcast(mx), Seq("n1", "n2"))
      .filter(col("dnum") === col("d_num"))
      .groupBy("n1", "n2", "d_num")
      .agg(min("cents").as("at_cents"))
      .select(col("n1"), col("n2"), col("d_num"),
        expr("1000000 * d_num DIV (n1 * n2)").as("ks_e6"),
        col("at_cents"))
      .orderBy("n1")
  }

  /** Cramér's V effect size for the market-segment × order-priority
    * contingency table — the "is the χ² big enough to matter" companion
    * to `q_chisq_contingency`. Per-cell contributions reuse that key's
    * common-denominator integer form ((o·N − r·c)² over r·c·N at e6
    * scale — exact BIGINTs, so their SUM is order-independent); the
    * only float math is the final √(χ²/(n·min(r−1,c−1))), ONE mirrored
    * sequence. Same plan shape as the χ² key: one broadcast dim join,
    * one keyed count, category-sized re-joins.
    */
  private val qCramersV: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy("seg").agg(sum("o").as("r"))
    val colT = cells.groupBy("prio").agg(sum("o").as("c"))
    val contrib = cells.join(broadcast(rowT), "seg")
      .join(broadcast(colT), "prio")
      .crossJoin(broadcast(cells.agg(sum("o").as("n"))))
      .select(col("seg"), col("prio"), col("n"),
        expr("(o * n - r * c) * (o * n - r * c) DIV ((r * c * n) DIV 1000000)")
          .as("chi2_e6"))
    contrib
      .agg(max("n").as("n"), sum("chi2_e6").as("chi2_e6"),
        countDistinct("seg").as("r_levels"),
        countDistinct("prio").as("c_levels"))
      .select(col("n"), col("r_levels"), col("c_levels"), col("chi2_e6"),
        floor(sqrt(col("chi2_e6").cast("double") / lit(1000000.0) /
          (col("n") * least(col("r_levels") - 1L, col("c_levels") - 1L))
            .cast("double")) * lit(1000000.0)).cast("long").as("v_e6"))
      .orderBy("n")
  }

  /** ABC inventory classification: parts ranked by revenue, class A =
    * items within the leading 80% of cumulative revenue, B to 95%, C
    * the tail — the 80/15/5 slicing behind every stock-policy and
    * catalog-curation decision. The cumulative rides the distributed
    * running sum (range-sort on (cents DESC, partkey) — a total order,
    * so the class boundary is deterministic under revenue ties); class
    * membership compares cum·100 ≤ tot·{80,95} in exact BIGINTs.
    * Headroom: total corpus cents ≤ ~10¹⁶ leaves cum·100 two decades
    * under 2⁶³. The grand total reads off the running-sum tail
    * (max cum) — no second lineitem scan.
    */
  private val qAbcClasses: Q = (s, d) => {
    val rev = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100.0).cast("long"))
        .as("cents"))
    val r = graft.ops.Ranks.globalRunningSum(rev,
      Seq(col("cents").desc, col("l_partkey").asc), col("cents"), "cum")
    val tot = r.agg(max("cum").as("tot"))
    r.crossJoin(broadcast(tot))
      .select(when(col("cum") * 100L <= col("tot") * 80L, "A")
        .when(col("cum") * 100L <= col("tot") * 95L, "B")
        .otherwise("C").as("abc"), col("cents"), col("tot"))
      .groupBy("abc", "tot")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("class_cents"))
      .select(col("abc"), col("n_parts"), col("class_cents"),
        expr("1000000 * class_cents DIV tot").as("share_ppm"))
      .orderBy("abc")
  }

  /** Autocorrelation function at lags 1..7 of the daily order-count
    * series — the week-scale seasonality fingerprint (`q_autocorr` is
    * its lag-1 slice; the lag-7 spike is the weekly cycle). Pairs come
    * from ONE broadcast self-join of the collapsed day table against
    * its 7-way lag explode (calendar-bounded — never data-sized, the
    * `q_period_over_period` posture); per-lag moments are exact
    * BIGINTs and r_e6 derives via the same single mirrored float
    * sequence as `q_autocorr`, so lag 1 here must equal that key
    * bit-for-bit (spec-pinned). Calendar gaps pair with nothing and
    * drop out rather than faking adjacency.
    */
  private val qAcfLags: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
      // calendar-bounded spine, materialized once — see qTheilSen (r16)
      .localCheckpoint(true)
    val lagged = daily.select(col("day"), col("y"),
        explode(array((1 to 7).map(l => lit(l.toLong)): _*)).as("lag"))
      .withColumn("dn", col("day") + col("lag"))
    val pairs = lagged.join(
      broadcast(daily.select(col("day").as("d2"), col("y").as("yn"))),
      col("dn") === col("d2"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("m"), sum("y").as("sa"), sum("yn").as("sb"),
        sum(col("y") * col("yn")).as("sab"),
        sum(col("y") * col("y")).as("saa"),
        sum(col("yn") * col("yn")).as("sbb"))
      .filter(col("m") * col("saa") - col("sa") * col("sa") > 0L &&
        col("m") * col("sbb") - col("sb") * col("sb") > 0L)
      .select(col("lag"), col("m"), col("sa"), col("sb"),
        floor((col("m") * col("sab") - col("sa") * col("sb")).cast("double") /
          sqrt((col("m") * col("saa") - col("sa") * col("sa")).cast("double")) /
          sqrt((col("m") * col("sbb") - col("sb") * col("sb")).cast("double")) *
          lit(1000000.0)).cast("long").as("r_e6"))
      .orderBy("lag")
  }

  /** Theil–Sen robust trend of the daily order-count series: the
    * median of all pairwise slopes — the outlier-proof alternative to
    * `q_linreg_trend`'s OLS (one wild day shifts OLS, not the median
    * slope). Each pair's slope is floored to exact integer millionths
    * FIRST (10⁶·Δy DIV Δx — truncation toward zero on both engines,
    * the `q_period_over_period` measured contract), so the median is
    * an integer order statistic: lower median at rank (m+1) DIV 2 by
    * (slope, d1, d2) — a total order, deterministic under slope ties.
    * The all-pairs self-join is CALENDAR-bounded (days², never
    * data-sized — the `q_period_over_period` posture): 10 years of
    * days is ~7M pairs regardless of fact volume, and the rank rides
    * the distributed global row number, no single-partition window.
    */
  private val qTheilSen: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
      // calendar-bounded (<=2,557 rows): materialize once so the two
      // theta-join sides (and any later aggregate) read ~2.5k cached
      // rows instead of re-running the orders scan+collapse each (r16)
      .localCheckpoint(true)
    val pairs = daily.toDF("d1", "y1")
      .join(broadcast(daily.toDF("d2", "y2")), col("d1") < col("d2"))
    val sl = pairs.select(
      expr("(1000000 * (y2 - y1)) DIV (d2 - d1)").as("slope_e6"),
      col("d1"), col("d2"))
    // ONE pass over the pair join (r16): the rank pass's offset job
    // already counted every partition, so m arrives as a literal
    // instead of a second (and, through the crossJoin, third) full
    // evaluation of the calendar-pair theta join — same m, same row.
    val (r, m) = graft.ops.Ranks.globalRowNumberWithCount(sl,
      Seq(col("slope_e6").asc, col("d1").asc, col("d2").asc), "rn")
    r.filter(col("rn").cast("long") === lit((m + 1L) / 2L))
      .select(lit(m).as("m"), col("slope_e6").as("ts_slope_e6"))
      .orderBy("m")
  }

  /** Mann–Kendall trend test over the daily order-count series — the
    * nonparametric "is there a monotone trend?" companion to the
    * [[qTheilSen]] slope (same daily spine, same pairwise form).
    * S = Σ_{i<j} sign(y_j − y_i) is exact BIGINT; the null variance is
    * reported pre-divided as 18·Var(S) = n(n−1)(2n−5) − Σ_t t(t−1)(2t+5)
    * over tie groups t, keeping the whole statistic integer — the one
    * sqrt for z happens wherever the result is consumed. Scale shape:
    * the pairwise join runs over the DAILY aggregate, bounded by the
    * calendar (≤2,557 rows for the corpus's 7-year span) regardless of
    * fact-table size, so the broadcast self-join never grows with the
    * data — only the upstream one-shuffle day aggregate does.
    */
  private val qMannKendall: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
      // calendar-bounded (<=2,557 rows): materialize once so the two
      // theta-join sides (and any later aggregate) read ~2.5k cached
      // rows instead of re-running the orders scan+collapse each (r16)
      .localCheckpoint(true)
    val pairs = daily.toDF("d1", "y1")
      .join(broadcast(daily.toDF("d2", "y2")), col("d1") < col("d2"))
    // integer sign via CASE (signum returns DOUBLE; CASE keeps BIGINT)
    val sAgg = pairs.agg(
      sum(when(col("y2") > col("y1"), lit(1L))
        .when(col("y2") < col("y1"), lit(-1L)).otherwise(lit(0L)))
        .as("s_stat"))
    val ties = daily.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie18"))
    val n = daily.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(sAgg)).crossJoin(broadcast(ties))
      .select(col("n"), col("s_stat"),
        expr("n * (n - 1) * (2 * n - 5) - tie18").as("var_s_x18"))
      .orderBy("n")
  }

  /** Kendall tau-a rank correlation between the daily order count and
    * daily revenue — the pairwise-concordance alternative to
    * `q_spearman` (which ranks rows; this classifies pairs). Each day
    * pair (i<j) is concordant when both series move the same way,
    * discordant when they move oppositely; ties in either series fall
    * in neither bucket (tau-a charges them to the denominator — the
    * deterministic-by-construction choice, since tau-b's tie
    * correction needs a sqrt). Classification compares the two deltas
    * DIRECTLY rather than sign(Δy·Δr), so no product can overflow at
    * any revenue scale. tau_a_e6 = 10⁶(C−D) DIV (n(n−1)/2): |C−D| ≤
    * npairs ≤ 3.3·10⁶ even for a 7-year daily calendar, so the e6
    * numerator is always BIGINT-safe. Same bounded-by-calendar pair
    * join as [[qMannKendall]].
    */
  private val qKendallTau: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(count(lit(1)).as("y"),
        sum(round(col("o_totalprice") * 100.0).cast("long")).as("r"))
      // calendar-bounded spine, materialized once — see qTheilSen (r16)
      .localCheckpoint(true)
    val pairs = daily
      .select(col("day").as("d1"), col("y").as("y1"), col("r").as("r1"))
      .join(broadcast(daily.select(col("day").as("d2"), col("y").as("y2"),
        col("r").as("r2"))), col("d1") < col("d2"))
    pairs.agg(count(lit(1)).as("npairs"),
        sum(when((col("y2") > col("y1") && col("r2") > col("r1")) ||
            (col("y2") < col("y1") && col("r2") < col("r1")), lit(1L))
          .otherwise(lit(0L))).as("conc"),
        sum(when((col("y2") > col("y1") && col("r2") < col("r1")) ||
            (col("y2") < col("y1") && col("r2") > col("r1")), lit(1L))
          .otherwise(lit(0L))).as("disc"))
      .select(col("npairs"), col("conc"), col("disc"),
        expr("1000000 * (conc - disc) DIV npairs").as("tau_a_e6"))
      .orderBy("npairs")
  }

  /** CUPED-adjusted experiment readout — variance-reduced group means
    * using pre-period spend as the covariate (Deng et al. 2013, the
    * standard trick every experimentation platform applies before the
    * t-test). Customers are assigned by the `q_ab_srm` md5-bucket
    * discipline; x = pre-1996 spend cents, y = post-1996 spend cents,
    * θ = Cov(x,y)/Var(x) pooled over ALL customers, and each group
    * reports mean(y) − θ·(mean(x) − mean(x)_all). Moments are exact:
    * counts and Σx/Σy are BIGINT; the cross products Σxy/Σx² are
    * DECIMAL(38,0) (HUGEINT oracle-side — cents² per customer can
    * reach ~2.5·10¹⁵, past BIGINT at ~10⁴ such rows; the
    * q_assortativity promotion). θ and the adjustment are the only
    * float math, ONE mirrored sequence of casts/ops each, so results
    * are bit-identical cross-engine. An all-equal-x corpus (Var = 0,
    * θ undefined) is filtered identically on both engines. Plan: one
    * orders aggregate (the per-customer shuffle), one 2-row group agg,
    * two scalar broadcasts — no second fact scan.
    */
  private val qCuped: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cents = round(col("o_totalprice") * 100.0).cast("long")
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(when(to_date(col("o_orderdate")) < lit("1996-01-01").cast("date"),
          cents).otherwise(0L)).as("x"),
        sum(when(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date"),
          cents).otherwise(0L)).as("y"))
      .withColumn("grp",
        pmod(conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
          16, 10).cast("long"), lit(2L)))
    val mom = spend.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    val g = spend.groupBy("grp").agg(count(lit(1)).as("ng"),
      sum("x").as("sxg"), sum("y").as("syg"))
    g.crossJoin(broadcast(mom))
      // Fixed float sequence, mirrored token-for-token by the oracle.
      .withColumn("vnum",
        col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      .filter(col("vnum") > lit(0.0))
      .withColumn("theta",
        (col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) / col("vnum"))
      .select(col("grp"), col("ng").as("n"),
        floor(col("syg").cast("double") / col("ng").cast("double") -
          col("theta") * (col("sxg").cast("double") / col("ng").cast("double") -
            col("sx").cast("double") / col("n").cast("double")))
          .cast("long").as("adj_mean_cents"),
        floor(lit(1000000.0) * col("theta")).cast("long").as("theta_e6"))
      .orderBy("grp")
  }

  /** Herfindahl–Hirschman concentration of customer spend within each
    * market segment — the "is revenue dominated by a few whales?"
    * monitor (and, at pipeline scale, the skew early-warning for any
    * keyed shuffle on customer). Each customer's share is floored to
    * exact ppm BEFORE squaring, so the HHI sum is order-independent
    * integer arithmetic (max 10¹² = single-customer monopoly; BIGINT
    * headroom to ~9·10⁶ customers per segment even if every share
    * floored to the max). One fact⋈dimension join, one customer-grain
    * partial agg, a 5-row segment total broadcast back.
    */
  private val qHhi: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("seg"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
    val tot = spend.groupBy("seg").agg(sum("cents").as("segtot"))
    spend.join(broadcast(tot), Seq("seg"))
      .select(col("seg"),
        expr("1000000 * cents DIV segtot").as("share_ppm"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("share_ppm") * col("share_ppm")).as("hhi_e12"),
        max("share_ppm").as("top_share_ppm"))
      .orderBy("seg")
  }

  /** Odds ratio and relative risk of the BUILDING-segment exposure on
    * urgent-order conversion — the 2×2 epidemiological readout next to
    * `q_diff_in_diff`'s continuous one. Cells are customer-grain BIGINT
    * counts from one pass; OR = ad/bc and RR = [a/(a+b)]/[c/(c+d)] are
    * exact integer e6 ratios (cross products ≤ n² < 2⁶³ to ~3·10⁹
    * customers). Degenerate corpora (an empty cell) drop the row on
    * both engines via the same guard.
    */
  private val qOddsRatio: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(max((col("seg") === "BUILDING").cast("long")).as("exp"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("out"))
    base.agg(sum(col("exp") * col("out")).as("a"),
        sum(col("exp") * (lit(1L) - col("out"))).as("b"),
        sum((lit(1L) - col("exp")) * col("out")).as("c"),
        sum((lit(1L) - col("exp")) * (lit(1L) - col("out"))).as("dd"))
      .filter(col("b") * col("c") > 0L && col("c") + col("dd") > 0L &&
        col("a") + col("b") > 0L && col("c") > 0L)
      .select(col("a"), col("b"), col("c"), col("dd").as("d"),
        expr("1000000 * a * dd DIV (b * c)").as("odds_ratio_e6"),
        expr("1000000 * a * (c + dd) DIV (c * (a + b))").as("rel_risk_e6"))
      .orderBy("a")
  }

  /** McNemar's paired test: did each customer's urgent-order behavior
    * CHANGE across the 1996 cutoff? Only the discordant pairs carry
    * signal — b (urgent before, not after) vs c (the reverse) — and the
    * continuity-free statistic (b−c)²/(b+c) is exact integer ppm. The
    * pairing (same customer both periods) is what the independent-sample
    * `q_welch_ttest`/`q_odds_ratio` forms cannot express. One
    * customer-grain conditional aggregate, then a 1-row reduce.
    */
  private val qMcnemar: Q = (s, d) => {
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(when(to_date(col("o_orderdate")) < lit("1996-01-01").cast("date") &&
          col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("pre"),
        max(when(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
          col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("post"))
    per.agg(sum(col("pre") * (lit(1L) - col("post"))).as("b"),
        sum((lit(1L) - col("pre")) * col("post")).as("c"),
        count(lit(1)).as("n_cust"))
      .filter(col("b") + col("c") > 0L)
      .select(col("n_cust"), col("b"), col("c"),
        expr("1000000 * (b - c) * (b - c) DIV (b + c)").as("mcnemar_chi2_e6"))
      .orderBy("n_cust")
  }

  /** Cohen's kappa agreement between two deterministic customer
    * classifiers — spend above its lower median vs order COUNT above
    * its lower median (chance-corrected: raw accuracy overstates
    * agreement when both rules fire rarely). Both cuts are exact order
    * statistics at rank (n+1) DIV 2 off the distributed total-order
    * rank; the 2×2 cells and the kappa numerator/denominator
    * N(a+d)−E over N²−E (E = row·column expected agreement) are pure
    * BIGINT (E ≤ n² < 2⁶³ to ~3·10⁹ customers), one DIV at e6.
    */
  private val qCohensKappa: Q = (s, d) => {
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        count(lit(1)).as("cnt"))
    val tot = per.agg(count(lit(1)).as("n_cust"))
    val rs = graft.ops.Ranks.globalRowNumber(per,
      Seq(col("cents").asc, col("o_custkey").asc), "rnk")
    val medS = rs.crossJoin(broadcast(tot))
      .filter(col("rnk") === expr("(n_cust + 1) DIV 2"))
      .select(col("cents").as("med_cents"))
    val rc = graft.ops.Ranks.globalRowNumber(per,
      Seq(col("cnt").asc, col("o_custkey").asc), "rnk")
    val medC = rc.crossJoin(broadcast(tot))
      .filter(col("rnk") === expr("(n_cust + 1) DIV 2"))
      .select(col("cnt").as("med_cnt"))
    per.crossJoin(broadcast(medS)).crossJoin(broadcast(medC))
      .select((col("cents") > col("med_cents")).cast("long").as("r1"),
        (col("cnt") > col("med_cnt")).cast("long").as("r2"))
      .agg(sum(col("r1") * col("r2")).as("a"),
        sum(col("r1") * (lit(1L) - col("r2"))).as("b"),
        sum((lit(1L) - col("r1")) * col("r2")).as("c"),
        sum((lit(1L) - col("r1")) * (lit(1L) - col("r2"))).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd").as("d"),
        expr("(a + b + c + dd) * (a + dd) - ((a + b) * (a + c) + (c + dd) * (b + dd))").as("knum"),
        expr("(a + b + c + dd) * (a + b + c + dd) - ((a + b) * (a + c) + (c + dd) * (b + dd))").as("kden"))
      .filter(col("kden") > 0L)
      // Sign-split the divide: kappa may be negative and Spark's DIV
      // truncates toward zero while DuckDB's // floors — they disagree
      // below zero (the q_kmeans documented discipline).
      .select(col("a"), col("b"), col("c"), col("d"),
        expr("CASE WHEN knum >= 0 THEN 1000000 * knum DIV kden " +
          "ELSE -(1000000 * (-knum) DIV kden) END").as("kappa_e6"))
      .orderBy("a")
  }

  /** Cochran–Armitage trend test: does urgent-order conversion rise
    * MONOTONICALLY across spend deciles? `q_rank_auc` asks whether
    * ranks separate at all; this scores the ordered dose-response with
    * integer decile weights w∈0..9. The n-scaled statistic
    * A = n·Σw·conv − K·Σw and the variance core B = n·Σw² − (Σw)² are
    * exact BIGINT (headroom: every product ≤ 9²·n², under 2⁶³ to
    * n ≈ 3·10⁸ customers; past that promote to DECIMAL(38,0) — the
    * q_grouped_regression point); z² = A²·n / (K·(n−K)·B) is ONE
    * mirrored float sequence.
    */
  private val qCochranArmitage: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").desc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"), sum("conv").as("k_tot"))
    val g = ranked.crossJoin(broadcast(tot))
      .select(expr("(CAST(rnk AS BIGINT) - 1) * 10 DIV n_cust").as("w"),
        col("conv"), col("n_cust"), col("k_tot"))
      .groupBy("n_cust", "k_tot")
      .agg(sum(col("w") * col("conv")).as("swk"), sum("w").as("swn"),
        sum(col("w") * col("w")).as("sw2n"))
      .select(col("n_cust"), col("k_tot"),
        (col("n_cust") * col("swk") - col("k_tot") * col("swn"))
          .as("trend_a"),
        (col("n_cust") * col("sw2n") - col("swn") * col("swn")).as("b"))
    g.filter(col("k_tot") > 0L && col("k_tot") < col("n_cust") &&
        col("b") > 0L)
      .select(col("n_cust"), col("k_tot"), col("trend_a"),
        floor(lit(1000000.0) *
          (col("trend_a").cast("double") * col("trend_a").cast("double") *
            col("n_cust").cast("double")) /
          (col("k_tot").cast("double") *
            (col("n_cust").cast("double") - col("k_tot").cast("double")) *
            col("b").cast("double"))).cast("long").as("z2_e6"))
      .orderBy("n_cust")
  }

  /** Decision-stump split search: among the 9 decile-boundary candidate
    * cuts over customer spend, which threshold best separates urgent-
    * order converters (minimum population-weighted Gini impurity)? The
    * one-node tree every feature-screening pass fits first — and the
    * integer sibling of `q_gains_deciles`' chart (that key reports per-
    * decile capture; this one picks the operating point). Cells come
    * from the cumulative of the 10-row decile table (the only window
    * scans 10 rows); each side's impurity 2·10⁶·k(n−k) DIV n² floors
    * independently, then weights by population and floors once more —
    * all BIGINT (headroom: 2·10⁶·n²/4 < 2⁶³ to n ≈ 4.3·10⁶ per side;
    * past that promote to DECIMAL(38,0), the q_rank_auc point). Best
    * cut = lexicographic min over (impurity, cut) — deterministic under
    * impurity ties.
    */
  private val qBestSplit: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").desc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"), sum("conv").as("k_tot"))
    val dec = ranked.crossJoin(broadcast(tot))
      .select(expr("(CAST(rnk AS BIGINT) - 1) * 10 DIV n_cust").as("decile"),
        col("conv"), col("n_cust"), col("k_tot"))
      .groupBy("decile", "n_cust", "k_tot")
      .agg(count(lit(1)).as("n"), sum("conv").as("k"))
    // cumulative + argmin over the 10-row decile table — tiny by
    // construction, so the global window is safe (the q_gains_deciles
    // cardinality argument)
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = dec
      .withColumn("nl", sum("n").over(w))
      .withColumn("kl", sum("k").over(w))
      .filter(col("decile") < 9L)
      .select(col("decile").as("cut_after_decile"), col("n_cust"),
        col("k_tot"), col("nl"), col("kl"),
        (col("n_cust") - col("nl")).as("nr"),
        (col("k_tot") - col("kl")).as("kr"))
      .withColumn("gl_e6", expr("2000000 * kl * (nl - kl) DIV (nl * nl)"))
      .withColumn("gr_e6", expr(
        "CASE WHEN nr > 0 THEN 2000000 * kr * (nr - kr) DIV (nr * nr) " +
          "ELSE 0 END"))
      .withColumn("wgini_e6", expr("(nl * gl_e6 + nr * gr_e6) DIV n_cust"))
    val best = cand
      .agg(min(struct(col("wgini_e6"), col("cut_after_decile"))).as("b"))
      .select(col("b.cut_after_decile").as("best_cut"))
    cand.crossJoin(broadcast(best))
      .select(col("cut_after_decile"), col("nl"), col("kl"), col("nr"),
        col("kr"), col("wgini_e6"),
        expr("2000000 * k_tot * (n_cust - k_tot) DIV (n_cust * n_cust)")
          .as("parent_gini_e6"),
        (col("cut_after_decile") === col("best_cut")).cast("int")
          .as("is_best"))
      .orderBy("cut_after_decile")
  }

  /** Hill tail-index estimator over customer spend: how heavy is the
    * whale tail? α⁻¹ = (1/k)·Σ_{i≤k} ln(x_(i)/x_(k+1)) over the k = 50
    * largest spends against the (k+1)-th order statistic — the
    * power-law exponent behind `q_pareto_share`'s one-decile snapshot
    * (α ≈ 1 means the top handful carries everything; α large means
    * thin tails). Each log ratio floors to e6 BEFORE the sum (the
    * q_mutual_info per-term discipline — integer sum is order-
    * independent); the mean and the α inversion are integer DIV. Ranks
    * ride the distributed total-order rank; only k+1 head rows survive
    * the filter, so everything after the rank pass is broadcast-sized.
    */
  private val qHillTail: Q = (s, d) => {
    val k = 50
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
      .filter(col("cents") > 0L)
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").desc, col("o_custkey").asc), "rnk")
    val xref = ranked.filter(col("rnk") === lit(k + 1))
      .select(col("cents").as("xref_cents"))
    ranked.filter(col("rnk") <= lit(k))
      .crossJoin(broadcast(xref))
      .select(col("xref_cents"),
        floor(lit(1000000.0) * log(col("cents").cast("double") /
          col("xref_cents").cast("double"))).cast("long").as("term_e6"))
      .groupBy("xref_cents")
      .agg(count(lit(1)).as("k"), sum("term_e6").as("sum_term_e6"))
      // an all-equal head (sum = 0) has no defined tail index — drop it
      // identically on both engines rather than divide by zero
      .filter(col("sum_term_e6") > 0L)
      .select(col("k"), col("xref_cents"), col("sum_term_e6"),
        expr("sum_term_e6 DIV k").as("hill_inv_e6"),
        expr("1000000000000 DIV (sum_term_e6 DIV k)").as("alpha_e6"))
      .orderBy("k")
  }

  /** Lorenz curve at population deciles: customers ranked by spend
    * ASCENDING, the cumulative share of total revenue after each tenth
    * of the population — the full inequality curve that `q_gini`
    * integrates to one number and `q_pareto_share` samples at one
    * point. Ranks ride the distributed total-order rank; the
    * cumulative runs over the 10-row decile table (the q_gains_deciles
    * cardinality argument) and every share is exact integer ppm.
    */
  private val qLorenzCurve: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
    val ranked = graft.ops.Ranks.globalRowNumber(spend,
      Seq(col("cents").asc, col("o_custkey").asc), "rnk")
    val tot = spend.agg(count(lit(1)).as("n_cust"),
      sum("cents").as("total_cents"))
    val dec = ranked.crossJoin(broadcast(tot))
      .select(expr("(CAST(rnk AS BIGINT) - 1) * 10 DIV n_cust").as("decile"),
        col("cents"), col("total_cents"))
      .groupBy("decile", "total_cents")
      .agg(count(lit(1)).as("n"), sum("cents").as("decile_cents"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_cents", sum("decile_cents").over(w))
      .select(col("decile"), col("n"), col("decile_cents"), col("cum_cents"),
        expr("1000000 * cum_cents DIV total_cents").as("cum_share_ppm"))
      .orderBy("decile")
  }

  val registry: Map[String, Q] = Map(
    "q_lorenz_curve" -> qLorenzCurve,
    "q_best_split" -> qBestSplit,
    "q_hill_tail" -> qHillTail,
    "q_cochran_armitage" -> qCochranArmitage,
    "q_theil_sen" -> qTheilSen,
    "q_mann_kendall" -> qMannKendall,
    "q_kendall_tau" -> qKendallTau,
    "q_cuped" -> qCuped,
    "q_ks_test" -> qKsTest,
    "q_cramers_v" -> qCramersV,
    "q_abc_classes" -> qAbcClasses,
    "q_acf_lags" -> qAcfLags,
    "q_burstiness" -> qBurstiness,
    "q_diff_in_diff" -> qDiffInDiff,
    "q_seasonal_naive_eval" -> qSeasonalNaiveEval,
    "q_mutual_info" -> qMutualInfo,
    "q_ab_srm" -> qAbSrm,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_confusion_matrix" -> qConfusionMatrix,
    "q_calibration" -> qCalibration,
    "q_gains_deciles" -> qGainsDeciles,
    "q_rank_auc" -> qRankAuc,
    "q_trimmed_mean" -> qTrimmedMean,
    "q_weighted_median" -> qWeightedMedian,
    "q_conversion_ci" -> qConversionCi,
    "q_welch_ttest" -> qWelchTtest,
    "q_pareto_share" -> qParetoShare,
    "q_benford" -> qBenford,
    "q_dow_profile" -> qDowProfile,
    "q_anomaly_days" -> qAnomalyDays,
    "q_hhi" -> qHhi,
    "q_odds_ratio" -> qOddsRatio,
    "q_mcnemar" -> qMcnemar,
    "q_cohens_kappa" -> qCohensKappa,
  )

  val oracle: Map[String, String] = Map(
    "q_lorenz_curve" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(cents) AS BIGINT) AS total_cents FROM spend),
        |dec AS (SELECT (rnk - 1) * 10 // n_cust AS decile, cents,
        |    total_cents
        |  FROM ranked CROSS JOIN tot),
        |agg AS (SELECT decile, total_cents, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS decile_cents
        |  FROM dec GROUP BY 1, 2)
        |SELECT CAST(decile AS BIGINT) AS decile, n, decile_cents,
        |  CAST(sum(decile_cents) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents,
        |  CAST(1000000 * CAST(sum(decile_cents) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    // total_cents AS BIGINT) AS cum_share_ppm
        |FROM agg ORDER BY decile""".stripMargin,
    "q_best_split" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(conv) AS BIGINT) AS k_tot FROM spend),
        |dec AS (SELECT (rnk - 1) * 10 // n_cust AS decile, conv, n_cust,
        |    k_tot
        |  FROM ranked CROSS JOIN tot),
        |agg AS (SELECT decile, n_cust, k_tot,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS k
        |  FROM dec GROUP BY 1, 2, 3),
        |cum AS (SELECT decile, n_cust, k_tot,
        |    CAST(sum(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS nl,
        |    CAST(sum(k) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS kl
        |  FROM agg),
        |cand AS (SELECT decile AS cut_after_decile, n_cust, k_tot, nl, kl,
        |    n_cust - nl AS nr, k_tot - kl AS kr
        |  FROM cum WHERE decile < 9),
        |g AS (SELECT *,
        |    2000000 * kl * (nl - kl) // (nl * nl) AS gl_e6,
        |    CASE WHEN nr > 0 THEN 2000000 * kr * (nr - kr) // (nr * nr)
        |      ELSE 0 END AS gr_e6
        |  FROM cand),
        |gg AS (SELECT *, (nl * gl_e6 + nr * gr_e6) // n_cust AS wgini_e6
        |  FROM g),
        |best AS (SELECT cut_after_decile AS best_cut FROM gg
        |  ORDER BY wgini_e6, cut_after_decile LIMIT 1)
        |SELECT CAST(cut_after_decile AS BIGINT) AS cut_after_decile,
        |  nl, kl, CAST(nr AS BIGINT) AS nr, CAST(kr AS BIGINT) AS kr,
        |  CAST(wgini_e6 AS BIGINT) AS wgini_e6,
        |  CAST(2000000 * k_tot * (n_cust - k_tot) // (n_cust * n_cust)
        |    AS BIGINT) AS parent_gini_e6,
        |  CAST(CASE WHEN cut_after_decile = best_cut THEN 1 ELSE 0 END
        |    AS INT) AS is_best
        |FROM gg CROSS JOIN best ORDER BY cut_after_decile""".stripMargin,
    "q_hill_tail" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend WHERE cents > 0),
        |xref AS (SELECT cents AS xref_cents FROM ranked WHERE rnk = 51),
        |terms AS (SELECT xref_cents,
        |    CAST(floor(1000000.0 * ln(CAST(cents AS DOUBLE) /
        |      CAST(xref_cents AS DOUBLE))) AS BIGINT) AS term_e6
        |  FROM ranked CROSS JOIN xref WHERE rnk <= 50),
        |a AS (SELECT xref_cents, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(term_e6) AS BIGINT) AS sum_term_e6
        |  FROM terms GROUP BY 1)
        |SELECT k, xref_cents, sum_term_e6,
        |  CAST(sum_term_e6 // k AS BIGINT) AS hill_inv_e6,
        |  CAST(1000000000000 // (sum_term_e6 // k) AS BIGINT) AS alpha_e6
        |FROM a WHERE sum_term_e6 > 0 ORDER BY k""".stripMargin,
    "q_mann_kendall" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.y AS y1, b.y AS y2
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |sa AS (SELECT CAST(sum(CASE WHEN y2 > y1 THEN 1
        |    WHEN y2 < y1 THEN -1 ELSE 0 END) AS BIGINT) AS s_stat FROM p),
        |ti AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie18
        |  FROM (SELECT count(*) AS t FROM daily GROUP BY y)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
        |SELECT n, s_stat,
        |  CAST(n * (n - 1) * (2 * n - 5) - tie18 AS BIGINT) AS var_s_x18
        |FROM nn CROSS JOIN sa CROSS JOIN ti ORDER BY n""".stripMargin,
    "q_kendall_tau" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS y,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS r
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.y AS y1, a.r AS r1, b.y AS y2, b.r AS r2
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS npairs,
        |    CAST(sum(CASE WHEN (y2 > y1 AND r2 > r1)
        |      OR (y2 < y1 AND r2 < r1) THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN (y2 > y1 AND r2 < r1)
        |      OR (y2 < y1 AND r2 > r1) THEN 1 ELSE 0 END) AS BIGINT) AS disc
        |  FROM p)
        |SELECT npairs, conc, disc,
        |  CAST(1000000 * (conc - disc) // npairs AS BIGINT) AS tau_a_e6
        |FROM a ORDER BY npairs""".stripMargin,
    "q_cuped" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        |      THEN CAST(round(o_totalprice * 100.0) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |      THEN CAST(round(o_totalprice * 100.0) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |sp AS (SELECT *,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
        |      % 2 AS grp
        |  FROM spend),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |  FROM sp),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS BIGINT) AS sxg, CAST(sum(y) AS BIGINT) AS syg
        |  FROM sp GROUP BY 1),
        |j AS (SELECT *,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vnum
        |  FROM g CROSS JOIN mom),
        |t AS (SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / vnum AS theta
        |  FROM j WHERE vnum > 0.0)
        |SELECT CAST(grp AS BIGINT) AS grp, ng AS n,
        |  CAST(floor(CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)
        |    - theta * (CAST(sxg AS DOUBLE) / CAST(ng AS DOUBLE)
        |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
        |    AS adj_mean_cents,
        |  CAST(floor(1000000.0 * theta) AS BIGINT) AS theta_e6
        |FROM t ORDER BY grp""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.day AS d1, a.y AS y1, b.day AS d2, b.y AS y2
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |s AS (SELECT (1000000 * (y2 - y1)) // (d2 - d1) AS slope_e6, d1, d2
        |  FROM p),
        |r AS (SELECT slope_e6,
        |    row_number() OVER (ORDER BY slope_e6, d1, d2) AS rn FROM s),
        |t AS (SELECT count(*) AS m FROM s)
        |SELECT CAST(m AS BIGINT) AS m, CAST(slope_e6 AS BIGINT)
        |  AS ts_slope_e6
        |FROM r CROSS JOIN t WHERE rn = (m + 1) // 2 ORDER BY m""".stripMargin,
    "q_ks_test" ->
      """WITH b AS (SELECT CAST(round(o_totalprice * 100.0) AS BIGINT)
        |      AS cents,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT cents, CAST(sum(g1) AS BIGINT) AS c1,
        |    count(*) AS ct FROM b GROUP BY 1),
        |r AS (SELECT cents,
        |    CAST(sum(c1) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum1,
        |    CAST(sum(ct) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumt
        |  FROM per),
        |tot AS (SELECT CAST(max(cum1) AS BIGINT) AS n1,
        |    CAST(max(cumt) - max(cum1) AS BIGINT) AS n2 FROM r),
        |dif AS (SELECT cents, n1, n2,
        |    abs(cum1 * n2 - (cumt - cum1) * n1) AS dnum
        |  FROM r CROSS JOIN tot),
        |mx AS (SELECT n1, n2, max(dnum) AS d_num FROM dif GROUP BY 1, 2)
        |SELECT dif.n1, dif.n2, d_num,
        |  CAST(1000000 * d_num // (dif.n1 * dif.n2) AS BIGINT) AS ks_e6,
        |  CAST(min(cents) AS BIGINT) AS at_cents
        |FROM dif JOIN mx ON dif.n1 = mx.n1 AND dif.n2 = mx.n2
        |  AND dif.dnum = mx.d_num
        |GROUP BY dif.n1, dif.n2, d_num ORDER BY dif.n1""".stripMargin,
    "q_cramers_v" ->
      """WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
        |    count(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT prio, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |contrib AS (SELECT seg, prio, n,
        |    (o * n - r * c) * (o * n - r * c) // ((r * c * n) // 1000000)
        |      AS chi2_e6
        |  FROM cells JOIN rt USING (seg) JOIN ct USING (prio) CROSS JOIN nt),
        |a AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(chi2_e6) AS BIGINT) AS chi2_e6,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS r_levels,
        |    CAST(count(DISTINCT prio) AS BIGINT) AS c_levels
        |  FROM contrib)
        |SELECT n, r_levels, c_levels, chi2_e6,
        |  CAST(floor(sqrt(CAST(chi2_e6 AS DOUBLE) / 1000000.0 /
        |    CAST(n * least(r_levels - 1, c_levels - 1) AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS v_e6
        |FROM a ORDER BY n""".stripMargin,
    "q_abc_classes" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT cents, l_partkey,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM rev),
        |tot AS (SELECT CAST(max(cum) AS BIGINT) AS tot FROM r),
        |cls AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |      WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc,
        |    cents, tot
        |  FROM r CROSS JOIN tot)
        |SELECT abc, count(*) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS class_cents,
        |  CAST(1000000 * CAST(sum(cents) AS BIGINT) // tot AS BIGINT)
        |    AS share_ppm
        |FROM cls GROUP BY abc, tot ORDER BY abc""".stripMargin,
    "q_acf_lags" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    count(*) AS y
        |  FROM orders GROUP BY 1),
        |l AS (SELECT day, y,
        |    CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag
        |  FROM daily),
        |p AS (SELECT lag, l.y AS y, d2.y AS yn
        |  FROM l JOIN daily d2 ON l.day + l.lag = d2.day),
        |a AS (SELECT lag, count(*) AS m, sum(y) AS sa, sum(yn) AS sb,
        |    sum(y * yn) AS sab, sum(y * y) AS saa, sum(yn * yn) AS sbb
        |  FROM p GROUP BY 1)
        |SELECT lag, CAST(m AS BIGINT) AS m, CAST(sa AS BIGINT) AS sa,
        |  CAST(sb AS BIGINT) AS sb,
        |  CAST(floor(CAST(m * sab - sa * sb AS DOUBLE)
        |    / sqrt(CAST(m * saa - sa * sa AS DOUBLE))
        |    / sqrt(CAST(m * sbb - sb * sb AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS r_e6
        |FROM a
        |WHERE m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
        |ORDER BY lag""".stripMargin,
    "q_burstiness" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sx,
        |  CAST(1000000 * (n_days * sxx - sx * sx) // (n_days * sx)
        |    AS BIGINT) AS vmr_e6
        |FROM m ORDER BY event_type""".stripMargin,
    "q_diff_in_diff" ->
      """WITH o AS (SELECT (c_mktsegment = 'BUILDING') AS treated,
        |    (CAST(o_orderdate AS DATE) >= DATE '1998-01-01') AS post,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |c AS (SELECT treated, post, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sc
        |  FROM o GROUP BY 1, 2),
        |m AS (SELECT treated, post, n, sc // n AS m FROM c),
        |p AS (SELECT CAST(sum(n) AS BIGINT) AS n_orders,
        |    CAST(sum(CASE WHEN treated AND post THEN m END) AS BIGINT)
        |      AS m_t_post,
        |    CAST(sum(CASE WHEN treated AND NOT post THEN m END) AS BIGINT)
        |      AS m_t_pre,
        |    CAST(sum(CASE WHEN NOT treated AND post THEN m END) AS BIGINT)
        |      AS m_c_post,
        |    CAST(sum(CASE WHEN NOT treated AND NOT post THEN m END)
        |      AS BIGINT) AS m_c_pre
        |  FROM m)
        |SELECT n_orders, m_t_post, m_t_pre, m_c_post, m_c_pre,
        |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did_cents
        |FROM p ORDER BY n_orders""".stripMargin,
    "q_seasonal_naive_eval" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
        |      AS total
        |  FROM events GROUP BY 1),
        |j AS (SELECT a.day, a.total, b.total AS pred
        |  FROM daily a JOIN daily b ON a.day = b.day + 7)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(total - pred)) AS BIGINT) AS sum_abs_err,
        |  CAST(sum(abs(total - pred)) // count(*) AS BIGINT) AS mae_cents,
        |  CAST(1000000 * sum(abs(total - pred)) // sum(total) AS BIGINT)
        |    AS wape_ppm
        |FROM j ORDER BY n_days""".stripMargin,
    "q_trimmed_mean" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM c)
        |SELECT event_type, max(n) AS n, count(*) AS n_kept,
        |  CAST(CAST(sum(cents) AS BIGINT) // count(*) AS BIGINT)
        |    AS trimmed_mean_cents
        |FROM r WHERE rn > (n + 9) // 10 AND rn <= n - (n + 9) // 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_weighted_median" ->
      """WITH b AS (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT)
        |    AS cents, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |r AS (SELECT cents,
        |    CAST(sum(qty) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumw
        |  FROM b),
        |tot AS (SELECT CAST(sum(qty) AS BIGINT) AS totw FROM b)
        |SELECT totw, CAST(min(cents) AS BIGINT) AS wmedian_cents
        |FROM r CROSS JOIN tot WHERE cumw * 2 >= totw
        |GROUP BY totw ORDER BY totw""".stripMargin,
    "q_conversion_ci" ->
      """WITH conv AS (SELECT DISTINCT o_custkey FROM orders
        |              WHERE o_orderpriority = '1-URGENT'),
        |per AS (SELECT c_mktsegment AS seg, count(*) AS n,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM customer LEFT JOIN conv ON c_custkey = o_custkey
        |  GROUP BY 1),
        |f AS (SELECT seg, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |    3.8416 / CAST(n AS DOUBLE) AS z2n
        |  FROM per),
        |g AS (SELECT seg, n, k, ph, z2n,
        |    (ph + z2n / 2.0) / (1.0 + z2n) AS ctr,
        |    1.96 * sqrt(ph * (1.0 - ph) / CAST(n AS DOUBLE) +
        |      z2n / (4.0 * CAST(n AS DOUBLE))) / (1.0 + z2n) AS hw
        |  FROM f)
        |SELECT seg, CAST(n AS BIGINT) AS n, k,
        |  CAST(floor(1000000.0 * ph) AS BIGINT) AS p_e6,
        |  greatest(CAST(floor(1000000.0 * (ctr - hw)) AS BIGINT), 0)
        |    AS lo_e6,
        |  least(CAST(floor(1000000.0 * (ctr + hw)) AS BIGINT), 1000000)
        |    AS hi_e6
        |FROM g ORDER BY seg""".stripMargin,
    "q_mutual_info" ->
      """WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
        |    count(*) AS nxy
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |nx AS (SELECT seg, CAST(sum(nxy) AS BIGINT) AS nx
        |       FROM cells GROUP BY 1),
        |ny AS (SELECT prio, CAST(sum(nxy) AS BIGINT) AS ny
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS nn FROM cells)
        |SELECT seg, prio, nxy,
        |  CAST(floor(1000000.0 *
        |    (CAST(nxy AS DOUBLE) / nn) *
        |    ln(CAST(nxy AS DOUBLE) * CAST(nn AS DOUBLE) /
        |       (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))))
        |    AS BIGINT) AS mi_term_e6
        |FROM cells JOIN nx USING (seg) JOIN ny USING (prio)
        |  CROSS JOIN tot
        |ORDER BY seg, prio""".stripMargin,
    "q_pareto_share" ->
      """WITH pc AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey ASC) AS rnk
        |  FROM pc),
        |t AS (SELECT count(*) AS n_cust, CAST(sum(cents) AS BIGINT)
        |        AS total_cents FROM pc)
        |SELECT CAST(n_cust AS BIGINT) AS n_cust, count(*) AS top_n,
        |  CAST(sum(r.cents) AS BIGINT) AS top_cents, total_cents,
        |  CAST(1000000 * CAST(sum(r.cents) AS BIGINT) // total_cents
        |    AS BIGINT) AS share_ppm
        |FROM r CROSS JOIN t
        |WHERE rnk <= (n_cust + 9) // 10
        |GROUP BY n_cust, total_cents ORDER BY n_cust""".stripMargin,
    "q_welch_ttest" ->
      """WITH b AS (SELECT c_mktsegment AS seg,
        |    CAST(round(o_totalprice) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT seg, count(*) AS n1,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS ss1
        |  FROM b GROUP BY 1),
        |tot AS (SELECT count(*) AS nt, CAST(sum(x) AS BIGINT) AS st,
        |    CAST(sum(x * x) AS BIGINT) AS sst FROM b),
        |m AS (SELECT seg, n1, nt - n1 AS n2, s1, st - s1 AS s2,
        |    ss1, sst - ss1 AS ss2 FROM per CROSS JOIN tot),
        |f AS (SELECT seg, n1, n2, s1, s2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
        |      (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))) /
        |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE) AS q1,
        |    (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) *
        |      (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))) /
        |      (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE) AS q2
        |  FROM m WHERE n1 >= 2 AND n2 >= 2),
        |g AS (SELECT * FROM f WHERE q1 + q2 > 0.0)
        |SELECT seg, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  s1, s2,
        |  CAST(floor(1000000.0 * (m1 - m2) / sqrt(q1 + q2)) AS BIGINT)
        |    AS t_e6,
        |  CAST(floor(1000.0 * (q1 + q2) * (q1 + q2) /
        |    (q1 * q1 / (CAST(n1 AS DOUBLE) - 1.0) +
        |     q2 * q2 / (CAST(n2 AS DOUBLE) - 1.0))) AS BIGINT) AS df_e3
        |FROM g ORDER BY seg""".stripMargin,
    "q_ab_srm" ->
      """WITH g AS (SELECT
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        |      % 2 AS grp
        |  FROM customer),
        |o AS (SELECT grp, count(*) AS o FROM g GROUP BY 1),
        |a AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN grp = 0 THEN o ELSE 0 END) AS BIGINT) AS o0,
        |    CAST(sum(CASE WHEN grp = 1 THEN o ELSE 0 END) AS BIGINT) AS o1
        |  FROM o)
        |SELECT n, o0, o1,
        |  CAST(1000000 * (o0 - o1) * (o0 - o1) // n AS BIGINT)
        |    AS srm_chi2_e6
        |FROM a ORDER BY n""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |h AS (SELECT o_orderkey, cents,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |      AS h1,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 8))::BIGINT
        |      AS h2
        |  FROM o),
        |rep AS (SELECT o_orderkey, cents, h1, h2, b
        |  FROM h, LATERAL (SELECT unnest(range(100)) AS b) t),
        |uu AS (SELECT cents, b,
        |    (h1 + (b + 1) * h2) % 1000000 AS u
        |  FROM rep),
        |kk AS (SELECT cents, b,
        |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |      WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
        |      WHEN u < 999917 THEN 6 ELSE 7 END AS k
        |  FROM uu),
        |means AS (SELECT b,
        |    CAST(sum(k * cents) AS BIGINT) // CAST(sum(k) AS BIGINT)
        |      AS mean_cents
        |  FROM kk GROUP BY b HAVING sum(k) > 0),
        |ranked AS (SELECT mean_cents, b,
        |    row_number() OVER (ORDER BY mean_cents ASC, b ASC) AS rnk
        |  FROM means),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_resamples FROM means),
        |est AS (SELECT CAST(sum(cents) AS BIGINT) // count(*)
        |    AS mean_cents_full FROM o)
        |SELECT n_resamples, mean_cents_full,
        |  CAST(max(CASE WHEN rnk = (25 * n_resamples + 999) // 1000
        |    THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
        |  CAST(max(CASE WHEN rnk = (975 * n_resamples + 999) // 1000
        |    THEN mean_cents END) AS BIGINT) AS ci_hi_cents
        |FROM ranked CROSS JOIN nb CROSS JOIN est
        |GROUP BY 1, 2 ORDER BY n_resamples""".stripMargin,
    "q_confusion_matrix" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM spend),
        |med AS (SELECT cents AS med_cents FROM ranked CROSS JOIN tot
        |        WHERE rnk = (n_cust + 1) // 2),
        |p AS (SELECT CASE WHEN cents > med_cents THEN 1 ELSE 0 END AS pred,
        |    conv
        |  FROM spend CROSS JOIN med),
        |a AS (SELECT CAST(sum(pred * conv) AS BIGINT) AS tp,
        |    CAST(sum(pred * (1 - conv)) AS BIGINT) AS fp,
        |    CAST(sum((1 - pred) * conv) AS BIGINT) AS fn,
        |    CAST(sum((1 - pred) * (1 - conv)) AS BIGINT) AS tn
        |  FROM p)
        |SELECT tp, fp, fn, tn,
        |  CAST(1000000 * (tp + tn) // (tp + fp + fn + tn) AS BIGINT)
        |    AS accuracy_ppm,
        |  CAST(1000000 * tp // (tp + fp) AS BIGINT) AS precision_ppm,
        |  CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm,
        |  CAST(2000000 * tp // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
        |FROM a WHERE tp + fp > 0 AND tp + fn > 0 ORDER BY tp""".stripMargin,
    "q_calibration" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM spend),
        |sc AS (SELECT 1000000 * (rnk - 1) // (n_cust - 1) AS score_ppm,
        |    conv
        |  FROM ranked CROSS JOIN tot WHERE n_cust > 1),
        |b AS (SELECT least(score_ppm // 100000, 9) AS bin,
        |    score_ppm, conv FROM sc)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
        |  CAST(1000000 * sum(conv) // count(*) AS BIGINT) AS observed_ppm
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_gains_deciles" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(conv) AS BIGINT) AS k_tot FROM spend),
        |dec AS (SELECT (rnk - 1) * 10 // n_cust AS decile, conv, k_tot
        |  FROM ranked CROSS JOIN tot),
        |agg AS (SELECT decile, k_tot, count(*) AS n,
        |    CAST(sum(conv) AS BIGINT) AS k
        |  FROM dec GROUP BY 1, 2)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n, k,
        |  CAST(1000000 * k // n AS BIGINT) AS conv_ppm,
        |  CAST(1000000 * CAST(sum(k) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    // k_tot AS BIGINT) AS cum_capture_ppm
        |FROM agg ORDER BY decile""".stripMargin,
    "q_rank_auc" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |a AS (SELECT CAST(sum(conv) AS BIGINT) AS n1,
        |    CAST(sum(1 - conv) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN conv = 1 THEN rnk ELSE 0 END) AS BIGINT)
        |      AS sumr
        |  FROM ranked)
        |SELECT n1, n0,
        |  CAST(1000000 * (sumr - n1 * (n1 + 1) // 2) // (n1 * n0)
        |    AS BIGINT) AS auc_e6
        |FROM a WHERE n1 > 0 AND n0 > 0 ORDER BY n1""".stripMargin,
    "q_benford" ->
      """WITH c AS (SELECT
        |    CAST(substr(CAST(CAST(round(o_totalprice * 100.0) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |    count(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  CAST(1000000 * n // nt AS BIGINT) AS obs_ppm,
        |  CAST(floor(1000000.0 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
        |    AS BIGINT) AS benford_ppm
        |FROM c CROSS JOIN tot ORDER BY digit""".stripMargin,
    "q_dow_profile" ->
      """SELECT (CAST(date_diff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS BIGINT) + 3) % 7 AS dow,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
        |    AS BIGINT) // count(*) AS BIGINT) AS avg_cents
        |FROM orders GROUP BY 1 ORDER BY dow""".stripMargin,
    "q_anomaly_days" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |dd AS (SELECT day, cents, (day + 3) % 7 AS dow FROM daily),
        |med AS (SELECT dow, quantile_cont(cents, 0.5) AS med
        |  FROM dd GROUP BY 1),
        |dev AS (SELECT day, dd.dow, cents,
        |    abs(CAST(cents AS DOUBLE) - med) AS dev
        |  FROM dd JOIN med ON dd.dow = med.dow),
        |mad AS (SELECT dow, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT day, dev.dow, cents,
        |  CAST(floor(dev * 100) AS BIGINT) AS dev_e2,
        |  CAST(floor(mad * 100) AS BIGINT) AS mad_e2,
        |  CAST(dev > mad * 3.0 AS INTEGER) AS anom
        |FROM dev JOIN mad ON dev.dow = mad.dow
        |ORDER BY day""".stripMargin,
    "q_cochran_armitage" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
        |      AS BIGINT) AS rnk
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(conv) AS BIGINT) AS k_tot FROM spend),
        |dec AS (SELECT (rnk - 1) * 10 // n_cust AS w, conv, n_cust, k_tot
        |  FROM ranked CROSS JOIN tot),
        |g AS (SELECT n_cust, k_tot,
        |    CAST(sum(w * conv) AS BIGINT) AS swk,
        |    CAST(sum(w) AS BIGINT) AS swn,
        |    CAST(sum(w * w) AS BIGINT) AS sw2n
        |  FROM dec GROUP BY 1, 2),
        |a AS (SELECT n_cust, k_tot,
        |    CAST(n_cust * swk - k_tot * swn AS BIGINT) AS trend_a,
        |    CAST(n_cust * sw2n - swn * swn AS BIGINT) AS b
        |  FROM g)
        |SELECT n_cust, k_tot, trend_a,
        |  CAST(floor(1000000.0 *
        |    (CAST(trend_a AS DOUBLE) * CAST(trend_a AS DOUBLE)
        |      * CAST(n_cust AS DOUBLE)) /
        |    (CAST(k_tot AS DOUBLE)
        |      * (CAST(n_cust AS DOUBLE) - CAST(k_tot AS DOUBLE))
        |      * CAST(b AS DOUBLE))) AS BIGINT) AS z2_e6
        |FROM a WHERE k_tot > 0 AND k_tot < n_cust AND b > 0
        |ORDER BY n_cust""".stripMargin,
    "q_hhi" ->
      """WITH spend AS (SELECT c_mktsegment AS seg, o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT seg, CAST(sum(cents) AS BIGINT) AS segtot
        |  FROM spend GROUP BY 1),
        |sh AS (SELECT spend.seg, 1000000 * cents // segtot AS share_ppm
        |  FROM spend JOIN tot ON spend.seg = tot.seg)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi_e12,
        |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
        |FROM sh GROUP BY 1 ORDER BY seg""".stripMargin,
    "q_odds_ratio" ->
      """WITH base AS (SELECT o_custkey,
        |    CAST(max(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS exp,
        |    CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END) AS BIGINT) AS outc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |cells AS (SELECT CAST(sum(exp * outc) AS BIGINT) AS a,
        |    CAST(sum(exp * (1 - outc)) AS BIGINT) AS b,
        |    CAST(sum((1 - exp) * outc) AS BIGINT) AS c,
        |    CAST(sum((1 - exp) * (1 - outc)) AS BIGINT) AS dd
        |  FROM base)
        |SELECT a, b, c, dd AS d,
        |  CAST(1000000 * a * dd // (b * c) AS BIGINT) AS odds_ratio_e6,
        |  CAST(1000000 * a * (c + dd) // (c * (a + b)) AS BIGINT)
        |    AS rel_risk_e6
        |FROM cells
        |WHERE b * c > 0 AND c + dd > 0 AND a + b > 0 AND c > 0
        |ORDER BY a""".stripMargin,
    "q_mcnemar" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(max(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        |      AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pre,
        |    CAST(max(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |      AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS post
        |  FROM orders GROUP BY 1),
        |agg AS (SELECT CAST(sum(pre * (1 - post)) AS BIGINT) AS b,
        |    CAST(sum((1 - pre) * post) AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS n_cust
        |  FROM per)
        |SELECT n_cust, b, c,
        |  CAST(1000000 * (b - c) * (b - c) // (b + c) AS BIGINT)
        |    AS mcnemar_chi2_e6
        |FROM agg WHERE b + c > 0 ORDER BY n_cust""".stripMargin,
    "q_cohens_kappa" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM per),
        |rs AS (SELECT *, CAST(row_number() OVER (ORDER BY cents ASC,
        |    o_custkey ASC) AS BIGINT) AS rnk FROM per),
        |meds AS (SELECT cents AS med_cents FROM rs CROSS JOIN tot
        |  WHERE rnk = (n_cust + 1) // 2),
        |rc AS (SELECT *, CAST(row_number() OVER (ORDER BY cnt ASC,
        |    o_custkey ASC) AS BIGINT) AS rnk FROM per),
        |medc AS (SELECT cnt AS med_cnt FROM rc CROSS JOIN tot
        |  WHERE rnk = (n_cust + 1) // 2),
        |r12 AS (SELECT CASE WHEN cents > med_cents THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN cnt > med_cnt THEN 1 ELSE 0 END AS r2
        |  FROM per CROSS JOIN meds CROSS JOIN medc),
        |cells AS (SELECT CAST(sum(r1 * r2) AS BIGINT) AS a,
        |    CAST(sum(r1 * (1 - r2)) AS BIGINT) AS b,
        |    CAST(sum((1 - r1) * r2) AS BIGINT) AS c,
        |    CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS dd
        |  FROM r12),
        |kk AS (SELECT a, b, c, dd,
        |    (a + b + c + dd) * (a + dd)
        |      - ((a + b) * (a + c) + (c + dd) * (b + dd)) AS knum,
        |    (a + b + c + dd) * (a + b + c + dd)
        |      - ((a + b) * (a + c) + (c + dd) * (b + dd)) AS kden
        |  FROM cells)
        |SELECT a, b, c, dd AS d,
        |  CAST(CASE WHEN knum >= 0 THEN 1000000 * knum // kden
        |    ELSE -(1000000 * (-knum) // kden) END AS BIGINT) AS kappa_e6
        |FROM kk WHERE kden > 0 ORDER BY a""".stripMargin,
  )
}
