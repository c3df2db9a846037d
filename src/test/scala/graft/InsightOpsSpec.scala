package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the behavioral/robust-stats operators — invariants
  * beyond the DuckDB differential check (which pins exact values):
  * funnel ordering, centroid shape, MAD flag equivalence against a
  * driver-side recomputation, and the skyline's dominance definition
  * against the O(n²) brute force it replaces.
  */
class InsightOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_interval_union invariants: coverage bounded by event count, islands disjoint") {
    val iv = 300000000L
    val ev = graft.model.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_ev")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q("q_interval_union").collect().foreach { r =>
      val (u, islands, covered) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val n = ev(u)
      // each island covers at least one whole interval; total coverage
      // can never exceed one disjoint interval per event
      assert(islands >= 1 && islands <= n)
      assert(covered >= islands * iv && covered <= n * iv,
        s"user $u: covered=$covered islands=$islands events=$n")
    }
  }

  test("q_id_gaps invariants: every gap start is truly missing, its predecessor present") {
    val keys = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey")).filter(col("o_orderkey") % 97L =!= 0L)
      .collect().map(_.getLong(0)).toSet
    val gaps = q("q_id_gaps").collect().map(_.getLong(0))
    assert(gaps.nonEmpty)
    gaps.foreach { g =>
      assert(!keys.contains(g), s"gap start $g is present in the key set")
      assert(keys.contains(g - 1), s"gap start $g has no present predecessor")
      assert(g < keys.max)
    }
  }

  test("q_equidepth_hist invariants: equal depths (±1), ordered disjoint ranges") {
    val rows = q("q_equidepth_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L until 10L))
    val n = rows.map(_._2).sum
    rows.foreach { case (_, cnt, lo, hi) =>
      assert(math.abs(cnt - n / 10) <= 1, s"bucket depth $cnt vs n/10=${n / 10}")
      assert(lo <= hi)
    }
    // value ranges ascend bucket over bucket (equal endpoints allowed:
    // a value straddling a depth boundary lands in both buckets' ends)
    rows.sliding(2).foreach { case Array((_, _, _, hi0), (_, _, lo1, _)) =>
      assert(hi0 <= lo1, s"bucket ranges overlap: hi=$hi0 next lo=$lo1")
    }
  }

  test("q_attribution invariants: touch precedes its purchase and is never a purchase") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows = q("q_attribution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val purchase = r.getLong(1)
      assert(ev(purchase)._1 == "purchase")
      if (!r.isNullAt(2)) {
        val touch = r.getLong(2)
        val (tType, tUs) = ev(touch)
        assert(tType != "purchase" && tType == r.getString(3))
        // strictly preceding frame: touch ordered before the purchase
        // in the (ts, event_id) total order
        assert(tUs < ev(purchase)._2 ||
          (tUs == ev(purchase)._2 && touch < purchase))
      }
    }
  }

  test("q_funnel: stage timestamps strictly increase and stage counts them") {
    val rows = q("q_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val view = r.getLong(1)
      val click = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val buy = if (r.isNullAt(3)) None else Some(r.getLong(3))
      click.foreach(c => assert(c > view, s"user ${r.getLong(0)}"))
      buy.foreach { b =>
        assert(click.isDefined && b > click.get, s"user ${r.getLong(0)}")
      }
      assert(r.getInt(4) == 1 + click.size + buy.size)
    }
    // only users with a view enter the funnel at all
    val viewers = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.length == viewers)
  }

  test("q_label_centroids: one row per (label, dim); exact mean for a spot label") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val labels = emb.select("label").distinct().count()
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val got = q("q_label_centroids").collect()
    assert(got.length == labels * dims)
    // spot-check label 0 / dim 0 against a driver-side recomputation of
    // the same integer-scaled formula
    val xs = emb.filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).cast("double")).collect()
      .map(_.getDouble(0))
    val sx = xs.map(x => math.round(x * 16777216.0)).sum
    val want = math.floor(sx.toDouble / xs.length / 16777216.0 * 1e6).toLong
    val row = got.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get
    assert(row.getLong(2) == xs.length && row.getLong(3) == want)
  }

  /** Spark's exact `percentile(x, 0.5)`: linear interpolation at
    * 0.5·(n−1) over the sorted values.
    */
  private def median(xs: Seq[Double]): Double = {
    val v = xs.sorted
    val pos = 0.5 * (v.length - 1)
    val lo = pos.toInt
    if (lo + 1 >= v.length) v(lo)
    else v(lo) + (pos - lo) * (v(lo + 1) - v(lo))
  }

  test("q_mad_outliers flags exactly |x - median| > 3*MAD (driver-side recompute)") {
    val cents = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100.0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = cents.groupBy(_._2)
    val want = byType.iterator.flatMap { case (_, rows) =>
      val med = median(rows.map(_._3.toDouble).toSeq)
      val devs = rows.map(r => (r._1, math.abs(r._3.toDouble - med)))
      val mad = median(devs.map(_._2).toSeq)
      devs.filter(_._2 > mad * 3.0).map(_._1)
    }.toSet
    val got = q("q_mad_outliers").select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
  }

  test("q_skyline equals the O(n²) dominance definition it replaces") {
    val b = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = b.filter { case (_, c, dt) =>
      !b.exists { case (_, oc, od) =>
        oc >= c && od <= dt && (oc > c || od < dt)
      }
    }.map(_._1).toSet
    val got = q("q_skyline").select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q_exact_median equals the sort-and-index brute force, without global windows") {
    val cents = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100.0).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val want = cents.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> sorted((sorted.length + 1) / 2 - 1) // lower median, 1-based rank
    }
    val got = q("q_exact_median").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // scale guard: every window in the two-scan plan is partitioned
    val df = q("q_exact_median")
    val global = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "bucket-bisect median must not use a global window")
  }

  test("q_chisq_contingency equals the driver-side exact recomputation") {
    val pairs = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val o = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val r = o.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val c = o.groupBy(_._1._2).map { case (p, m) => p -> m.values.sum }
    val n = o.values.sum
    val got = q("q_chisq_contingency").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(got.keySet == o.keySet)
    got.foreach { case ((s0, p), (obs, e6, chi6)) =>
      assert(obs == o((s0, p)))
      assert(e6 == 1000000L * r(s0) * c(p) / n)
      val dev = obs * n - r(s0) * c(p)
      assert(chi6 == dev * dev / ((r(s0) * c(p) * n) / 1000000L))
    }
  }

  test("q_running_distinct: monotone cumulative curve reaching total reach") {
    val rows = q("q_running_distinct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    rows.sliding(2).foreach {
      case Array((_, _, c0), (_, nu, c1)) => assert(c1 == c0 + nu)
      case _ =>
    }
    val total = graft.model.Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect().head.getLong(0)
    assert(rows.last._3 == total)
    assert(rows.map(_._2).sum == total)
  }

  test("q_spearman equals the brute-force rank recomputation, bounded") {
    val base = graft.model.Tables.orders(spark, sf)
      .select(col("o_custkey"), round(col("o_totalprice") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.length.toLong, vs.map(_._2).sum) }
      .toSeq
    val rx = base.sortBy { case (k, f, _) => (f, k) }.map(_._1).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    val ry = base.sortBy { case (k, _, m) => (m, k) }.map(_._1).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    val n = base.length.toLong
    val sd2 = base.map { case (k, _, _) =>
      val d = rx(k) - ry(k); d * d
    }.sum
    val row = q("q_spearman").collect().head
    assert((row.getLong(0), row.getLong(1)) == (n, sd2))
    val den = n * (n * n - 1)
    assert(row.getLong(2) ==
      math.floor(1000000.0 * (1.0 - 6.0 * (sd2.toDouble / den.toDouble))).toLong)
    assert(row.getLong(2) >= -1000000L && row.getLong(2) <= 1000000L)
  }

  test("q_mode equals the brute-force mode; composite-key precondition holds") {
    val cents = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100.0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the scalar ordering key cnt*1e5 - cents is only order-correct
    // while cents stays inside [0, 1e5) — pin the corpus precondition
    assert(cents.forall { case (_, c) => c >= 0L && c < 100000L })
    val want = cents.groupBy(_._1).map { case (t, vs) =>
      val counts = vs.groupBy(_._2).map { case (c, xs) => (c, xs.length.toLong) }
      val best = counts.toSeq.map { case (c, n) => (n, -c) }.max
      t -> (-best._2, best._1)
    }
    val got = q("q_mode").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("q_time_spine: contiguous spine, real zero-gap rows, counts conserved") {
    val rows = q("q_time_spine").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = rows.map(_._1)
    assert(days.toSeq == (days.min to days.max).toSeq,
      "spine must cover every day between min and max exactly once")
    assert(rows.exists(_._2 == 0L),
      "fixture must contain genuine gap days (zero-fill rows)")
    val total = graft.model.Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == total)
  }

  test("q_peak_concurrency equals the naive count-intervals-containing-day peak") {
    // The sweep-line result must match the direct definition: for every
    // interval START day D (peaks can only begin at a start), the number
    // of intervals with d0 <= D < d1. Brute force at sf0.001 scale.
    val iv = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(unix_date(to_date(col("o_orderdate"))).cast("long").as("d0"),
        unix_date(to_date(col("l_shipdate"))).cast("long").as("d1"))
      .filter(col("d1") > col("d0"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naivePeakByDay = iv.map(_._1).distinct.map { d =>
      d -> iv.count { case (a, b) => a <= d && d < b }.toLong
    }
    val naivePeak = naivePeakByDay.map(_._2).max
    val naiveDay = naivePeakByDay.filter(_._2 == naivePeak).map(_._1).min
    val got = q("q_peak_concurrency").collect().head
    assert(got.getLong(0) == naivePeak, s"peak ${got.getLong(0)} != $naivePeak")
    assert(got.getLong(1) == naiveDay, s"day ${got.getLong(1)} != $naiveDay")
  }

  test("q_grouped_regression slope matches a driver-side exact recomputation") {
    val rows = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), round(col("l_extendedprice")).cast("long"),
        round(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (b, rs) =>
      val n = BigInt(rs.length)
      val sx = BigInt(rs.map(_._2).sum); val sy = BigInt(rs.map(_._3).sum)
      val sxy = rs.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val den = n * sxx - sx * sx
      b -> (if (den == 0) 0L
      else math.floor(1e9 * (n * sxy - sx * sy).toDouble / den.toDouble).toLong)
    }
    val got = q("q_grouped_regression").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == want, s"mismatch: ${got.toSet -- want.toSet}")
  }

  test("q_diff_in_diff equals the four cell means recombined") {
    val o = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING"),
        to_date(col("o_orderdate")) >= lit("1998-01-01").cast("date"),
        round(col("o_totalprice") * 100.0).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2)))
    def m(t: Boolean, p: Boolean): Long = {
      val cs = o.filter(x => x._1 == t && x._2 == p).map(_._3)
      cs.sum / cs.length
    }
    val want = (m(true, true) - m(true, false)) - (m(false, true) - m(false, false))
    val got = q("q_diff_in_diff").collect().head
    assert(got.getAs[Long]("did_cents") == want)
    assert(got.getAs[Long]("m_t_post") == m(true, true))
  }

  test("q_linreg_trend equals the driver-side exact OLS recomputation") {
    val daily = graft.model.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("day"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (p, rows) =>
      val byDay = rows.groupBy(_._2).map { case (dy, vs) => dy -> vs.map(_._3).sum }
      val d0 = byDay.keys.min
      val xs = byDay.toSeq.map { case (dy, y) => (dy - d0, y) }
      val n = xs.length.toLong
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map { case (x, y) => x * y }.sum
      val sxx = xs.map { case (x, _) => x * x }.sum
      p -> (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }
    val got = q("q_linreg_trend").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want.filter(_._2._1 >= 2))
    got.foreach { case (p, (_, num, den)) =>
      assert(den > 0, s"$p: non-positive OLS denominator")
      assert(num / den == q("q_linreg_trend").filter(col("priority") === p)
        .collect().head.getLong(5), s"$p: slope is not num DIV den")
    }
  }

  test("q_autocorr: correlation bounded, pairs only over consecutive days") {
    val rows = q("q_autocorr").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (m, rE6) = (r.getLong(0), r.getLong(4))
    assert(m >= 2, "fixture must yield at least two consecutive-day pairs")
    assert(rE6 >= -1000000L && rE6 <= 1000000L, s"|r| > 1: $rE6")
    val days = graft.model.Tables.orders(spark, sf)
      .select(unix_date(to_date(col("o_orderdate"))).cast("long").as("d"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(m == days.count(d => days.contains(d + 1)),
      "pair count must equal the number of consecutive-day runs")
  }

  test("q_winsorize: values clamped to the exact discrete p10/p90 per group") {
    val cents = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100.0).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val bounds = cents.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      g -> (sorted((n + 9) / 10 - 1), sorted((9 * n + 9) / 10 - 1))
    }
    q("q_winsorize").collect().foreach { r =>
      val (t, c, wc) = (r.getString(1), r.getLong(2), r.getLong(3))
      val (lo, hi) = bounds(t)
      assert(wc == math.min(math.max(c, lo), hi),
        s"$t: cents=$c winsorized to $wc, bounds [$lo,$hi]")
    }
  }

  test("q_gini equals the sorted-rank brute force and lands in [0, 1)") {
    val mon = graft.model.Tables.orders(spark, sf)
      .select(col("o_custkey"), round(col("o_totalprice") * 100.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val sorted = mon.sortBy { case (k, m) => (m, k) }.map(_._2)
    val n = sorted.length.toLong
    val s = sorted.sum
    val si = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val num = 2 * si - (n + 1) * s
    val row = q("q_gini").collect().head
    assert((row.getLong(0), row.getLong(2), row.getLong(3)) == (n, num, n * s))
    assert(row.getLong(4) >= 0 && row.getLong(4) < 1000000L)
  }
}
