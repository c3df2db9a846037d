package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 operators — laws beyond the DuckDB
  * differential check: concentration bounds, 2×2 cell conservation,
  * kappa range, EWMA convexity, AMS/Cauchy–Schwarz inequalities,
  * personalized-vs-global rank mass, and curation retention bounds.
  */
class R7OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_hhi: HHI bounded by [equal-share floor, monopoly]; top share consistent") {
    val rows = q("q_hhi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hhi <= 1000000L * 1000000L, s"seg ${r.getString(0)}: hhi > monopoly")
      // Σ share² ≥ (Σ share)²/n with Σ floor(share_ppm) ≥ 10⁶ − n
      val floorSum = 1000000L - n
      assert(hhi >= floorSum * floorSum / n,
        s"seg ${r.getString(0)}: hhi $hhi below equal-share floor for n=$n")
      assert(top * top <= hhi && top <= 1000000L,
        s"seg ${r.getString(0)}: top share $top inconsistent with hhi $hhi")
    }
  }

  test("q_odds_ratio: cells partition the ordering customers") {
    val rows = q("q_odds_ratio").collect()
    assert(rows.length == 1)
    val r = rows.head
    val cells = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(cells == nCust, s"cells $cells != ordering customers $nCust")
    assert(r.getLong(4) > 0 && r.getLong(5) > 0)
  }

  test("q_mcnemar: statistic matches the discordant-cell recompute") {
    val rows = q("q_mcnemar").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (b, c, chi2) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(chi2 == 1000000L * (b - c) * (b - c) / (b + c))
    assert(r.getLong(0) == graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
  }

  test("q_cohens_kappa: kappa in [-1, 1] e6; cells partition customers") {
    val rows = q("q_cohens_kappa").collect()
    assert(rows.length == 1)
    val r = rows.head
    val cells = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    assert(cells == graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
    assert(math.abs(r.getLong(4)) <= 1000000L, s"kappa ${r.getLong(4)} out of range")
  }

  test("q_ewma: convex combination stays inside the 14-day window envelope") {
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
      .orderBy("day").collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDay = daily.toMap
    val rows = q("q_ewma").collect()
    assert(rows.length == daily.length - 13, "first 13 days must drop")
    rows.foreach { r =>
      val day = r.getLong(0); val ewma = r.getLong(2)
      val window = (0 to 13).flatMap(k => byDay.get(day - k))
      // only full 14-day windows emit (gap days break the kernel too)
      if (window.length == 14) {
        assert(ewma >= window.min - 1 && ewma <= window.max,
          s"day $day: ewma $ewma outside [${window.min}, ${window.max}]")
      }
    }
  }

  test("q_ams_f2: F2 obeys Σf ≤ F2 ≤ (Σf)² and Cauchy-Schwarz; estimate nonneg") {
    q("q_ams_f2").collect().foreach { r =>
      val (users, events, f2, est) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(f2 >= events, "Σf² < Σf impossible for positive counts")
      assert(f2 <= events * events)
      assert(f2 * users >= events * events,
        s"${r.getString(0)}: Cauchy-Schwarz violated")
      assert(est >= 0)
    }
  }

  test("q_ppr: top-25 strictly ordered, positive, and seed-reachable") {
    val rows = q("q_ppr").collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not rank-descending")
    assert(rows.map(_.getLong(0)).distinct.length == 25)
    // seeds hold teleport mass: at least one seed node makes the top 25
    assert(rows.exists(_.getLong(0) % 97 == 0), "no seed in the PPR top-25")
  }

  test("q_dedup_eval: confusion counts tie out against the standalone pair keys") {
    val rows = q("q_dedup_eval").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val truth = q("q_dedup_ngram").count()
    val pred = q("q_dedup_simhash").count()
    assert(tp + fn == truth, s"tp+fn ${tp + fn} != truth pairs $truth")
    assert(tp + fp == pred, s"tp+fp ${tp + fp} != simhash pairs $pred")
    assert(r.getLong(3) == 1000000L * tp / (tp + fp))
    assert(r.getLong(4) == 1000000L * tp / (tp + fn))
  }

  test("q_dedup_prefix: every emitted cluster has >1 member and a member exemplar") {
    val rows = q("q_dedup_prefix").collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 1, s"${r.getString(0)}: singleton emitted")
    }
    // groups partition a subset of docs: Σ cluster sizes ≤ corpus
    val total = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum <= total)
  }

  test("q_rolling_median: median inside window envelope; first 6 days drop") {
    val rows = q("q_rolling_median").collect()
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
      .orderBy("day").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == daily.length - 6)
    val series = daily.map(_._2)
    rows.zipWithIndex.foreach { case (r, i) =>
      val window = series.slice(i, i + 7).sorted
      assert(r.getLong(2) == window(3),
        s"day ${r.getLong(0)}: med ${r.getLong(2)} != recompute ${window(3)}")
    }
  }

  test("q_conductance: volumes close on 2E; cut bounded by the smaller volume") {
    val rows = q("q_conductance").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (e, cut, volS, volR) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(volS + volR == 2 * e, "vol_s + vol_rest != 2E")
    assert(cut <= math.min(volS, volR), "cut exceeds the smaller volume")
    assert(r.getLong(4) <= 1000000L && r.getLong(4) >= 0L)
  }

  test("decodeWav: parses a well-formed container, skips unknown chunks, fails loud") {
    import graft.ops.Multimodal
    val samples = Array[Byte](10, 20, 30, 40, 50, 60) // L=10,30,50 R=20,40,60
    val wav = Multimodal.buildWavPcm8Stereo(44100, samples)
    val st = Multimodal.decodeWav(7L, wav)
    assert(st.sample_rate == 44100 && st.n_channels == 2 && st.bits == 8)
    assert(st.n_frames == 3 && st.sum_l == 90 && st.sum_r == 120)
    // unknown chunk before fmt/data must be skipped, not fatal
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withExtra = wav.take(12) ++ list ++ wav.drop(12)
    // RIFF size field is now stale, but chunk walking ignores it
    val st2 = Multimodal.decodeWav(8L, withExtra)
    assert(st2.sum_l == 90 && st2.sum_r == 120)
    // corrupted magic fails loudly
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(9L, bad))
    // truncated data chunk fails loudly
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(10L, wav.dropRight(2)))
  }

  test("q_multimodal_wav: stats match a direct recompute from the corpus rule") {
    val rows = q("q_multimodal_wav").collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0); val text = docs(id)
      val frames = (50 + id % 100).toInt
      val bytes = (0 until frames * 2).map(j => text.charAt(j % text.length).toInt)
      assert(r.getInt(1) == 8000 + id % 8000)
      assert(r.getLong(4) == frames)
      assert(r.getLong(5) == bytes.zipWithIndex.collect { case (b, j) if j % 2 == 0 => b.toLong }.sum)
      assert(r.getLong(6) == bytes.zipWithIndex.collect { case (b, j) if j % 2 == 1 => b.toLong }.sum)
    }
  }

  test("q_attribution_position: channel credit conserves 1e6 per attributed conversion") {
    val rows = q("q_attribution_position").collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getLong(3)).sum
    // distinct conversions with ≥1 touch, recomputed independently
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val attributed = ev.groupBy(_._1).values.map { events =>
      val sorted = events.sortBy(e => (e._4, e._2))
      var journey = 0
      var touchesInJourney = 0
      var convs = 0
      sorted.foreach { e =>
        if (e._3 == "purchase") {
          if (touchesInJourney > 0) convs += 1
          journey += 1; touchesInJourney = 0
        } else if (e._3 == "view" || e._3 == "click") touchesInJourney += 1
      }
      convs
    }.sum
    assert(totalCredit == 1000000L * attributed,
      s"credit $totalCredit != 1e6 * $attributed")
  }

  test("q_hour_dow_heatmap: cells partition the event stream") {
    val rows = q("q_hour_dow_heatmap").collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.model.Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 7)
      assert(r.getLong(1) >= 0 && r.getLong(1) < 24)
    }
  }

  test("q_dataset_card: figures tie out against direct recomputes") {
    val rows = q("q_dataset_card").collect()
    assert(rows.length == 1)
    val r = rows.head
    val docs = graft.model.Tables.documents(spark, sf)
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.select("lang").distinct().count())
    assert(r.getLong(2) == docs.select("source").distinct().count())
    val toks = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(r.getLong(4) == toks.sum)
    assert(r.getLong(5) == toks((toks.length + 1) / 2 - 1), "median mismatch")
    assert(r.getLong(7) == 1000000L * r.getLong(6) / r.getLong(0))
  }

  test("q_emb_dedup_eval: counts tie out against the verified pair key") {
    val rows = q("q_emb_dedup_eval").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // truth = tp + fn must equal the exact all-pairs threshold count
    val emb = graft.model.Tables.embeddings(spark, sf)
    val truth = graft.ops.Similarity
      .cosinePairs(emb, "vec_id", "embedding", 0.4).count()
    assert(tp + fn == truth, s"tp+fn ${tp + fn} != truth $truth")
    // verified blocked pairs = candidates passing the cosine filter
    // = candidates ∩ truth = tp exactly
    val verified = q("q_dedup_embedding").count()
    assert(verified == tp, s"verified $verified != tp $tp")
    assert(r.getLong(4) == 1000000L * tp / (tp + fn))
  }

  test("q_skew_kurt: ratios match a plain-double recompute from raw values") {
    val rows = q("q_skew_kurt").collect()
    assert(rows.nonEmpty)
    val raw = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { r =>
      val xs = raw.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val m2 = xs.map(x => (x - m) * (x - m)).sum / n
      val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
      assert(math.abs(r.getLong(4) / 1e6 - m3 / (m2 * math.sqrt(m2))) < 1e-3,
        s"${r.getString(0)}: skew mismatch")
      assert(math.abs(r.getLong(5) / 1e6 - (m4 / (m2 * m2) - 3.0)) < 1e-3,
        s"${r.getString(0)}: kurtosis mismatch")
    }
  }

  test("q_geomean: geometric mean sits between min and arithmetic mean") {
    val rows = q("q_geomean").collect()
    val prices = graft.model.Tables.part(spark, sf)
      .select(col("p_brand"),
        round(col("p_retailprice") * 100.0).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { r =>
      val ps = prices.filter(_._1 == r.getString(0)).map(_._2)
      val gm = r.getLong(2)
      assert(gm >= ps.min - 1 && gm <= ps.sum / ps.length + 1,
        s"${r.getString(0)}: geomean $gm outside [min, arith-mean]")
    }
  }

  test("q_span_mask: sentinels number contiguously; mask covers sentinel spans") {
    val rows = q("q_span_mask").collect()
    assert(rows.nonEmpty)
    var sawSpan = false
    rows.foreach { r =>
      val (n, masked, spans, text) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      // chained overlapping starts merge into one sentinel but extend
      // the mask, so the only universal width law is spans ≤ masked ≤ n
      assert(spans <= masked && masked <= n,
        s"doc ${r.getLong(0)}: spans $spans / masked $masked / n $n inconsistent")
      val sentinels = "<extra_id_(\\d+)>".r.findAllMatchIn(text)
        .map(_.group(1).toInt).toSeq
      assert(sentinels == (0 until spans.toInt),
        s"doc ${r.getLong(0)}: sentinel numbering $sentinels != 0..${spans - 1}")
      if (spans > 0) sawSpan = true
    }
    assert(sawSpan, "fixture produced no spans — mask rate degenerate")
  }

  test("q_sql_distinct_on: one row per customer, the max-order row") {
    val rows = q("q_sql_distinct_on").collect()
    val custs = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.length == custs)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q_cochran_armitage: statistic matches a plain-double recompute") {
    val rows = q("q_cochran_armitage").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (n, k, a, z2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // independent replay: deciles from the same rank rule
    val spend = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"),
        max((col("o_orderpriority") === "1-URGENT").cast("long")).as("conv"))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(0)))
    val ranked = spend.sortBy(x => (-x._1, x._3)).zipWithIndex
    val ws = ranked.map { case ((_, conv, _), i) =>
      ((i.toLong * 10) / spend.length, conv)
    }
    val swk = ws.map { case (w, c) => w * c }.sum
    val swn = ws.map(_._1).sum
    val sw2 = ws.map(w => w._1 * w._1).sum
    val nn = spend.length.toLong
    val kk = ws.map(_._2).sum
    assert(nn == n && kk == k)
    assert(a == nn * swk - kk * swn, "trend numerator mismatch")
    val b = nn * sw2 - swn * swn
    val z2d = 1e6 * (a.toDouble * a.toDouble * nn.toDouble) /
      (kk.toDouble * (nn - kk).toDouble * b.toDouble)
    assert(math.abs(z2 - math.floor(z2d)) <= 1, s"z2 $z2 vs $z2d")
  }

  test("q_neyman_alloc: budget conserved within flooring; weights match recompute") {
    val rows = q("q_neyman_alloc").collect()
    assert(rows.nonEmpty)
    val alloc = rows.map(_.getLong(3)).sum
    assert(alloc <= 10000 && alloc > 10000 - 5 * rows.length,
      s"allocation total $alloc implausible for ${rows.length} strata")
    val raw = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), round(col("o_totalprice")).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { r =>
      val xs = raw.filter(_._1 == r.getString(0)).map(_._2)
      val n = BigInt(xs.length)
      val v = n * xs.map(x => BigInt(x) * BigInt(x)).sum -
        BigInt(xs.sum) * BigInt(xs.sum)
      assert(r.getLong(2) == math.floor(math.sqrt(v.toDouble)).toLong,
        s"${r.getString(0)}: weight mismatch")
    }
  }

  test("q_ppl_filter: retention keeps at least the below-cut three quarters") {
    val rows = q("q_ppl_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, ret) = (r.getLong(1), r.getLong(2), r.getLong(5))
      assert(kept >= (3 * n) / 4, s"${r.getString(0)}: kept $kept of $n")
      assert(kept <= n)
      assert(ret == 1000000L * kept / n)
    }
  }

  test("decodeWavDsp: energy/ZCR/peak match a hand computation; corpus crossings nonzero") {
    import graft.ops.Multimodal
    // L frames 100,150 → v=-28,22 (one crossing); R frames 200,50 →
    // v=72,-78 (one crossing)
    val samples = Array[Byte](100.toByte, 200.toByte, 150.toByte, 50.toByte)
    val dsp = Multimodal.decodeWavDsp(1L,
      Multimodal.buildWavPcm8Stereo(8000, samples))
    assert(dsp.n_frames == 2)
    assert(dsp.energy_l == 28L * 28 + 22L * 22)
    assert(dsp.energy_r == 72L * 72 + 78L * 78)
    assert(dsp.zc_l == 1 && dsp.zc_r == 1)
    assert(dsp.peak_l == 28 && dsp.peak_r == 78)
    // registry-level invariants: bounds + the fixture's whole POINT is
    // that samples cross the midline, so crossings must appear somewhere
    val rows = q("q_audio_features").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getLong(1)
      assert(r.getLong(2) <= nf * 128 * 128 && r.getLong(3) <= nf * 128 * 128)
      assert(r.getLong(4) <= nf - 1 && r.getLong(5) <= nf - 1)
      assert(r.getInt(6) <= 128 && r.getInt(7) <= 128)
    }
    assert(rows.map(_.getLong(4)).sum > 0, "no left-channel crossings anywhere")
  }

  test("q_best_split: exactly one best cut, cells conserve, best is the min") {
    val rows = q("q_best_split").collect()
    assert(rows.length == 9)
    val totals = rows.map(r => (r.getLong(1) + r.getLong(3), r.getLong(2) + r.getLong(4))).distinct
    assert(totals.length == 1, s"nl+nr / kl+kr not constant: ${totals.toSeq}")
    val best = rows.filter(_.getInt(7) == 1)
    assert(best.length == 1, "is_best must flag exactly one cut")
    val minW = rows.map(_.getLong(5)).min
    assert(best.head.getLong(5) == minW)
    // Gini is concave: the best weighted child impurity cannot exceed the
    // parent's by more than flooring slack (each side floors once, the
    // weighting floors once → ≤ 2 ppm-units of slack)
    assert(best.head.getLong(5) <= rows.head.getLong(6) + 2,
      s"best wgini ${best.head.getLong(5)} above parent ${rows.head.getLong(6)}")
  }

  test("q_hill_tail: alpha inverts the mean log ratio; reference rank is the 51st") {
    val rows = q("q_hill_tail").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 50, "k must be 50")
    val (xref, sumTerm, inv, alpha) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(xref > 0 && sumTerm > 0)
    assert(inv == sumTerm / 50)
    assert(alpha == 1000000000000L / inv)
    // top-50 spends all ≥ xref ⇒ every term ≥ 0 ⇒ mean ≤ max term
    val top = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100.0).cast("long")).as("cents"))
      .orderBy(col("cents").desc, col("o_custkey").asc)
      .limit(51).collect().map(_.getLong(1))
    assert(top.last == xref, "xref must be the 51st spend")
    val maxTerm = math.floor(1e6 * math.log(top.head.toDouble / xref)).toLong
    assert(inv <= maxTerm, s"mean $inv above max term $maxTerm")
  }

  test("q_lorenz_curve: monotone, closes at 10^6, sits under the diagonal") {
    val rows = q("q_lorenz_curve").collect()
    assert(rows.length == 10)
    val shares = rows.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "cumulative share must be nondecreasing")
    assert(shares.last == 1000000L, s"curve must close at 1e6, got ${shares.last}")
    // ascending-spend order ⇒ the poorest (d+1)/10 of customers hold at
    // most (d+1)/10 of revenue (+1 ppm flooring slack on the decile cut)
    rows.foreach { r =>
      assert(r.getLong(4) <= (r.getLong(0) + 1) * 100000L + 1,
        s"decile ${r.getLong(0)} share ${r.getLong(4)} above the diagonal")
    }
  }

  test("q_bhattacharyya: BC in (0, 1e6]; Hellinger consistent with BC") {
    val rows = q("q_bhattacharyya").collect()
    assert(rows.length == 1)
    val (bc, h) = (rows.head.getLong(1), rows.head.getLong(2))
    assert(bc > 0 && bc <= 1000000L, s"BC $bc out of range")
    val expected = math.floor(math.sqrt(
      ((1000000L - math.min(bc, 1000000L)) * 1000000L).toDouble)).toLong
    assert(h == expected, s"hellinger $h != recompute $expected")
  }

  test("q_markov_stationary: shares conserve within flooring drift; all states kept") {
    val rows = q("q_markov_stationary").collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val piSum = rows.map(_.getLong(2)).sum
    assert(piSum <= 1000000L && piSum >= 1000000L - n,
      s"pi total $piSum outside [1e6-$n, 1e6]")
    val nTypes = graft.model.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(n == nTypes, s"states $n != event types $nTypes")
    rows.foreach(r => assert(r.getLong(1) > 0,
      s"state ${r.getString(0)} lost all mass"))
  }

  test("q_sql_unpivot: melts exactly the pivot grid, no null cells") {
    val rows = q("q_sql_unpivot").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(2)), "UNPIVOT must drop NULL cells")
    val byPrio = rows.groupBy(_.getString(0))
    assert(byPrio.values.forall(_.length <= 3))
    assert(rows.map(_.getString(1)).distinct.sorted.sameElements(
      Array("f", "o", "p")))
  }

  test("q_attribution_shapley: efficiency — credit sums to 1e6 per converting journey") {
    val rows = q("q_attribution_shapley").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    // with only view/click channels k ∈ {1,2}, both divide 1e6 ⇒ the
    // Shapley efficiency axiom holds EXACTLY on the ppm grid
    assert(total % 1000000L == 0, s"credit total $total not whole journeys")
    val j = total / 1000000L
    val sumK = rows.map(_.getLong(1)).sum // Σ_journeys k
    assert(j <= sumK && sumK <= 2 * j, s"journeys $j vs channel slots $sumK")
  }

  test("q_rbo: overlaps monotone and depth-bounded; cumulative closes the term sum") {
    val rows = q("q_rbo").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    val ov = rows.map(_.getLong(1))
    ov.zip(ov.tail).foreach { case (a, b) => assert(a <= b, "overlap shrank") }
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0), "overlap > depth"))
    assert(rows.last.getLong(3) == rows.map(_.getLong(2)).sum)
    assert(rows.last.getLong(3) <= 6513215599L, "RBO above the weight total")
  }

  test("q_bpe_merge: occ equals a manual left-to-right scan over the vocabulary") {
    val rows = q("q_bpe_merge").collect()
    val pair = rows.head.getString(0)
    // manual non-overlapping scan — independent of replace() semantics
    def occIn(w: String): Long = {
      var i = 0; var n = 0L
      while (i <= w.length - 2) {
        if (w.substring(i, i + 2) == pair) { n += 1; i += 2 } else i += 1
      }
      n
    }
    val vocab = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val occTotal = vocab.map { case (w, c) => c * occIn(w) }.sum
    assert(rows.head.getLong(3) == occTotal,
      s"replace-delta occurrences ${rows.head.getLong(3)} != scan $occTotal")
  }

  test("q_markov_stationary: exact replay of the three integer power steps") {
    val rows = q("q_markov_stationary").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val trans = q("q_markov_transitions").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4)))
    val states = trans.flatMap { case ((a, b), _) => Seq(a, b) }.distinct
    var v: Map[String, Long] = states.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val stepped = trans.groupBy(_._1._2).map { case (to, rs) =>
        to -> rs.map { case ((from, _), p) => v.getOrElse(from, 0L) * p }.sum / 1000000L
      }
      v = states.map(st => st -> stepped.getOrElse(st, 0L)).toMap
    }
    val tot = v.values.sum
    rows.foreach { case (st, mass, pi) =>
      assert(mass == v(st), s"$st: mass $mass != replay ${v(st)}")
      assert(pi == 1000000L * v(st) / tot, s"$st: share mismatch")
    }
  }

  test("q_bpe_merge: greedy merge accounting is internally consistent") {
    val rows = q("q_bpe_merge").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (pairN, nWords, occ, before, after, sav) = (r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(r.getString(0).length == 2)
    assert(occ > 0 && nWords > 0)
    assert(occ <= pairN, "non-overlapping occurrences exceed raw pair count")
    assert(after == before - occ, "token accounting must close")
    assert(sav == 1000000L * (before - after) / before)
  }

  test("q_cluster_topics: top-5 per cluster, positive lift, ordered within cluster") {
    val rows = q("q_cluster_topics").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 8, "cluster id out of range")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
      assert(r.getLong(3) >= 5, "support floor violated")
      assert(r.getLong(4) > 0, "lift must be positive")
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getLong(4))
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a >= b, "lift must be nonincreasing down the rank") }
    }
  }

  test("q_dp_histogram: noise bounded by the clamped inverse CDF; accounting closes") {
    val rows = q("q_dp_histogram").collect()
    assert(rows.nonEmpty)
    // |noise| ≤ ln(10⁶/2) at the clamp (u pinned ≥ 2e-6 from ½) ≈ 13.12
    val maxNoise = (1e6 * math.log(500000.0)).toLong + 1
    rows.foreach { r =>
      val (n, u, noise, noisy) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(u >= 1 && u <= 999998, s"u_ppm $u escapes the clamp")
      assert(math.abs(noise) <= maxNoise, s"noise $noise exceeds the CDF bound")
      assert(noisy == n * 1000000L + noise, "noisy count must close")
    }
    assert(rows.map(_.getLong(3)).distinct.length > 1,
      "all buckets drew identical noise — the md5 draw is broken")
  }

  test("q_simpson_diversity: ppm-bounded; inverse matches a collision-count replay") {
    val rows = q("q_simpson_diversity").collect()
    assert(rows.nonEmpty)
    // independent replay of the collision counts per source
    val coll = graft.model.Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(sum(expr("c * (c - 1)")).as("coll"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, vocab, n, sp, inv) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sp >= 0 && sp <= 1000000L, s"$src: simpson $sp")
      assert(vocab <= n)
      val c = coll(src)
      assert(sp == 1000000L * c / (n * (n - 1)), s"$src: simpson mismatch")
      if (c > 0) assert(inv == 1000L * n * (n - 1) / c, s"$src: inverse mismatch")
      else assert(inv == 0)
    }
  }

  test("q_sql_filter_clause: filtered counts nest inside the group totals") {
    val rows = q("q_sql_filter_clause").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"${r.getString(0)}: filtered count exceeds group count")
    }
  }

  test("q_multimodal_phash_near: banded pairs verify, ordered, exact dups present") {
    val rows = q("q_multimodal_phash_near").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      assert(r.getInt(4) >= 0 && r.getInt(4) <= 3, "verify gate leaked")
      assert(r.getInt(2) >= 4 && r.getInt(2) <= 8 &&
        r.getInt(3) >= 3 && r.getInt(3) <= 9, "dims outside the grammar")
    }
    assert(rows.exists(_.getInt(4) == 0),
      "duplicate texts share dims, so hamming-0 pairs must exist")
  }

  test("q_js_divergence: bounded by [flooring slack, ln 2]; vocab global per source") {
    val rows = q("q_js_divergence").collect()
    assert(rows.nonEmpty)
    val vocabs = rows.map(_.getLong(2)).distinct
    assert(vocabs.length == 1, "every source must score the full corpus vocab")
    val ln2e9 = (math.log(2.0) * 1e9).toLong
    rows.foreach { r =>
      val (vocab, jsd) = (r.getLong(2), r.getLong(3))
      // true JSD ≥ 0 and each floored term undershoots by < 1 ⇒ sum ≥ −vocab
      assert(jsd >= -vocab, s"${r.getString(0)}: jsd $jsd below flooring slack")
      assert(jsd <= ln2e9, s"${r.getString(0)}: jsd $jsd above ln 2")
    }
  }
}
