package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the statistical-testing, text-mining, embedding-quality,
  * graph-health, and warehouse operators added in round 6 — laws beyond
  * the DuckDB differential check (which pins exact values): conservation
  * totals, flag↔definition equivalence, containment⊇Jaccard, degree/
  * triangle identities, PIT-match uniqueness, and proration mass bounds.
  */
class StatOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_welch_ttest: groups partition the fact table; t matches a double recompute") {
    val rows = q("q_welch_ttest").collect()
    val totalOrders = graft.model.Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totalOrders,
        s"seg ${r.getString(0)}: n1+n2 != total")
    }
    // independent plain-double recompute of t for one segment
    val r0 = rows.head
    val (n1, n2, s1, s2) = (r0.getLong(1).toDouble, r0.getLong(2).toDouble,
      r0.getLong(3).toDouble, r0.getLong(4).toDouble)
    val xs = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), round(col("o_totalprice")).cast("long").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val a = xs.filter(_._1 == r0.getString(0)).map(_._2.toDouble)
    val b = xs.filter(_._1 != r0.getString(0)).map(_._2.toDouble)
    assert(a.sum == s1 && b.sum == s2 && a.length == n1 && b.length == n2)
    def varm(v: Array[Double]) = {
      val m = v.sum / v.length
      (v.map(x => (x - m) * (x - m)).sum / (v.length - 1), m)
    }
    val (va, ma) = varm(a); val (vb, mb) = varm(b)
    val t = (ma - mb) / math.sqrt(va / n1 + vb / n2)
    assert(math.abs(r0.getLong(5) / 1e6 - t) < 1e-3,
      s"t_e6=${r0.getLong(5)} vs recompute $t")
  }

  test("q_benford: digits cover 1-9, counts and ppm shares conserve") {
    val rows = q("q_benford").collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(rows.map(_.getLong(1)).sum ==
      graft.model.Tables.orders(spark, sf).count())
    val ppm = rows.map(_.getLong(2)).sum
    assert(ppm > 1000000L - 9 && ppm <= 1000000L, s"obs ppm total $ppm")
    val ben = rows.map(_.getLong(3)).sum
    assert(ben > 1000000L - 9 && ben <= 1000000L, s"benford ppm total $ben")
  }

  test("q_dow_profile: 7 buckets conserve the order count; avg = sum DIV n") {
    val rows = q("q_dow_profile").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 6L))
    assert(rows.map(_.getLong(1)).sum ==
      graft.model.Tables.orders(spark, sf).count())
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) / r.getLong(1)))
  }

  test("q_anomaly_days: flag equals its own |dev| > 3*MAD definition; all days emitted") {
    val rows = q("q_anomaly_days").collect()
    val nDays = graft.model.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.length == nDays)
    rows.foreach { r =>
      val (dev, mad, anom) = (r.getLong(3), r.getLong(4), r.getInt(5))
      // dev_e2/mad_e2 are floors, so compare through the same gate the
      // query evaluates pre-floor only when the flag claims a margin
      if (anom == 1) assert(dev >= 3 * mad, s"day ${r.getLong(0)}")
      assert((r.getLong(0) + 3) % 7 == r.getLong(1))
    }
    assert(rows.map(_.getInt(5)).exists(_ == 0))
  }

  test("q_knn_label: one vote row per query, labels from the corpus, votes in [1,5]") {
    val labels = graft.model.Tables.embeddings(spark, sf)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    val rows = q("q_knn_label").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 20L))
    rows.foreach { r =>
      assert(labels.contains(r.getInt(2)))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 5L)
    }
  }

  test("q_centroid_dist: all unordered label pairs once, cosine within [-1,1]") {
    val l = graft.model.Tables.embeddings(spark, sf)
      .select("label").distinct().count().toInt
    val rows = q("q_centroid_dist").collect()
    assert(rows.length == l * (l - 1) / 2)
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1))
      assert(r.getLong(2) >= -1000000L && r.getLong(2) <= 1000000L)
    }
  }

  test("q_emb_variance: label×dim coverage, counts conserve, variance non-negative") {
    val rows = q("q_emb_variance").collect()
    val perLabel = graft.model.Tables.embeddings(spark, sf)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.length == perLabel.size * 64)
    rows.foreach { r =>
      assert(r.getLong(2) == perLabel(r.getInt(0)))
      assert(r.getLong(3) >= -1L, s"var_e9 ${r.getLong(3)}") // floor of a ~0⁻ float
    }
  }

  test("q_bpe_pairs: pair mass equals sum of (len(word)-1) over the corpus") {
    val expected = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).collect()(0).getLong(0)
    assert(q("q_bpe_pairs").agg(sum("n")).collect()(0).getLong(0) == expected)
  }

  test("q_pmi_cooccur: support floor holds and co-occurrence never exceeds doc count") {
    val nDocs = graft.model.Tables.documents(spark, sf).count()
    val rows = q("q_pmi_cooccur").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 5L && r.getLong(2) <= nDocs)
      assert(r.getLong(3) > 0L)
    }
  }

  test("q_vocab_spectrum: frequency mass equals the corpus token count") {
    val toks = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    val mass = q("q_vocab_spectrum")
      .agg(sum(col("f") * col("n_tokens"))).collect()(0).getLong(0)
    assert(mass == toks)
  }

  test("q_dedup_containment contains every q_dedup_ngram Jaccard pair (both directions)") {
    val cont = q("q_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = q("q_dedup_ngram").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(jac.nonEmpty)
    // J(A,B) ≥ t ⇒ |A∩B|/|A| ≥ t and |A∩B|/|B| ≥ t at the same t=0.5
    jac.foreach { case (a, b) =>
      assert(cont.contains((a, b)) && cont.contains((b, a)),
        s"jaccard pair ($a,$b) missing from containment")
    }
  }

  test("q_degree_dist: degree mass equals twice the edge count") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e2 = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct().count() * 2
    val mass = q("q_degree_dist")
      .agg(sum(col("dg") * col("n_nodes"))).collect()(0).getLong(0)
    assert(mass == e2)
  }

  test("q_clustering_coeff: identities vs q_triangles and a wedge recompute") {
    val r = q("q_clustering_coeff").collect()(0)
    val (tri, wedges, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val part = q("q_triangles").agg(sum("n_tri")).collect()(0).getLong(0)
    assert(tri == part / 3 && part % 3 == 0)
    assert(ppm == 1000000L * part / wedges)
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("q_scd2_asof: exactly one row per purchase; matched state is a dimension type") {
    val purchases = graft.model.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val rows = q("q_scd2_asof").collect()
    assert(rows.length == purchases)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.filter(!_.isNullAt(2)).foreach(r =>
      assert(Set("signup", "error").contains(r.getString(3))))
    assert(rows.exists(!_.isNullAt(2)))
  }

  test("q_new_vs_returning: acquisition mass equals the customer base; split conserves") {
    val rows = q("q_new_vs_returning").collect()
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nCust)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
    assert(rows.head.getLong(3) == 0L) // day one: everyone is new
  }

  test("q_stickiness: ratio bounded and consistent with its own factors") {
    q("q_stickiness").collect().foreach { r =>
      val (sumDau, nDays, mau, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mau <= sumDau && sumDau <= nDays * mau)
      assert(ppm > 0L && ppm <= 1000000L)
      assert(ppm == 1000000L * sumDau / (nDays * mau))
    }
  }

  test("q_active_streaks: one row per active user; streak bounded by active days") {
    val rows = q("q_active_streaks").collect()
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= r.getLong(2))
    }
  }

  test("q_inter_event: gap count = events - first-events per type") {
    val ev = graft.model.Tables.events(spark, sf)
    val perType = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = q("q_inter_event").collect()
    assert(rows.length == perType.size)
    rows.foreach { r =>
      val (n, u) = perType(r.getString(0))
      assert(r.getLong(1) == n - u, s"${r.getString(0)}: gaps != n - users")
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
    }
  }

  test("q_perplexity_lm: one row per scorable doc; n_bigrams = tokens - 1; nll >= 0") {
    val docTok = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q_perplexity_lm").collect()
    assert(rows.length == docTok.count(_._2 >= 2))
    rows.foreach { r =>
      assert(r.getLong(1) == docTok(r.getLong(0)) - 1L)
      assert(r.getLong(2) >= 0L)
    }
  }

  test("q_silhouette: one row per vector; best-other differs from own label") {
    val n = graft.model.Tables.embeddings(spark, sf).count()
    val rows = q("q_silhouette").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getInt(3) != r.getInt(1), "best other equals own label")
      assert(r.getLong(5) == r.getLong(2) - r.getLong(4))
    }
    // this corpus's labels are only weakly clustered (374/1000 margin
    // mass positive at sf0.001) — assert the measure discriminates at
    // all, not a majority
    assert(rows.exists(_.getLong(5) > 0L) && rows.exists(_.getLong(5) < 0L))
  }

  test("q_pareto_share: decile cut exact; top decile holds at least its pro-rata share") {
    val r = q("q_pareto_share").collect()(0)
    val (nCust, topN, topCents, totCents, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(topN == (nCust + 9) / 10)
    assert(topCents <= totCents)
    // top-by-spend decile cannot hold less than a uniform decile
    assert(ppm >= 1000000L * topN / nCust - 1)
    assert(ppm == 1000000L * topCents / totCents)
  }

  test("q_string_index: contiguous ids, frequency-monotone, mass conserves") {
    val rows = q("q_string_index").collect()
    assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) > b.getLong(2) ||
        (a.getLong(2) == b.getLong(2) && a.getString(0) < b.getString(0)))
    }
    assert(rows.map(_.getLong(2)).sum ==
      graft.model.Tables.part(spark, sf).count())
  }

  test("q_target_encode: encoding shrinks toward the global mean") {
    val rows = q("q_target_encode").collect()
    val totN = rows.map(_.getLong(1)).sum
    assert(totN == graft.model.Tables.orders(spark, sf).count())
    val gavgApprox = rows.map(r => r.getLong(1) * r.getLong(2)).sum / totN
    rows.foreach { r =>
      val (avg, enc) = (r.getLong(2), r.getLong(3))
      val lo = math.min(avg, gavgApprox) - 2
      val hi = math.max(avg, gavgApprox) + 2
      assert(enc >= lo && enc <= hi,
        s"${r.getString(0)}: enc $enc outside [$lo, $hi]")
    }
  }

  test("q_common_neighbors: focus-scoped, non-adjacent, ranked top-5 per focus") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = q("q_common_neighbors").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f, cand) = (r.getLong(0), r.getLong(1))
      assert(f < 100L)
      assert(!edges.contains((math.min(f, cand), math.max(f, cand))),
        s"pair ($f,$cand) is an existing edge")
      assert(r.getLong(2) >= 1L && r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getInt(3)).sorted.toSeq == (1 to g.length))
    }
  }

  test("q_covariance_matrix: full upper triangle; diagonal matches a driver recompute") {
    val rows = q("q_covariance_matrix").collect()
    assert(rows.length == 64 * 65 / 2)
    rows.filter(r => r.getInt(0) == r.getInt(1))
      .foreach(r => assert(r.getLong(2) >= -1L, "negative variance"))
    val xs = graft.model.Tables.embeddings(spark, sf)
      .select(expr("CAST(embedding[0] AS DOUBLE)")).collect().map(_.getDouble(0))
    val m = xs.sum / xs.length
    val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
    val got = rows.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get.getLong(2)
    assert(math.abs(got / 1e9 - v) < 1e-4, s"cov00 $got vs recompute $v")
  }

  test("q_mutual_info: cell mass conserves; floored total within cell-count of true MI >= 0") {
    val rows = q("q_mutual_info").collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.model.Tables.orders(spark, sf).count())
    // true MI >= 0 and each published term under-counts by < 1 µnat
    assert(rows.map(_.getLong(3)).sum >= -rows.length.toLong)
  }

  test("q_survival: monotone curve, shrinking risk set, churn mass conserves") {
    val rows = q("q_survival").collect()
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.head.getLong(1) == nCust, "bucket 0 risk set != customer base")
    assert(rows.head.getLong(3) <= 1000000L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(0) < b.getLong(0))
      assert(a.getLong(1) >= b.getLong(1), "risk set must shrink")
      assert(a.getLong(3) >= b.getLong(3), "survival must be non-increasing")
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q_conversion_ci: Wilson interval brackets the point estimate inside [0,1]") {
    val rows = q("q_conversion_ci").collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.model.Tables.customer(spark, sf).count())
    rows.foreach { r =>
      val (n, k, p, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(k <= n)
      assert(lo >= 0L && hi <= 1000000L)
      assert(lo <= p && p <= hi, s"${r.getString(0)}: [$lo, $hi] !∋ $p")
    }
  }

  test("q_funnel_window: the 24h bound only loses or delays conversions vs q_funnel") {
    val unb = q("q_funnel").collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    val rows = q("q_funnel_window").collect()
    assert(rows.length == unb.size)
    var strictlyFewer = 0
    rows.foreach { r =>
      assert(r.getInt(4) <= unb(r.getLong(0)),
        s"user ${r.getLong(0)}: windowed stage exceeds unbounded")
      if (r.getInt(4) < unb(r.getLong(0))) strictlyFewer += 1
      if (!r.isNullAt(2))
        assert(r.getLong(2) > r.getLong(1) &&
          r.getLong(2) <= r.getLong(1) + 86400000000L)
    }
    assert(strictlyFewer > 0, "window bound never binds on this corpus")
  }

  test("q_seasonal_decompose: contiguous spine; trend+seasonal+residual reassembles cents") {
    val rows = q("q_seasonal_decompose").collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      (rows.head.getLong(0) to rows.last.getLong(0)))
    val interior = rows.filter(!_.isNullAt(2))
    assert(interior.length == rows.length - 6, "exactly 3 null-trend edge days per side")
    interior.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) == (r.getLong(1) - r.getLong(2)) * 100L,
        s"day ${r.getLong(0)}: decomposition does not reassemble")
    }
  }

  test("q_changepoint: descending statistic, split means differ at the top candidate") {
    val rows = q("q_changepoint").collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1))
    }
    val top = rows.head
    assert(top.getLong(2) != top.getLong(3),
      "top change-point has identical before/after means")
  }

  test("q_trimmed_mean: interior size identity; mean lies inside the kept range") {
    val perType = graft.model.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("q_trimmed_mean").collect()
    rows.foreach { r =>
      val n = perType(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == n - 2 * ((n + 9) / 10), s"${r.getString(0)}")
    }
  }

  test("q_weighted_median equals the driver-side brute force") {
    val rows = graft.model.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100.0).cast("long").as("c"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tot = rows.map(_._2).sum
    var cum = 0L
    val expect = rows.find { case (_, q) => cum += q; cum * 2 >= tot }.get._1
    val r = q("q_weighted_median").collect()(0)
    assert(r.getLong(0) == tot && r.getLong(1) == expect)
  }

  test("q_class_weights: exact inverse-frequency identity, mass conserves") {
    val rows = q("q_class_weights").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.model.Tables.documents(spark, sf).count())
    val l = rows.length.toLong
    rows.foreach { r =>
      assert(r.getLong(2) == 1000000L * total / (l * r.getLong(1)))
    }
  }

  test("q_ks_test: groups partition the orders; D matches a brute-force recompute") {
    val r = q("q_ks_test").collect()(0)
    val (n1, n2, dnum, ks) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 + n2 == graft.model.Tables.orders(spark, sf).count())
    assert(ks >= 0L && ks <= 1000000L)
    // brute force over the collected sample
    val xs = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").as("g"),
        round(col("o_totalprice") * 100.0).cast("long").as("cents"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val values = xs.map(_._2).distinct.sorted
    val best = values.map { v =>
      val c1 = xs.count { case (g, c) => g && c <= v }.toLong
      val c2 = xs.count { case (g, c) => !g && c <= v }.toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    assert(dnum == best, s"d_num $dnum vs brute-force $best")
  }

  test("q_cramers_v: chi2 equals the contingency key's cell sum; V in [0, 1]") {
    val r = q("q_cramers_v").collect()(0)
    val cellSum = q("q_chisq_contingency").collect().map(_.getLong(4)).sum
    assert(r.getLong(3) == cellSum, "chi2_e6 != sum of per-cell contributions")
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
  }

  test("q_abc_classes: classes partition parts and conserve revenue; cut points hold") {
    val rows = q("q_abc_classes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf(Set("A", "B", "C")))
    val nParts = graft.model.Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts)
    val total = rows.map(_._3).sum
    val shareA = rows.filter(_._1 == "A").map(_._3).sum * 100
    val shareAB = rows.filter(_._1 != "C").map(_._3).sum * 100
    assert(shareA <= total * 80, "class A exceeds the 80% cut")
    assert(shareAB <= total * 95, "classes A+B exceed the 95% cut")
    val ppm = rows.map(_._4).sum
    assert(ppm > 1000000L - rows.length && ppm <= 1000000L)
  }

  test("q_acf_lags: lag-1 row reproduces q_autocorr bit-for-bit") {
    val acf = q("q_acf_lags").collect()
    assert(acf.map(_.getLong(0)).toSeq == (1L to 7L))
    val lag1 = acf.find(_.getLong(0) == 1L).get
    val auto = q("q_autocorr").collect()(0)
    // (m, sa, sb, r_e6) must coincide with the dedicated lag-1 key
    assert(lag1.getLong(1) == auto.getLong(0))
    assert(lag1.getLong(2) == auto.getLong(1))
    assert(lag1.getLong(3) == auto.getLong(2))
    assert(lag1.getLong(4) == auto.getLong(4))
  }

  test("q_theil_sen: median slope lies within the pairwise-slope range; m = C(n,2)") {
    val r = q("q_theil_sen").collect()(0)
    val (m, slope) = (r.getLong(0), r.getLong(1))
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d")).count()
      .collect().map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1)))
    val n = daily.length.toLong
    assert(m == n * (n - 1) / 2, s"pair count $m != C($n,2)")
    val slopes = for {
      (d1, y1) <- daily; (d2, y2) <- daily if d1 < d2
    } yield 1000000L * (y2 - y1) / (d2 - d1)
    val sorted = slopes.sorted
    assert(slope == sorted(((m + 1) / 2 - 1).toInt),
      "median slope != brute-force lower median")
  }

  test("q_top_paths: paths cover only users with events; counts conserve under top-10") {
    val rows = q("q_top_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 10)
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted.reverse,
      "rows must arrive in count-descending order")
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum <= users)
    rows.foreach { case (p, _) =>
      val steps = p.split(">")
      assert(steps.nonEmpty && steps.length <= 3, s"path '$p' has bad arity")
    }
  }

  test("q_feature_assembly: one row per customer, features self-consistent") {
    val rows = q("q_feature_assembly").collect()
    val custs = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.length.toLong == custs)
    rows.foreach { r =>
      val (n, rec, ten, tot, avg, urg) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n >= 1L && rec >= 0L && ten >= 0L)
      assert(avg == tot / n)
      assert(urg >= 0L && urg <= 1000000L)
    }
  }

  test("q_mann_kendall: S and tie-corrected variance match a plain-Scala pairwise recompute") {
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val n = daily.length.toLong
    var s = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong
    val tie18 = daily.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val r0 = q("q_mann_kendall").collect().head
    assert(r0.getLong(0) == n)
    assert(r0.getLong(1) == s, s"S=${r0.getLong(1)} vs recompute $s")
    assert(r0.getLong(2) == n * (n - 1) * (2 * n - 5) - tie18)
    assert(math.abs(s) <= n * (n - 1) / 2)
  }

  test("q_kendall_tau: pair classification matches a plain-Scala recompute; buckets partition") {
    val daily = graft.model.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"),
        sum(round(col("o_totalprice") * 100.0).cast("long")).as("r"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var conc = 0L; var disc = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val dy = java.lang.Long.signum(daily(j)._2 - daily(i)._2)
      val dr = java.lang.Long.signum(daily(j)._3 - daily(i)._3)
      if (dy * dr > 0) conc += 1 else if (dy * dr < 0) disc += 1
    }
    val n = daily.length.toLong
    val r0 = q("q_kendall_tau").collect().head
    assert(r0.getLong(0) == n * (n - 1) / 2)
    assert(r0.getLong(1) == conc && r0.getLong(2) == disc)
    // ties fall in neither bucket, so conc+disc can undershoot npairs
    assert(conc + disc <= r0.getLong(0))
    assert(r0.getLong(3) == 1000000L * (conc - disc) / (n * (n - 1) / 2))
  }

  test("q_cuped: adjustment conserves the total metric; theta matches a double recompute") {
    val rows = q("q_cuped").collect()
    assert(rows.length == 2 && rows.map(_.getLong(0)).toSet == Set(0L, 1L))
    // pooled theta identical across groups
    assert(rows.map(_.getLong(3)).distinct.length == 1)
    val xy = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(when(to_date(col("o_orderdate")) < lit("1996-01-01").cast("date"),
          round(col("o_totalprice") * 100.0).cast("long")).otherwise(0L)).as("x"),
        sum(when(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date"),
          round(col("o_totalprice") * 100.0).cast("long")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    assert(rows.map(_.getLong(1)).sum == xy.length.toLong)
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(rows.head.getLong(3) / 1e6 - theta) < 1e-3,
      s"theta_e6=${rows.head.getLong(3)} vs recompute $theta")
    // Σ n_g·adj_g telescopes to Σy exactly (the CUPED conservation law);
    // each floor loses < 1 cent per group
    val adjTotal = rows.map(r => r.getLong(1) * r.getLong(2)).sum.toDouble
    assert(math.abs(adjTotal - sy) <= rows.map(_.getLong(1)).sum.toDouble,
      s"adjusted total $adjTotal vs sy $sy")
  }

  test("q_interval_prorate: allocation mass within floor-loss of the exact total") {
    val total = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("l_shipdate")) >= to_date(col("o_orderdate")))
      .agg(sum(round(col("l_extendedprice") * 100.0).cast("long")))
      .collect()(0).getLong(0)
    val rows = q("q_interval_prorate").collect()
    val alloc = rows.map(_.getLong(2)).sum
    val slices = rows.map(_.getLong(1)).sum
    assert(alloc <= total, s"allocated $alloc > total $total")
    assert(alloc >= total - slices, s"floor loss exceeds one cent per slice")
  }
}
