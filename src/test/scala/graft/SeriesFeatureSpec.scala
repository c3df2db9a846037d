package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-7 rolling-series, feature-engineering,
  * retrieval-metric, graph-similarity, and multimodal-signature
  * operators — laws beyond the DuckDB differential check: running-max
  * monotonicity, band symmetry, ppm range/conservation totals,
  * one-hot exclusivity, rank-transform monotonicity, split coverage,
  * and signature/bit identities.
  */
class SeriesFeatureSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val nDays = graft.model.Tables.orders(spark, sf)
    .select(to_date(col("o_orderdate"))).distinct().count()
  private lazy val nCustomers = graft.model.Tables.customer(spark, sf).count()

  test("q_max_drawdown: peak is a monotone running max; drawdown = peak - cents >= 0") {
    val rows = q("q_max_drawdown").collect()
    assert(rows.length == nDays)
    var peak = Long.MinValue
    rows.foreach { r =>
      val (cents, p, dd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      peak = math.max(peak, cents)
      assert(p == peak, s"day ${r.getLong(0)}: peak $p != running max $peak")
      assert(dd == p - cents && dd >= 0)
    }
  }

  test("q_bollinger: bands symmetric around the mean; breach matches its definition") {
    val rows = q("q_bollinger").collect()
    assert(rows.length == nDays - 6)
    rows.foreach { r =>
      val (cents, mean, sd, up, lo, breach) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6))
      assert(up - mean * 100 == mean * 100 - lo, "bands not symmetric")
      assert(up - lo == 4 * sd)
      val expect = if (cents * 100 > up) 1 else if (cents * 100 < lo) -1 else 0
      assert(breach == expect, s"day ${r.getLong(0)}")
    }
  }

  test("q_rsi: ppm in [0,1e6] and equal to its own gain/(gain+loss) identity") {
    val rows = q("q_rsi").collect()
    assert(rows.nonEmpty && rows.length <= nDays - 14)
    rows.foreach { r =>
      val (g, l, rsi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rsi >= 0 && rsi <= 1000000)
      assert(rsi == 1000000 * g / (g + l))
    }
  }

  test("q_rolling_corr: correlation stays in [-1e6, 1e6]") {
    val rows = q("q_rolling_corr").collect()
    assert(rows.nonEmpty && rows.length <= nDays - 29)
    rows.foreach { r =>
      val c = r.getLong(3)
      assert(c >= -1000000 && c <= 1000000, s"day ${r.getLong(0)}: corr_e6 $c")
    }
  }

  test("q_obv: the running sum replays from the per-day signed volumes") {
    val rows = q("q_obv").collect()
    assert(rows.length == nDays - 1)
    var acc = 0L
    rows.foreach { r =>
      acc += r.getLong(2)
      assert(r.getLong(3) == acc, s"day ${r.getLong(0)}")
    }
  }

  test("q_stratified_split: splits partition every segment; shares sum to ~1e6") {
    val rows = q("q_stratified_split").collect()
    assert(rows.map(_.getLong(2)).sum == nCustomers)
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (seg, rs) =>
      assert(rs.map(_.getString(1)).toSet == Set("train", "test"), seg)
      val ppm = rs.map(_.getLong(4)).sum
      assert(ppm > 1000000L - 2 && ppm <= 1000000L, s"$seg share total $ppm")
      rs.foreach(r => assert(r.getLong(3) == rs.map(_.getLong(2)).sum))
    }
  }

  test("q_kfold_assign: 5 folds cover every customer exactly once") {
    val rows = q("q_kfold_assign").collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L to 4L).toSet))
    assert(rows.map(_.getLong(2)).sum == nCustomers)
  }

  test("q_onehot: exactly one indicator set per customer") {
    val df = q("q_onehot")
    assert(df.count() == nCustomers)
    val bad = df.withColumn("s",
      col("is_automobile") + col("is_building") + col("is_furniture")
        + col("is_household") + col("is_machinery"))
      .filter(col("s") =!= 1).count()
    assert(bad == 0, s"$bad rows without exactly one hot bit")
  }

  test("q_minmax_scale: scaled_e6 in [0,1e6]; per-segment min hits 0 and max hits 1e6") {
    val rows = q("q_minmax_scale").collect()
    assert(rows.length == nCustomers)
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000))
    rows.groupBy(_.getString(1)).foreach { case (seg, rs) =>
      assert(rs.map(_.getLong(3)).min == 0, s"$seg min not 0")
      assert(rs.map(_.getLong(3)).max == 1000000, s"$seg max not 1e6")
    }
  }

  test("q_quantile_normalize: rank transform is monotone in cents with full [0,1e6] span") {
    val rows = q("q_quantile_normalize").collect()
    assert(rows.length == nCustomers)
    val byCents = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    byCents.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(2))
      case _ =>
    }
    assert(byCents.head.getLong(2) == 0 && byCents.last.getLong(2) == 1000000)
  }

  test("q_feature_hash: buckets within [0,64); token mass conserves; terms <= tokens") {
    val rows = q("q_feature_hash").collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    val totalToks = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    assert(rows.map(_.getLong(1)).sum == totalToks)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q_mrr: single row; the identity 1e6 DIV rank holds; rank >= 1") {
    val rows = q("q_mrr").collect()
    assert(rows.length == 1)
    val (rank, mrr) = (rows.head.getLong(2), rows.head.getLong(3))
    assert(rank >= 1 && mrr == 1000000 / rank)
  }

  test("q_precision_at_k: counts bounded by k and the relevant total; identities hold") {
    val r = q("q_precision_at_k").collect().head
    val (k, relK, nRel, p, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(k >= 1 && k <= 10 && relK <= k && relK <= nRel)
    assert(p == 1000000 * relK / k && rec == 1000000 * relK / nRel)
  }

  test("q_jaccard_neighbors: ppm in (0,1e6]; common <= min degree; <=5 per focus; rank order matches score") {
    val rows = q("q_jaccard_neighbors").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (f, rs) =>
      assert(rs.length <= 5, s"focus $f has ${rs.length} rows")
      val ordered = rs.sortBy(_.getInt(6))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) >= b.getLong(5),
          s"focus $f: rank order violates jaccard order")
        case _ =>
      }
    }
    rows.foreach { r =>
      val (nc, df, dc, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nc <= math.min(df, dc))
      assert(j > 0 && j <= 1000000)
      assert(j == 1000000 * nc / (df + dc - nc))
    }
  }

  test("q_partition_skew: row mass conserves; mean relative load is ~1000") {
    val rows = q("q_partition_skew").collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.model.Tables.lineitem(spark, sf).count())
    val loads = rows.map(_.getLong(3))
    val mean = loads.sum.toDouble / loads.length
    assert(math.abs(mean - 1000.0) < 50, s"mean load_e3 $mean")
  }

  test("q_multimodal_phash: bits length = w*h; n_ones counts the 1s and is never all of them") {
    val rows = q("q_multimodal_phash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, bits, ones, grp) =
        (r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5))
      assert(bits.length == w * h)
      assert(bits.count(_ == '1') == ones)
      // strict > threshold: a constant image has zero ones, and no image
      // can have every pixel strictly above its own mean
      assert(ones < w.toLong * h)
      assert(grp >= 1)
    }
    val dupTotals = rows.groupBy(_.getString(3))
      .map { case (_, rs) => (rs.length.toLong, rs.head.getLong(5)) }
    dupTotals.foreach { case (actual, claimed) => assert(actual == claimed) }
  }

  test("q_langid_eval: cells cover the corpus; within-label shares sum to ~1e6") {
    val rows = q("q_langid_eval").collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.model.Tables.documents(spark, sf).count())
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val ppm = rs.map(_.getLong(4)).sum
      assert(ppm > 1000000L - rs.length && ppm <= 1000000L, s"$lang: $ppm")
      rs.foreach(r => assert((r.getInt(5) == 1) ==
        (r.getString(0) == r.getString(1))))
    }
  }

  test("q_adamic_adar: positive scores, <=5 per focus, rank order matches score order") {
    val rows = q("q_adamic_adar").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) > 0))
    rows.groupBy(_.getLong(0)).foreach { case (f, rs) =>
      assert(rs.length <= 5)
      val ordered = rs.sortBy(_.getInt(4))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) >= b.getLong(3), s"focus $f")
        case _ =>
      }
    }
  }

  test("q_union_by_name: null-fills the missing column exactly for the right-side rows") {
    val rows = q("q_union_by_name").collect()
    val o = graft.model.Tables.orders(spark, sf)
    val open = o.filter(col("o_orderstatus") === "O").count()
    val fin = o.filter(col("o_orderstatus") === "F").count()
    assert(rows.length == open + fin)
    rows.foreach { r =>
      val (src, prioNull) = (r.getString(3), r.isNullAt(1))
      assert(prioNull == (src == "finished"), s"order ${r.getLong(0)}")
    }
  }

  test("q_compaction_bins: byte mass conserves; bins are contiguous and doc ranges ordered") {
    val rows = q("q_compaction_bins").collect()
    val docs = graft.model.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(2)).sum ==
      docs.agg(sum("n_chars")).collect().head.getLong(0))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"bin ${a.getLong(0)} overlaps ${b.getLong(0)}")
      case _ =>
    }
  }

  test("q_bootstrap_ci: B resamples, ordered interval, point estimate inside it") {
    val r = q("q_bootstrap_ci").collect().head
    val (n, est, lo, hi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == 100)
    assert(lo <= hi)
    assert(est >= lo && est <= hi,
      s"full-sample mean $est outside bootstrap CI [$lo, $hi]")
  }

  test("q_top_eigenvector: unit-normalized, canonical sign, aligned with a double-precision recompute") {
    val v = q("q_top_eigenvector").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2.toDouble)
    assert(v.map(math.abs).max == 1000000.0)
    // double-precision power iteration over the same covariance cells
    val cells = q("q_covariance_matrix").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2).toDouble))
    val dim = v.length
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { case (a, b, x) => c(a)(b) = x; c(b)(a) = x }
    // same 8-round trajectory as the operator, in plain doubles
    var vec = Array.fill(dim)(1.0)
    (1 to 8).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * vec(j)).sum)
      val m = w.map(math.abs).max
      vec = w.map(_ / m)
    }
    val dot = v.indices.map(i => v(i) * vec(i)).sum
    val cos = math.abs(dot) / math.sqrt(v.map(x => x * x).sum *
      vec.map(x => x * x).sum)
    assert(cos > 0.98, s"integer power iteration diverges from double: cos=$cos")
  }

  test("q_k_anonymity: classes cover the table; flag matches its own n<5 definition") {
    val rows = q("q_k_anonymity").collect()
    assert(rows.map(_.getLong(2)).sum == nCustomers)
    rows.foreach(r => assert((r.getInt(3) == 1) == (r.getLong(2) < 5)))
  }

  test("q_l_diversity: 1<=l<=4 band values; flag matches l<3; mass conserves") {
    val rows = q("q_l_diversity").collect()
    assert(rows.map(_.getLong(2)).sum == nCustomers)
    rows.foreach { r =>
      val l = r.getLong(3)
      assert(l >= 1 && l <= 4)
      assert((r.getInt(4) == 1) == (l < 3))
      assert(l <= r.getLong(2))
    }
  }

  test("q_confusion_matrix: cells partition the customers; ratio identities hold") {
    val r = q("q_confusion_matrix").collect().head
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(tp + fp + fn + tn == nCust)
    assert(r.getLong(4) == 1000000 * (tp + tn) / (tp + fp + fn + tn))
    assert(r.getLong(5) == 1000000 * tp / (tp + fp))
    assert(r.getLong(6) == 1000000 * tp / (tp + fn))
    assert(r.getLong(7) == 2000000 * tp / (2 * tp + fp + fn))
  }

  test("q_calibration: bins cover all scored customers; mean score sits inside its bin") {
    val rows = q("q_calibration").collect()
    val nCust = graft.model.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    rows.foreach { r =>
      val (bin, ms) = (r.getLong(0), r.getLong(2))
      assert(bin >= 0 && bin <= 9)
      assert(ms >= bin * 100000 && ms <= math.min((bin + 1) * 100000, 1000000),
        s"bin $bin mean score $ms")
    }
  }

  test("q_lead_lag_corr: all 7 lags present, correlations within [-1e6,1e6]") {
    val rows = q("q_lead_lag_corr").collect()
    assert(rows.map(_.getLong(0)).toSeq == (-3L to 3L))
    rows.foreach(r =>
      assert(r.getLong(2) >= -1000000 && r.getLong(2) <= 1000000))
  }

  test("q_interpolate: observed days pass through; gap values sit between their brackets") {
    val rows = q("q_interpolate").collect()
    val observed = q("q_max_drawdown").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length >= observed.size)
    rows.foreach { r =>
      val (day, v, gap) = (r.getLong(0), r.getLong(1), r.getInt(2))
      if (gap == 0) assert(v == observed(day))
      else assert(!observed.contains(day))
    }
    // every gap value lies within [min, max] of the two bracketing
    // observations (linearity implies containment)
    val days = rows.map(_.getLong(0))
    val obsDays = days.filter(observed.contains).sorted
    rows.filter(_.getInt(2) == 1).foreach { r =>
      val day = r.getLong(0)
      val prev = obsDays.takeWhile(_ < day).lastOption
      val next = obsDays.dropWhile(_ < day).headOption
      (prev, next) match {
        case (Some(p), Some(n)) =>
          val (lo, hi) = (math.min(observed(p), observed(n)),
            math.max(observed(p), observed(n)))
          assert(r.getLong(1) >= lo && r.getLong(1) <= hi, s"day $day")
        case _ =>
      }
    }
  }

  test("q_naive_bayes: confusion matrix covers the corpus and the classifier beats the prior") {
    val rows = q("q_naive_bayes").collect()
    val nDocs = graft.model.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val majority = graft.model.Tables.documents(spark, sf)
      .groupBy("lang").count().collect().map(_.getLong(1)).max
    assert(correct >= majority,
      s"NB accuracy $correct/$nDocs below majority-class baseline $majority")
  }

  test("q_countmin: the sketch never underestimates and the probe set is the true top-10") {
    val rows = q("q_countmin").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS underestimated ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    val trueTop = graft.model.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(trueTop(r.getString(0)) == r.getLong(1)))
  }

  test("q_tfidf_cosine: scores in (0,1e6], <=3 per focus doc, rank order matches score") {
    val rows = q("q_tfidf_cosine").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < 50 && r.getLong(0) != r.getLong(1))
      assert(r.getLong(2) > 0 && r.getLong(2) <= 1000000)
    }
    rows.groupBy(_.getLong(0)).foreach { case (a, rs) =>
      assert(rs.length <= 3)
      val ordered = rs.sortBy(_.getInt(3))
      ordered.sliding(2).foreach {
        case Array(x, y) => assert(x.getLong(2) >= y.getLong(2), s"focus $a")
        case _ =>
      }
    }
  }

  test("q_kmeans: sizes cover the corpus; full centroid table; every centroid inside the data hull") {
    val rows = q("q_kmeans").collect()
    val nVecs = graft.model.Tables.embeddings(spark, sf).count()
    val byK = rows.groupBy(_.getLong(0))
    assert(byK.values.map(_.head.getLong(3)).sum == nVecs)
    byK.foreach { case (k, rs) =>
      assert(rs.length == 64, s"cluster $k has ${rs.length} dims")
      assert(rs.head.getLong(3) > 0)
    }
    val xe = graft.model.Tables.embeddings(spark, sf)
      .select(explode(col("embedding")).as("x"))
      .agg(min("x"), max("x")).collect().head
    val (lo, hi) = (math.round(xe.getFloat(0).toDouble * (1L << 24)),
      math.round(xe.getFloat(1).toDouble * (1L << 24)))
    rows.foreach(r => assert(r.getLong(2) >= lo && r.getLong(2) <= hi))
  }

  test("q_star_join: five dimensions broadcast, only the fact-fact join shuffles") {
    val p = planOf("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(3000))
    assert("SortMergeJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_token_dropout: kept counts match the rebuilt text; drop rate near 10%") {
    val rows = q("q_token_dropout").collect()
    var orig = 0L; var kept = 0L
    rows.foreach { r =>
      val (n, k, text) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(k <= n)
      val rebuilt = if (text.isEmpty) 0 else text.split(" ").length
      assert(rebuilt == k, s"doc ${r.getLong(0)}: $rebuilt tokens vs n_kept $k")
      orig += n; kept += k
    }
    val rate = 1.0 - kept.toDouble / orig
    assert(rate > 0.05 && rate < 0.15, s"drop rate $rate")
  }

  test("q_curriculum_order: a permutation of the corpus, rank follows quality, 3 phases") {
    val rows = q("q_curriculum_order").collect()
    val nDocs = graft.model.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to nDocs))
    val byRank = rows.sortBy(_.getLong(2))
    byRank.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ =>
    }
    assert(rows.map(_.getLong(3)).toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("q_keyphrases: <=3 tags per doc, rank follows weight") {
    val rows = q("q_keyphrases").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      assert(rs.length <= 3)
      val ordered = rs.sortBy(_.getInt(3))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) >= b.getLong(2), s"doc $doc")
        case _ =>
      }
    }
  }

  test("q_hist2d: cell mass covers every order with a basket") {
    val rows = q("q_hist2d").collect()
    val nOrders = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nOrders)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(Set("1-2", "3-4", "5+").contains(r.getString(1)))
    }
  }

  // ---- plan guards for the scale-critical shapes -------------------------

  private def planOf(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("q_minmax_scale broadcasts the per-segment extrema") {
    assert(planOf("q_minmax_scale").contains("BroadcastHashJoin"))
  }

  test("q_precision_at_k plans the top-10 as TakeOrderedAndProject") {
    assert(planOf("q_precision_at_k").contains("TakeOrderedAndProject"))
  }

  test("q_mrr stays window-free (no global sort of the scored corpus)") {
    val p = planOf("q_mrr")
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q_partition_skew broadcasts the scalar totals") {
    assert(planOf("q_partition_skew").contains("BroadcastNestedLoopJoin")
      || planOf("q_partition_skew").contains("BroadcastHashJoin"))
  }
}
