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
