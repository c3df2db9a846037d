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
}
