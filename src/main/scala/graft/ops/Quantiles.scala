package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles with bounded memory — the two-scan
  * bucket-bisect algorithm.
  *
  * Spark's built-in exact `percentile` materializes every group's
  * values in the aggregation buffer: fine when groups fit an executor,
  * a scale hazard when one group is 10 TB. The classic alternative
  * needs neither materialization nor a global sort:
  *
  *  1. scan 1 — a coarse histogram per (group, value DIV bucketWidth):
  *     a partial-aggregated keyed shuffle whose size is bounded by
  *     groups × buckets, independent of row count;
  *  2. locate, per group, the bucket whose cumulative count crosses the
  *     target rank (a window over the TINY histogram, partitioned by
  *     group);
  *  3. scan 2 — revisit only rows inside each group's target bucket
  *     (a broadcast semi-filter) and take the (rank − preceding)-th
  *     smallest within it (a window over one bucket's worth of rows).
  *
  * Every count is an exact integer; the result is the exact discrete
  * quantile (median_low convention: the smallest value whose cumulative
  * count reaches ceil(n/2) — no interpolation, so engines agree
  * bit-for-bit). Generalizing to any rank or to a second bisection
  * level (for pathological single-bucket skew) is mechanical.
  */
object Quantiles {

  /** Exact per-group lower median of a non-negative integer column:
    * [[quantileAt]] at p = 1/2.
    */
  def medianLow(df: DataFrame, group: String, value: Column,
                as: String = "median", bucketWidth: Long = 4096L): DataFrame =
    quantileAt(df, group, value, pNum = 1L, pDen = 2L, as, bucketWidth)

  /** Exact per-group discrete quantile at rank ceil(n·pNum/pDen): the
    * smallest value whose cumulative count reaches that rank. The
    * fraction arrives as an integer ratio so the rank arithmetic stays
    * exact (`p = 0.95` ⇒ `pNum = 95, pDen = 100` — no float rounding
    * at group-size boundaries). `bucketWidth` trades scan-1 histogram
    * size against scan-2 candidate size.
    */
  def quantileAt(df: DataFrame, group: String, value: Column,
                 pNum: Long, pDen: Long, as: String,
                 bucketWidth: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(pDen > 0 && pNum > 0 && pNum <= pDen,
      s"quantile fraction must be in (0, 1]: $pNum/$pDen")
    val base = df.select(col(group), value.as("_v"))
    val bcnt = base
      .groupBy(col(group), expr(s"_v DIV $bucketWidth").as("_b"))
      .agg(count(lit(1)).as("_n"))
    // ceil(n·p) = (n·pNum + pDen − 1) DIV pDen, all in exact integers.
    // Totals come from the ALREADY-AGGREGATED histogram (groups×buckets
    // rows), not a third scan of the raw input — the algorithm really
    // is two passes over base data.
    val tot = bcnt.groupBy(col(group)).agg(sum(col("_n")).as("_tot"))
      .withColumn("_rk", expr(s"(_tot * $pNum + $pDen - 1) DIV $pDen"))
    val wb = Window.partitionBy(col(group)).orderBy(col("_b"))
    val target = bcnt.withColumn("_cum", sum(col("_n")).over(wb))
      .join(tot, group)
      .filter(col("_cum") >= col("_rk") && col("_cum") - col("_n") < col("_rk"))
      .select(col(group), col("_b"), (col("_cum") - col("_n")).as("_before"),
        col("_rk"))
    val cand = base.withColumn("_b", expr(s"_v DIV $bucketWidth"))
      .join(broadcast(target), Seq(group, "_b"))
    val wr = Window.partitionBy(col(group)).orderBy(col("_v"))
    cand.withColumn("_rn", row_number().over(wr))
      .filter(col("_rn") === col("_rk") - col("_before"))
      .select(col(group), col("_v").as(as))
  }
}
