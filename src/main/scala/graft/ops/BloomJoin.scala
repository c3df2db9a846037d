package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the "small-ish build side, huge probe
  * side" shape where a broadcast of the exact key set would be too large
  * but a few-MB Bloom sketch is not: build a sketch of the dim keys,
  * filter the fact table map-side BEFORE its shuffle (dropping the vast
  * majority of non-matching rows at the scan), then run the exact semi
  * join on the survivors so false positives never reach the output.
  *
  * This is the manual form of Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, asserted in
  * RuntimeFilterSpec); the explicit operator works on any plan shape and
  * any key expression, not just the injection sites the optimizer picks.
  * At 100 TB the win is shuffle bytes: the probe exchange carries only
  * rows that (probably) match, at the cost of one tiny sketch broadcast.
  */
object BloomJoin {

  /** `fact LEFT SEMI JOIN dim` on a long key, Bloom-prefiltered.
    * `expectedItems`/`fpp` size the sketch (1M @ 1% ≈ 1.2 MB).
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1000000L,
               fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0L, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    // no distinct on the build side: left-semi already ignores duplicates
    fact.filter(might(col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
