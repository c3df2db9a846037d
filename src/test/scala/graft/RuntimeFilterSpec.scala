package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (Bloom) filter injection: when a shuffle join's small side
  * carries a selective predicate, Catalyst can build a bloom filter from
  * it at runtime and semi-filter the big side's scan BEFORE the shuffle —
  * at 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~1% that can match. Local thresholds are
  * lowered to make the (tiny) testdata eligible; on a real cluster the
  * defaults (10 GB application side) gate it to where it pays.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val li = graft.model.Tables.lineitem(spark, sf)
      val o = graft.model.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 450000.0) // selective creation side
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter on the fact scan, got:\n${plan.take(3000)}")

      // correctness unaffected by the injected filter
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
