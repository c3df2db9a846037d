package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: both sides written with bucketBy on
  * the join key join WITHOUT a shuffle — the pre-partitioned layout that
  * makes repeated fact-fact joins viable at 100 TB (pay the shuffle once
  * at write time, never at query time).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without an exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored). The in-memory catalog forgets tables between JVMs, so
    // clear leftover locations from earlier runs too.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach(t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t")))

    graft.model.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.model.Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // hint("merge") forces sort-merge (the dim side is small enough to
    // broadcast here; at scale both sides are facts) — the point is the
    // absence of any ShuffleExchange on the bucketed layout.
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders"), "o_orderkey")
      .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle, got plan:\n$plan")

    // correctness: same rows as the plain parquet join
    val expected = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
  }
}
