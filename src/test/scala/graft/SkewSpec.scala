package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling, both layers:
  *
  *  - AQE's runtime skew-join split: the ONE mechanism that saves a
  *    shuffle join when a key is hot enough that its partition would
  *    straggle — verified here by forcing tiny skew thresholds and
  *    asserting the final adaptive plan actually split ("skew=true").
  *  - The explicit salted join (ops/Skew) for the shapes AQE can't
  *    re-plan, asserted row-identical to the unsalted join.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    // Option(...) also absorbs optional confs whose get returns null
    val old = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    // one hot key (0) carrying ~95% of the fact rows + a spread tail
    val fact = spark.range(0, 200000)
      .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97)
        .as("k"), col("id").as("payload"))
    val dim = spark.range(0, 97).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(dim, "k")
      // execute THIS DataFrame (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew split in final plan:\n${finalPlan.take(3000)}")
    }
  }

  test("salted join equals the unsalted join row-for-row") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"))
    val dim = graft.model.Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(dim, Seq("user_id"), "inner")
      .select(col("event_id"), col("c_mktsegment"))
    val salted = graft.ops.Skew.saltedJoin(ev, dim, "user_id",
        col("event_id"), salts = 8)
      .select(col("event_id"), col("c_mktsegment"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
