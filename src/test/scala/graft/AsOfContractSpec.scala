package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 hardening of the native as-of join's contract: the
  * null-UNSAFE null semantics (nulls never match, on either side), the
  * deterministic tiebreak among equal-(key, time) right rows, the
  * fail-fast payload-collision require, and the salted hot-key variant's
  * exactness + partition spread.
  */
class AsOfContractSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
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

  test("null time: left null-time rows emit null payload; right null-time rows never match") {
    val left = Seq(
      (1L, 1L, Option(10L)),   // normal row, matches the t=5 view
      (2L, 1L, Option.empty[Long]), // null left time → unmatched
      (3L, 2L, Option(10L)))   // key whose ONLY right row has null time
      .toDF("id", "k", "t")
    val right = Seq(
      (1L, Option(5L), "a"),
      (1L, Option(7L), "b"),
      (2L, Option.empty[Long], "poison")) // null right time → never held
      .toDF("k", "t", "pay")
    val got = graft.ops.AsOf
      .joinAsOf(left, right, Seq("k"), "t", "t", Seq("pay"))
      .select($"id", $"pay").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("b"), "normal row must still match the latest view")
    assert(got(2L).isEmpty, "null left time must read as unmatched, not time 0")
    assert(got(3L).isEmpty, "a null-time right row must never be the match")
  }

  test("null keys never match null keys (null-unsafe, like an equi-join)") {
    val left = Seq(
      (1L, Option(7L), 10L),
      (2L, Option.empty[Long], 10L)) // null key left row
      .toDF("id", "k", "t")
    val right = Seq(
      (Option(7L), 5L, "real"),
      (Option.empty[Long], 5L, "null-bucket")) // null key right row
      .toDF("k", "t", "pay")
    val got = graft.ops.AsOf
      .joinAsOf(left, right, Seq("k"), "t", "t", Seq("pay"))
      .select($"id", $"pay").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("real"))
    assert(got(2L).isEmpty,
      "null keys must not match null keys — the exec's natural ordering " +
        "groups them, but the hold must skip them")
  }

  test("tiebreakCols pins the winner among equal-(key, time) right rows") {
    // 40 right rows all at the same (key, time) with distinct payloads,
    // spread over many partitions so shuffle arrival order varies — the
    // r7 advice's masked-nondeterminism case, now with payload != time
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = (0 until 40).map(i => (1L, 100L, i.toLong, s"pay_$i"))
      .toDF("k", "t", "seq", "pay").repartition(16)
    (1 to 3).foreach { round =>
      val got = graft.ops.AsOf
        .joinAsOf(left, right, Seq("k"), "t", "t", Seq("pay"),
          tiebreakCols = Seq("seq"))
        .select($"pay").as[String].collect().toSeq
      assert(got == Seq("pay_39"),
        s"round $round: tiebreak must pick the max-seq row, got $got")
    }
  }

  test("payload name colliding with a left column fails fast with a clear message") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "pay")
    val right = Seq((1L, 5L, "y")).toDF("k", "t", "pay")
    val e = intercept[IllegalArgumentException] {
      graft.ops.AsOf.joinAsOf(left, right, Seq("k"), "t", "t", Seq("pay"))
    }
    assert(e.getMessage.contains("collides"), e.getMessage)
  }

  test("joinAsOfSalted equals the unsalted join on a hot-key fixture and spreads the key") {
    // 90% of the left rows share one key — the shape where the unsalted
    // exec lands the whole key in one task
    val left = (0 until 20000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong + 100L else 1L
      (i.toLong, k, (i % 1000).toLong)
    }.toDF("id", "k", "t")
    val right = (0 until 500).map(i => ((i % 9).toLong, i.toLong, i.toLong * 3))
      .toDF("k", "t", "price")
    val plain = graft.ops.AsOf
      .joinAsOf(left, right, Seq("k"), "t", "t", Seq("price"))
      .select($"id", $"price")
    val salted = graft.ops.AsOf
      .joinAsOfSalted(left, right, Seq("k"), "t", "t", Seq("price"),
        saltSource = col("id"), salts = 8)
      .select($"id", $"price")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
      "salted as-of must equal the unsalted join row-for-row")
    // the salt must reach the exchange: the exec's left requirement now
    // clusters on (k, _asof_salt), so the hot key occupies several
    // shuffle partitions instead of one
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("_asof_salt"),
      s"salt column missing from the physical plan:\n${planStr.take(2000)}")
    // AQE's partition coalescing legitimately re-merges a toy-sized
    // shuffle into one partition; pin it off so the assertion observes
    // the salt's spread, which is what matters at real scale
    withConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val spread = graft.ops.AsOf
        .joinAsOfSalted(left, right, Seq("k"), "t", "t", Seq("price"),
          saltSource = col("id"), salts = 8)
        .filter($"k" === 1L)
        .select(spark_partition_id().as("p"))
        .distinct().count()
      assert(spread > 1L, s"hot key still confined to $spread partition(s)")
    }
  }

  test("joinAsOfSalted: a null saltSource row still matches like the unsalted join") {
    // pmod(null, salts) is null — unguarded, the row's REAL key would
    // silently unmatch; the coalesce-to-salt-0 guard must keep it exact
    val left = Seq(
      (1L, 1L, 10L, Option(3L)),          // normal salt source
      (2L, 1L, 10L, Option.empty[Long]))  // NULL salt source
      .toDF("id", "k", "t", "src")
    val right = Seq((1L, 5L, "hit")).toDF("k", "t", "pay")
    val got = graft.ops.AsOf
      .joinAsOfSalted(left, right, Seq("k"), "t", "t", Seq("pay"),
        saltSource = col("src"), salts = 8)
      .select($"id", $"pay").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("hit"))
    assert(got(2L).contains("hit"),
      "null saltSource row must still match its real key")
  }
}
