package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Merge, Sinks}

/** MERGE INTO clause semantics on tiny fixtures (the full-corpus clause
  * algebra is oracled by `q_merge_into`): SQL clause precedence, the
  * NOT MATCHED BY SOURCE clause, default clause behavior, the schema
  * guard, and the transactional round-trip through versioned snapshots.
  */
class MergeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
  private def s = Seq((1L, 11L), (2L, 22L), (4L, 44L)).toDF("k", "v")

  test("defaults: matched rows update, unmatched insert, rest kept") {
    val out = Merge.mergeInto(t, s, Seq("k"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 11L), (2L, 22L), (3L, 30L), (4L, 44L)))
  }

  test("matched DELETE beats matched UPDATE (SQL clause precedence)") {
    val out = Merge.mergeInto(t, s, Seq("k"),
        matchedDeleteWhen = Some(col("s.v") === 11L),
        matchedUpdateWhen = Some(lit(true)))
      .as[(Long, Long)].collect().toSet
    // k=1 satisfies BOTH clauses — DELETE must win
    assert(out == Set((2L, 22L), (3L, 30L), (4L, 44L)))
  }

  test("conditional UPDATE keeps the target row when the condition fails") {
    val out = Merge.mergeInto(t, s, Seq("k"),
        matchedUpdateWhen = Some(col("s.v") > 21L))
      .as[(Long, Long)].collect().toSet
    // k=1: 11 ≤ 21 → target 10 kept; k=2: 22 > 21 → updated
    assert(out == Set((1L, 10L), (2L, 22L), (3L, 30L), (4L, 44L)))
  }

  test("NOT MATCHED BY SOURCE DELETE removes only condition-matching target-only rows") {
    val out = Merge.mergeInto(t, s, Seq("k"),
        notMatchedInsertWhen = None,
        notMatchedBySourceDeleteWhen = Some(col("t.v") === 30L))
      .as[(Long, Long)].collect().toSet
    // k=3 is target-only and matches → deleted; k=4 insert suppressed
    assert(out == Set((1L, 11L), (2L, 22L)))
  }

  test("NULL clause conditions mean clause-not-applicable, never clause-applied") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, false),
      StructField("v", StringType, true)))
    val tN = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null), Row(2L, "b")), schema)
    val sN = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "x"), Row(2L, "y")), schema)
    // matched-DELETE condition is NULL for k=1 (t.v is null): the row
    // must NOT be deleted, and the due UPDATE must still apply
    val out = Merge.mergeInto(tN, sN, Seq("k"),
        matchedDeleteWhen = Some(col("t.v") === "zzz"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "x", 2L -> "y"))
    // NOT-MATCHED-BY-SOURCE condition NULL for a target-only NULL row:
    // the row must be KEPT (condition not TRUE ⇒ no delete)
    val out2 = Merge.mergeInto(tN, sN.filter(col("k") === 2L), Seq("k"),
        notMatchedBySourceDeleteWhen = Some(col("t.v") === "zzz"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == Map(1L -> null, 2L -> "y"))
  }

  test("schema mismatch fails loud") {
    val bad = Seq((1L, 1L)).toDF("k", "other")
    assertThrows[IllegalArgumentException] {
      Merge.mergeInto(t, bad, Seq("k"))
    }
  }

  test("merge lands as a new versioned snapshot; the pre-image stays readable") {
    val dir = java.nio.file.Files.createTempDirectory("merge_versions").toString
    Sinks.writeVersioned(t, dir)
    Sinks.writeVersioned(
      Merge.mergeInto(Sinks.readVersioned(spark, dir), s, Seq("k")), dir)
    assert(Sinks.readVersioned(spark, dir).as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (2L, 22L), (3L, 30L), (4L, 44L)))
    assert(Sinks.readVersioned(spark, dir, Some(0L))
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }
}
