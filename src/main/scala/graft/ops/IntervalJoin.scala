package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join WITHOUT an equi key.
  *
  * `[aStart, aEnd) ∩ [bStart, bEnd) ≠ ∅` has no natural join key, and a
  * raw theta join is a cartesian product — the scale-killer. The grid
  * trick restores an equi key: explode every interval into the
  * fixed-width grid cells it touches, equi-join on the cell id, and
  * keep each qualifying pair exactly once WITHOUT a dedup shuffle by
  * accepting it only in the cell containing `max(aStart, bStart)` —
  * every overlapping pair has exactly one such cell, so the dedup is a
  * free map-side predicate, not a `dropDuplicates` exchange.
  *
  * Scale properties: shuffle size is rows × cells-per-interval (choose
  * `cellWidth` near the typical interval length to keep that factor
  * 1–3); per-cell work is |a-in-cell| × |b-in-cell|, bounded by the
  * grid instead of |a| × |b|. Long stragglers fatten one cell — split
  * them upstream (the standard remedy) or widen the grid. Both interval
  * ends are integer columns (days, epoch-seconds, …); `end` is
  * EXCLUSIVE.
  */
object IntervalJoin {

  /** Contract: the two inputs must have DISJOINT column names (the
    * output carries both sides' columns and the overlap predicate
    * resolves `aStart`/`bEnd`/… by bare name post-join — a shared name
    * would be an ambiguous reference), and neither side may already
    * carry the internal `_cell` binning column. Both are `require`d up
    * front so a violation fails with the contract, not a resolver
    * error deep in the plan; callers with overlapping schemas rename
    * (`withColumnRenamed`) or alias-project first, exactly as
    * [[graft.ops.Merge.mergeInto]] does internally.
    */
  def overlapJoin(a: DataFrame, aStart: String, aEnd: String,
                  b: DataFrame, bStart: String, bEnd: String,
                  cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"overlapJoin inputs must have disjoint column names; shared: " +
        shared.toSeq.sorted.mkString(", "))
    require(!a.columns.contains("_cell") && !b.columns.contains("_cell"),
      "overlapJoin reserves the column name _cell for its grid binning")
    // Empty/inverted intervals ([5,5), [7,3)) overlap nothing by
    // definition, but the overlap predicate alone would still admit
    // them (s1 < e2 && s2 < e1 only means non-empty intersection when
    // BOTH inputs are non-empty) and `sequence` would even generate
    // descending cell runs — drop them map-side before binning.
    def cells(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) < col(e)).withColumn("_cell",
        explode(sequence(expr(s"$s DIV $cellWidth"),
          expr(s"($e - 1) DIV $cellWidth"))))
    cells(a, aStart, aEnd).join(cells(b, bStart, bEnd), "_cell")
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_cell") ===
        expr(s"greatest($aStart, $bStart) DIV $cellWidth"))
      .drop("_cell")
  }
}
