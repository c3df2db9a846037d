package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) multi-dimensional clustering.
  *
  * A z-value interleaves the bits of several dimension keys so that
  * range-partitioning + sorting by the single z column co-locates rows
  * that are close in EVERY dimension at once. Written as parquet, each
  * file's min/max footer stats then bound a small rectangle in
  * (dim1, dim2) space — so a selective predicate on EITHER dimension
  * prunes most files, where a plain sort bounds only its leading
  * column. This is the standard lakehouse data-skipping layout
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`), built here from pure Catalyst
  * expressions: the interleave is a fold of shift/mask/or terms that
  * stays inside whole-stage codegen — no UDF.
  *
  * Scale posture: computing z is map-side; the layout write is ONE
  * range shuffle (sampled range boundaries) + per-partition sort,
  * identical in shape to [[Sinks]]' range-sorted write. Nothing here
  * depends on data volume beyond that single shuffle.
  */
object ZOrder {

  /** Interleaved z-value of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Pure shift/mask/or — codegen-friendly, no UDF.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as ANSI SQL text (for oracles / SQL surface). */
  def interleaveSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Z-ordered parquet layout: one range shuffle on the z-value (sampled
    * boundaries → balanced files), per-partition sort so every file
    * covers one contiguous z range, z column dropped before writing.
    */
  def write(df: DataFrame, x: Column, y: Column, path: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", interleave(x, y, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
