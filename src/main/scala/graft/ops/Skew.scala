package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (fact) side into `salts`
  * sub-keys and replicate the dimension side once per salt, so a hot key
  * spreads over `salts` shuffle partitions instead of one straggler task.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit operator is for the cases AQE can't re-plan (e.g. aggregation
  * hotspots upstream, or when the salt must ride a precomputed layout).
  * The salt is derived deterministically from fact columns so results are
  * reproducible.
  */
object Skew {

  /** Inner join `fact ⋈ dim` on `key`, salted into `salts` sub-keys.
    * `saltSource` must be deterministic per fact row (e.g. a row id).
    * Result equals the unsalted join, row-for-row.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(saltSource, lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
