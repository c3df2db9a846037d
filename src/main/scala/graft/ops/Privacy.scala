package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-handling operators for training-data curation: deterministic
  * pseudonymization (keyed hash token), partial masking (structure kept,
  * identifying digits starred), and generalization (numeric binning) —
  * the standard de-identification triple applied before a corpus leaves
  * its trust boundary.
  *
  * Everything is a native codegen'd expression (sha2 / regexp_replace /
  * floor); no UDF, no driver-side state, embarrassingly parallel at any
  * scale.
  */
object Privacy {

  /** sha-256 pseudonym of a value — stable join key that survives
    * de-identification (same input → same token across tables/runs).
    */
  def pseudonym(c: Column): Column = sha2(c.cast("string"), 256)

  /** Mask every digit except the trailing `keep` characters: the
    * "…******123" rendering used for account/phone-style fields.
    * Values no longer than `keep` pass through unchanged (there is
    * nothing before the kept suffix to mask).
    */
  def maskDigitsKeepLast(c: Column, keep: Int): Column = {
    require(keep >= 1, s"must keep at least one trailing character, got $keep")
    concat(
      regexp_replace(c.substr(lit(1), length(c) - keep), "[0-9]", "*"),
      c.substr(length(c) - (keep - 1), lit(keep)))
  }

  /** Generalize a numeric column into fixed-width bands (floor(x/width)). */
  def band(c: Column, width: Double): Column =
    floor(c / width).cast("long")

  /** De-identified customer profile: keyed pseudonym, masked display
    * name, banded balance.
    */
  def maskProfile(df: DataFrame, keyCol: String, nameCol: String,
                  balCol: String, balWidth: Double = 500.0): DataFrame =
    df.select(
      col(keyCol),
      pseudonym(col(nameCol)).as("name_token"),
      maskDigitsKeepLast(col(nameCol), 3).as("name_masked"),
      band(col(balCol), balWidth).as("bal_band"))
}
