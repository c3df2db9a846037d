package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC index DELETE path — the lifecycle piece every production
  * corpus needs (TTL expiry, takedown/GDPR erasure) that build / read /
  * append alone don't give:
  *
  *   - DELETES are TOMBSTONES: removing a vector never touches the
  *     index geometry (coarse centroids and residual codebooks are
  *     frozen coordinates, not corpus rows — a deleted vector that
  *     seeded a centroid leaves the centroid in place), it only hides
  *     the vector's postings rows. While tombstones accumulate, reads
  *     apply one `n_id` anti-join ([[applyTombstones]]) — cost ∝
  *     postings scanned, zero rewrite.
  *   - COMPACTION physically rewrites the postings without the dead
  *     rows as a NEW VERSION of the versioned index table
  *     ([[compactVersioned]]), once the dead fraction justifies the
  *     rewrite ([[shouldCompact]]). Readers of the new version pay no
  *     anti-join; the old version stays readable by number until
  *     vacuum (the [[Sinks.writeVersioned]] time-travel discipline),
  *     which is exactly the audit trail an erasure workflow wants:
  *     "version N+1 no longer contains the ids" is checkable.
  *
  * Law (spec-pinned in LlmOpsSpec): tombstone-read ≡ compacted-read ≡
  * postings-filtered-by-survivors, row for row — and therefore every
  * query over the index after a delete equals the same query over the
  * filtered postings (the committed `q_ann_ivfpq_delete` oracle
  * restates exactly that). Note this is NOT the same index a rebuild
  * over the filtered corpus would produce — a rebuild would retrain
  * the geometry on the survivors; delete deliberately keeps the
  * geometry frozen so the operation is O(postings), not O(corpus
  * retrain).
  */
object AnnIndexLifecycle {

  /** The postings visible after applying a tombstone set — the read
    * form while deletes accumulate: one anti-join on the vector id.
    */
  def applyTombstones(postings: DataFrame, tombstones: DataFrame): DataFrame =
    postings.join(tombstones.select(col("n_id")).distinct(),
      Seq("n_id"), "left_anti")
      .select(col("cell_id"), col("n_id"), col("sub"), col("cid"))

  /** Whether the accumulated tombstones justify a physical rewrite:
    * dead members ≥ `minDeadFraction` of the index — decided from
    * MAINTAINED STATISTICS, never a postings scan (r14, VERDICT r13
    * #8). `cellStats` is the per-cell membership audit table the index
    * already keeps (`q_ivfpq_cell_stats`: `(cell_id, n_members)` —
    * ~cells rows, index-metadata scale), so the live total is one tiny
    * aggregate; `deadMembers` is what the delete registration recorded
    * ([[tombstoneHits]], paid once per tombstone batch, not per
    * decision). Member fractions equal postings-row fractions exactly
    * — every member carries exactly m code rows — so the threshold is
    * unchanged from the row-counting form this replaces.
    */
  def shouldCompact(cellStats: DataFrame, deadMembers: Long,
                    minDeadFraction: Double): Boolean = {
    val total = cellStats.agg(coalesce(sum(col("n_members")), lit(0L)))
      .first().getLong(0)
    total > 0L && deadMembers.toDouble / total >= minDeadFraction
  }

  /** How many INDEXED vectors a tombstone batch actually hits — the
    * delete-registration-time count that keeps [[shouldCompact]]
    * scan-free: a deployment records this once when the tombstones
    * arrive (one semi-join against the member set, amortized over the
    * delete's own write) and accumulates the running `deadMembers`.
    * Tombstones for never-indexed ids are correctly not counted.
    */
  def tombstoneHits(postings: DataFrame, tombstones: DataFrame): Long =
    postings.select(col("n_id")).distinct()
      .join(tombstones.select(col("n_id")).distinct(), Seq("n_id"),
        "left_semi")
      .count()

  /** Physical compaction: land the survivor postings as the NEXT
    * version of the versioned index table at `path` (same partition
    * layout), leaving prior versions readable by number. Returns the
    * new version id. The caller owns resetting its tombstone set —
    * tombstones at or below the compacted version are absorbed.
    */
  def compactVersioned(spark: SparkSession, path: String,
                       postings: DataFrame, tombstones: DataFrame,
                       partitionCols: Seq[String] = Seq("cell_id")): Long = {
    // materialize the survivor set before writing over shared scratch:
    // the input plan may read the same table's current version
    val survivors = applyTombstones(postings, tombstones)
      .localCheckpoint(true)
    Sinks.writeVersioned(survivors, path, partitionCols)
  }
}
