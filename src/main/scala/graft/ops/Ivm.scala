package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for join views — the delta algebra
  * that keeps a materialized join current WITHOUT re-scanning the base
  * tables.
  *
  * For an inner-join view V = A ⋈ B, inserting ΔA into A and ΔB into B
  * changes the view by exactly
  *
  *   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * (distributivity of ⋈ over ∪ for bag semantics; the three terms are
  * disjoint because each row of a join result is tagged by which side
  * of the base/delta split its inputs came from). The new view is
  * V ∪ ΔV with no rescan of the old V and — the 100 TB point — every
  * join in ΔV has at least one DELTA input, so the work scales with
  * the size of the change, not the size of the base tables. At scale
  * the base sides of the delta joins are served by their join-key
  * bucketed layout (no re-shuffle of A or B), and ΔV appends to the
  * stored view.
  *
  * Scope: insert-only deltas (append streams, the common warehouse
  * case). Deletes generalize by the same algebra over a negative
  * multiplicity column; updates are delete+insert.
  */
object Ivm {

  /** The view increment ΔV for inner-join view A ⋈ B on `keys` when
    * `aDelta` is inserted into `aBase` and `bDelta` into `bBase`.
    * Either delta may be empty (one-sided maintenance). Inputs must
    * share ONLY the join key names (standard join-output contract).
    */
  def joinDelta(aBase: DataFrame, aDelta: DataFrame,
                bBase: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame =
    aDelta.join(bBase, keys)
      .unionByName(aBase.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** The maintained view after applying both deltas: old view ∪ ΔV.
    * `view` must be exactly aBase ⋈ bBase (the caller's materialized
    * state); the law maintained == (A∪ΔA) ⋈ (B∪ΔB) is property-pinned
    * in BatchOpsSpec.
    */
  def maintain(view: DataFrame,
               aBase: DataFrame, aDelta: DataFrame,
               bBase: DataFrame, bDelta: DataFrame,
               keys: Seq[String]): DataFrame =
    view.unionByName(joinDelta(aBase, aDelta, bBase, bDelta, keys))
}
