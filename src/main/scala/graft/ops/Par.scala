package graft.ops

import org.apache.spark.sql.DataFrame

/** Map-side parallelism guard for compute-heavy stages.
  *
  * Map parallelism is file-layout-bound: a Parquet scan yields one task
  * per row-group split, so a narrow input (few files, one row group each)
  * runs every downstream narrow transform on a handful of cores no matter
  * how big the cluster is. That is invisible for cheap projections but
  * disastrous when the stage ahead does real per-row work — shingling,
  * signature hashing, dot products.
  *
  * [[fanOut]] inserts one round-robin exchange ONLY when the observed scan
  * parallelism is below the session's default parallelism. On production
  * inputs with thousands of splits the gate is false and no shuffle is
  * added; on a narrow input the one-time exchange of the (projected) rows
  * is strictly cheaper than leaving the cores idle through the compute
  * stage. Callers should project to the needed columns first so the
  * exchange moves minimal bytes.
  */
object Par {

  /** Repartition `df` to the session default parallelism iff its scan
    * would yield fewer splits — a no-op on already-wide inputs.
    *
    * The gate reads the optimizer's size estimate (Parquet footer
    * totals, scaled by projection) against `files.maxPartitionBytes`:
    * a source smaller than `target × maxPartitionBytes` cannot produce
    * `target` splits, so it gets one round-robin exchange. This is a
    * pure plan-side probe — no `.rdd` conversion, no job — so the gate
    * costs nothing on the hot planning path (it previously forced an
    * RDD plan conversion per call). Inputs whose size the optimizer
    * cannot estimate (e.g. checkpointed RDD scans) report huge defaults
    * and correctly skip the exchange — they are already post-shuffle
    * wide.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val bytesPerSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(bytesPerSplit) * target) df.repartition(target) else df
  }
}
