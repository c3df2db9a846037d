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

  /** Repartition `df` to the session default parallelism iff it currently
    * has fewer partitions — a no-op on already-wide inputs.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
