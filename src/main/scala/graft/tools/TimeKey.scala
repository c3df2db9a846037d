package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm repeated timing of arbitrary registry keys (diagnostic):
  * `runMain graft.tools.TimeKey <sfDir> <key> [key ...]` — 3 runs each.
  * `_derive_*` names time the durable-table materializers instead; a
  * derivation runs ONCE per JVM ([[graft.ops.DurableTable]]), so run 1
  * is the honest derive cost and runs 2-3 are read-through — an A/B of
  * a derive regression interleaves whole TimeKey invocations.
  */
object TimeKey {
  private val derives: Map[String, (SparkSession, String) => Long] = Map(
    "_derive_copurchase" ->
      ((s, d) => graft.queries.GraphOps.materializeEdges(s, d)),
    "_derive_oriented_edges" ->
      ((s, d) => graft.queries.GraphOps.materializeOriented(s, d)),
    "_derive_dedup_clusters" ->
      ((s, d) => graft.queries.LlmOps.materializeClusters(s, d)),
    "_derive_match_pairs" ->
      ((s, d) => graft.queries.LlmOps.materializeMatchPairs(s, d)),
    "_derive_ann_index" ->
      ((s, d) => graft.queries.LlmOps.materializeAnnIndex(s, d)),
    "_derive_partsupp" ->
      ((s, d) => graft.queries.SqlSurface.materializePartsupp(s, d)))

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    args.drop(1).foreach { k =>
      val run: () => Unit =
        if (k.startsWith("_derive_")) {
          val fn = derives.getOrElse(k, throw new IllegalArgumentException(
            s"unknown derive '$k' — valid: ${derives.keys.toSeq.sorted.mkString(", ")}"))
          () => { fn(spark, d): Unit }
        } else () => { graft.SparkEntry.queries(k)(spark, d).count(): Unit }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$k%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
