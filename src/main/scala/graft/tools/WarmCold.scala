package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm timing for selected queries: the cold run pays analysis +
  * optimization + whole-stage codegen + scan setup; the warm run re-plans
  * the same tree with codegen/JIT caches hot. A large cold−warm gap means
  * the bench number is dominated by per-query fixed cost, not execution —
  * the part that vanishes at 100 TB where execution dwarfs planning.
  * Usage: runMain graft.tools.WarmCold [sfDir] [key ...]
  */
object WarmCold {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    graft.queries.SqlSurface.registerViews(spark, sfDir)
    keys.foreach { k =>
      val fn = graft.SparkEntry.queries(k)
      def once(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm1 = once(); val warm2 = once()
      println(f"$k%-22s cold=$cold%6.2f warm=${math.min(warm1, warm2)}%6.2f")
    }
    spark.stop()
  }
}
