package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm repeated timing of arbitrary registry keys (diagnostic):
  * `runMain graft.tools.TimeKey <sfDir> <key> [key ...]` — 3 runs each.
  */
object TimeKey {
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
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(k)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$k%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
