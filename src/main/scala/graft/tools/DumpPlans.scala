package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of registry keys to files (the
  * optimization-round plan-evidence deliverable):
  * `runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <key> [key ...]`
  * writes `<outDir>/<key>_<suffix>.txt` per key.
  *
  * Note: keys whose registry function EXECUTES work during construction
  * (the streaming replays, keys with driver-side scalar reads) pay that
  * execution here; the dumped plan is the final returned DataFrame's.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = args(2)
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(3).foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, d)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"${k}_$suffix.txt").toPath, txt)
        println(s"[plans] wrote ${k}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plans] $k FAILED: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
