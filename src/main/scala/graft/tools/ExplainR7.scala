package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainR7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    args.foreach { k =>
      val p = graft.SparkEntry.queries(k)(spark, d)
        .queryExecution.executedPlan.toString
      val cart = p.contains("CartesianProduct")
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val ex = "Exchange".r.findAllIn(p).size
      println(s"$k: cartesian=$cart bnl=$bnl bhj=$bhj smj=$smj exchanges=$ex wholestage=${"WholeStageCodegen".r.findAllIn(p).size}")
    }
    spark.stop()
  }
}
