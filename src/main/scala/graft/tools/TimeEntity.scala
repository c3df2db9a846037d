package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level timing for the entity-resolution pipeline (diagnostic). */
object TimeEntity {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val p = graft.model.Tables.part(spark, d)
    val a = p.select(col("p_brand"), col("p_partkey").as("part_a"),
      col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_partkey").as("part_b"),
      col("p_name").as("name_b"))
    val a2 = a.withColumn("lb",
      explode(sequence(length(col("name_a")) - 2, length(col("name_a")) + 2)))
    val b2 = b.withColumn("lb", length(col("name_b")))
    val blocked = a2.join(b2, Seq("p_brand", "lb"))
      .filter(col("part_a") < col("part_b"))
    time("blocked pairs")(println(s"  n=${blocked.count()}"))
    val pairs = blocked
      .filter(levenshtein(col("name_a"), col("name_b"), 2) >= 0)
      .select(col("part_a"), col("part_b"))
    time("lev verify")(println(s"  n=${pairs.count()}"))
    val cached = pairs.localCheckpoint(true)
    time("cc over cached")(
      println(s"  n=${Dedup.connectedComponentsStar(cached, "part_a", "part_b").count()}"))
    time("full key")(
      println(s"  n=${graft.SparkEntry.queries("q_entity_clusters")(spark, d).count()}"))
    spark.stop()
  }
}
