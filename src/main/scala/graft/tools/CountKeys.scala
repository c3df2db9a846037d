package graft.tools

/** Registry inventory: key/oracle counts and the rows-only set — the
  * first sanity check each round (COVERAGE.md header must match).
  */
object CountKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${q.size} oracles=${o.size}")
    println("no_oracle: " + (q.keySet -- o.keySet).toSeq.sorted.mkString(","))
    println("orphan_oracle: " + (o.keySet -- q.keySet).toSeq.sorted.mkString(","))
  }
}
