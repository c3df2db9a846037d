package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run the watermarked as-of replay once and dump each
  * micro-batch's duration breakdown from the streaming progress log.
  * `runMain graft.tools.ReplayProf [sfDir]`
  */
object ReplayProf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // split(_, 2): conf VALUES may themselves contain '=' ; skip (and
    // report) malformed entries instead of aborting the profiler
    sys.env.get("GRAFT_PROF_CONF").foreach { kvs =>
      kvs.split(";").filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => println(s"ReplayProf: skipping malformed conf '$kv'")
        }
      }
    }
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    }
    spark.streams.addListener(listener)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_stream_asof_wm")(spark, d).count()
      println(f"run$i total=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
