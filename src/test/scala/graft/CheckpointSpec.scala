package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed restart = the operational core of incremental ingestion:
  * a file-source stream with a checkpoint processes each input file
  * exactly once ACROSS RESTARTS — a stopped job resumed with the same
  * checkpoint picks up only files it has not yet committed, so the
  * downstream table accretes without dupes and without a manual ledger
  * of what was already loaded.
  */
class CheckpointSpec extends AnyFunSuite {
  import TestSpark._

  test("AvailableNow + checkpoint resumes after restart without reprocessing") {
    import spark.implicits._
    val in = Files.createTempDirectory("cp_in").toString
    val cp = Files.createTempDirectory("cp_state").toString
    val out = Files.createTempDirectory("cp_out").toString

    def appendInput(ids: Range): Unit =
      ids.map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("id LONG, user STRING").parquet(in)
      val q = stream.writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
    }

    appendInput(0 until 100)
    runOnce()
    assert(spark.read.parquet(out).count() == 100)

    // second run with NO new input: committed files must not re-emit
    runOnce()
    assert(spark.read.parquet(out).count() == 100)

    // restart after new files arrive: only the delta is processed
    appendInput(100 until 150)
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 150)
    assert(rows.select(col("id")).distinct().count() == 150,
      "a reprocessed file would duplicate ids")
  }

  test("maxFilesPerTrigger bounds each micro-batch under AvailableNow") {
    import spark.implicits._
    val in = Files.createTempDirectory("rate_in").toString
    val cp = Files.createTempDirectory("rate_cp").toString
    // three separate input files
    (0 until 3).foreach { f =>
      Seq((f.toLong, "x")).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(in)
    }
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema("id LONG, v STRING").parquet(in)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet(): Unit
      }
      .start()
    q.awaitTermination()
    // the backlog drains in file-sized micro-batches, not one giant batch —
    // the knob that keeps a restarted stream from OOMing on its backlog
    assert(batches.get() == 3, s"expected 3 rate-limited batches, got ${batches.get()}")
  }
}
