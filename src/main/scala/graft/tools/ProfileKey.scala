package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-key job/stage profile (diagnostic, guide §1):
  * `runMain graft.tools.ProfileKey <sfDir> <key> [key ...]`
  *
  * Runs each key twice (run 1 = warm-up absorbing derivations/JIT) and,
  * for the SECOND run, prints every Spark job with its wall time, stage
  * count, task count and summed task time — the measurement that says
  * whether a key's seconds go to real work or to job-count overhead
  * (the dominant cost class at bench scale: ~2k-600k-row inputs on
  * local[32], where a single eager materialization job costs more than
  * its compute). Optimization rounds read this before touching a key.
  */
object ProfileKey {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L,
                      var stages: Int = 0, var tasks: Int = 0,
                      var taskTimeMs: Long = 0L)
    case class StageRec(name: String, tasks: Int, taskTimeMs: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageRecs = mutable.ArrayBuffer.empty[StageRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs.synchronized {
            jobs(js.jobId) = JobRec(js.jobId, desc, js.time)
            js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
          }
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(je.jobId).foreach(_.end = je.time)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val tt = Option(sc.stageInfo.taskMetrics)
            .map(_.executorRunTime).getOrElse(0L)
          if (recording || stageToJob.contains(sc.stageInfo.stageId))
            stageRecs += StageRec(sc.stageInfo.name,
              sc.stageInfo.numTasks, tt)
          stageToJob.get(sc.stageInfo.stageId)
            .flatMap(jobs.get).foreach { j =>
              j.stages += 1
              j.tasks += sc.stageInfo.numTasks
              j.taskTimeMs += tt
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }

    args.drop(1).foreach { k =>
      val fn = graft.SparkEntry.queries(k)
      // warm-up run: absorbs one-time derivations and JIT
      val tw0 = System.nanoTime()
      fn(spark, d).count()
      val warm = (System.nanoTime() - tw0) / 1e9
      dropBlocks()
      jobs.synchronized {
        jobs.clear(); stageToJob.clear(); stageRecs.clear()
      }
      recording = true
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(300) // let listener events drain
      val snap = jobs.synchronized { jobs.values.toSeq }
      println(f"== $k: run1=$warm%.2fs run2=$sec%.2fs jobs=${snap.size} " +
        f"stages=${snap.map(_.stages).sum} tasks=${snap.map(_.tasks).sum} " +
        f"taskTime=${snap.map(_.taskTimeMs).sum / 1000.0}%.2fs ==")
      snap.sortBy(j => -(j.end - j.start)).take(15).foreach { j =>
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1000.0}%6.2fs " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
          f"taskTime=${j.taskTimeMs / 1000.0}%6.2fs  ${j.desc.take(110)}")
      }
      val byDesc = snap.groupBy(_.desc.take(40))
      println("  -- jobs by description --")
      byDesc.toSeq.sortBy(-_._2.map(j => j.end - j.start).sum).take(12)
        .foreach { case (desc, js) =>
          println(f"  ${js.size}%3d jobs ${js.map(j => j.end - j.start).sum / 1000.0}%7.2fs " +
            f"taskTime=${js.map(_.taskTimeMs).sum / 1000.0}%7.2fs  $desc")
        }
      val byName = jobs.synchronized { stageRecs.toSeq }
        .groupBy(_.name.takeWhile(_ != '(').trim)
      println("  -- stages by callsite (top 12 by task time) --")
      byName.toSeq.sortBy(-_._2.map(_.taskTimeMs).sum).take(12)
        .foreach { case (n, rs) =>
          println(f"  ${rs.size}%3d stages ${rs.map(_.tasks).sum}%5d tasks " +
            f"${rs.map(_.taskTimeMs).sum / 1000.0}%7.2fs  $n")
        }
      dropBlocks()
    }
    spark.stop()
  }
}
