package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.SparkEntry
import graft.core.Session

/** Per-JOB wall breakdown for registry queries (dev tool, guide §1):
  * one warm-up run, then a timed run with a listener recording every
  * Spark job's wall time, stage count and task count — the view that
  * tells an iterative query (CC rounds, k-means iters) apart from a
  * data-bound one where the Spark UI is disabled.
  *
  * Usage: runMain graft.tools.DiagJobs <sfDir> <query>[,<query>...]
  */
object DiagJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // ADVICE r20: args.lift, not args(1) — a missing query list should
    // print usage, not throw ArrayIndexOutOfBoundsException
    val names = args.lift(1) match {
      case Some(qs) => qs.split(",").toSeq
      case None =>
        System.err.println(
          "usage: runMain graft.tools.DiagJobs <sfDir> <query>[,<query>...]")
        sys.exit(2)
    }
    val spark = Session.local()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, var desc: String = "",
        var t0: Long = 0L, var t1: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    // ADVICE r20: attribute stages to jobs via the jobStart stage list
    // (stageId -> jobId), not "newest unfinished job" — AQE and
    // concurrent actions overlap jobs, and the old heuristic miscounted
    // tasks whenever they did.
    val stageJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = jobs.getOrElseUpdate(e.jobId, Job(e.jobId))
          j.t0 = e.time
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          j.stages = e.stageInfos.size
          e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageJob.get(e.stageInfo.stageId)
            .flatMap(jobs.get)
            .foreach(_.tasks += e.stageInfo.numTasks)
        }
    }

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      val warm = once(n) // JIT + codegen cache
      jobs.clear()
      stageJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val sec = once(n)
      spark.sparkContext.removeSparkListener(listener)
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(500)
      println(f"[diagjobs] ===== $n warm=$warm%.2f timed=$sec%.2f s =====")
      val snap = jobs.synchronized(jobs.values.toSeq)
      val total = snap.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      snap.foreach { j =>
        val wall = math.max(0L, j.t1 - j.t0) / 1e3
        println(f"[diagjobs] job=${j.id}%4d wall=$wall%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%5d ${j.desc.take(80)}")
      }
      println(f"[diagjobs] $n: ${snap.size} jobs, sum-of-job-walls=$total%.2f s (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
