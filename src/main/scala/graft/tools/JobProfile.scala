package graft.tools

import graft.config.GraftConfig
import graft.corpus.PageCorpus
import graft.pipeline.DedupPipeline
import org.apache.spark.scheduler._
import scala.collection.mutable

/**
 * Job-level decomposition of the flagship pipeline: per Spark job, wall time
 * vs summed task time — anything with wall >> taskTime/cores is
 * driver/scheduler latency, i.e. the serial fraction that kills scaling.
 * Usage: runMain graft.tools.JobProfile [nPages] [cores]
 */
object JobProfile {

  final class L extends SparkListener {
    case class J(start: Long, var end: Long = 0, var taskMs: Long = 0,
        var tasks: Int = 0, var desc: String = "",
        var cpuNs: Long = 0, var gcMs: Long = 0, var fetchWaitMs: Long = 0,
        var shuffleWriteNs: Long = 0, var shuffleReadBytes: Long = 0,
        var shuffleWriteBytes: Long = 0,
        stages: mutable.LinkedHashMap[Int, (String, Long, Int)] =
          mutable.LinkedHashMap())
    val jobs = mutable.LinkedHashMap[Int, J]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    private val stageNames = mutable.HashMap[Int, String]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = J(e.time)
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("")
      jobs(e.jobId) = j
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      e.stageInfos.foreach(si => stageNames(si.stageId) = si.name)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.end = e.time)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.taskMs += e.taskInfo.duration
        j.tasks += 1
        val (n0, ms0, t0) = j.stages.getOrElse(e.stageId,
          (stageNames.getOrElse(e.stageId, ""), 0L, 0))
        j.stages(e.stageId) = (n0, ms0 + e.taskInfo.duration, t0 + 1)
        val m = e.taskMetrics
        if (m != null) {
          j.cpuNs += m.executorCpuTime
          j.gcMs += m.jvmGCTime
          j.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
          j.shuffleWriteNs += m.shuffleWriteMetrics.writeTime
          j.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
          j.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 80000
    val cores = if (args.length > 1) args(1) else "8"
    val spark = graft.Bench.makeSession(cores)
    val listener = new L
    spark.sparkContext.addSparkListener(listener)

    // args(2) = "pairs" profiles the pairs-only slice instead of the
    // flagship pipeline (the <=2x-of-reference gate's work shape)
    val slice: Int => (Double, Long) =
      if (args.length > 2 && args(2) == "pairs")
        n => graft.Bench.pairsDocsPerSec(spark, n)
      else n => graft.Bench.pipelineDocsPerSec(spark, n)

    slice(2000) // warmup
    listener.jobs.clear()
    val t0 = System.nanoTime()
    val (dps, _) = slice(nPages)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)

    val js = listener.jobs.toSeq
    val jobWall = js.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
    println(f"[jobprofile] pages=$nPages cores=$cores wall=$wall%.1f s dps=$dps%.0f " +
      f"jobs=${js.size} jobWallSum=$jobWall%.1f s betweenJobs=${wall - jobWall}%.1f s")
    js.sortBy { case (_, j) => -(j.end - j.start) }.take(20).foreach { case (id, j) =>
      val w = (j.end - j.start) / 1e3
      val t = j.taskMs / 1e3
      println(f"[jobprofile] job $id%3d wall=$w%7.2f s taskSum=$t%8.2f s " +
        f"tasks=${j.tasks}%4d par=${t / math.max(w, 0.001)}%5.2f  ${j.desc.take(70)}")
      j.stages.toSeq.sortBy(-_._2._2).take(8).foreach { case (sid, (nm, ms, nt)) =>
        if (ms > 500)
          println(f"[jobprofile]     stage $sid%4d taskSum=${ms / 1e3}%7.2f s tasks=$nt%4d  ${nm.take(70)}")
      }
    }
    spark.stop()
  }
}
