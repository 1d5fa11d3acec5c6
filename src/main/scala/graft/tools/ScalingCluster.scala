package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Scaling-efficiency measurement under REAL executor isolation (north rule:
 * throughput scaling efficiency >= 0.8 from N to 4N executors, launched via
 * spark-submit on a multi-executor cluster).
 *
 * This main is spark-submit'ted against a standalone master
 * (scripts/scaling_cluster.sh): the master/worker daemons launch separate
 * CoarseGrainedExecutorBackend JVMs — own heaps, own GC, own code caches —
 * and the submit's spark.cores.max picks the executor count (N vs 4N at a
 * fixed --executor-cores / --executor-memory), exactly the shape of a real
 * cluster resize. The measured job is the identical end-to-end dedup
 * pipeline (signatures → 3-stage blocking → verify → connected components →
 * assignment) on the identical deterministic corpus.
 *
 * Prints one parseable line per measured run:
 *   [scalec] cores=<total> execs=<n> pages=<n> dps=<v>
 */
object ScalingCluster {

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 120000
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .appName("graft-scaling-cluster")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate() // master + cores from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.conf.get("spark.cores.max", "?")

    // JIT/codegen warmup at small scale (same as Bench)
    graft.Bench.pipelineDocsPerSec(spark, 2000)
    spark.catalog.clearCache()

    val profile = sys.env.get("GRAFT_SCALE_PROFILE").contains("1")
    val listener = new JobProfile.L
    if (profile) spark.sparkContext.addSparkListener(listener)

    graft.Bench.loadProbeMs(); graft.Bench.loadProbeMs() // JIT the probe loop

    (1 to reps).foreach { _ =>
      listener.jobs.clear()
      // same fixed-work single-thread calibration probe as graft.Bench:
      // its wall time quantifies ambient co-tenant drag in the same line
      // the throughput is reported on (driver-side, but the executors
      // share this host, so the drag is common-mode)
      val probe = graft.Bench.loadProbeMs()
      val t0 = System.nanoTime()
      val (dps, n) = graft.Bench.pipelineDocsPerSec(spark, nPages)
      val wall = (System.nanoTime() - t0) / 1e9
      val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1 // minus driver
      println(f"[scalec] cores=$cores execs=$execs pages=$nPages rows=$n dps=$dps%.1f probeMs=$probe%.1f")
      if (profile) {
        Thread.sleep(500)
        val js = listener.jobs.toSeq
        val jobWall = js.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
        println(f"[scalec] jobs=${js.size} jobWallSum=$jobWall%.1f wall=$wall%.1f betweenJobs=${wall - jobWall}%.1f")
        js.sortBy { case (_, j) => -(j.end - j.start) }.take(14).foreach { case (id, j) =>
          val w = (j.end - j.start) / 1e3
          val t = j.taskMs / 1e3
          println(f"[scalec] job $id%3d wall=$w%7.2f s taskSum=$t%8.2f s tasks=${j.tasks}%4d par=${t / math.max(w, 0.001)}%5.2f")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
