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
      // zstd shuffle compression: measured A/B at 240k pages, 4x1-core
      // executors (round 5) — lz4 wrote 2.55 GB of shuffle with 42.8 s of
      // write time and 334 CPU-s on the dominant job; zstd wrote 1.77 GB,
      // 4.5 s, 264 CPU-s, taking per-core inflation vs the 1-executor leg
      // from 1.36x to 1.01x. Byte volume is the scaling bottleneck when
      // executors share storage (true here and on real multi-executor
      // nodes); the 1-exec leg pays ~6% compression CPU for it.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.file.buffer", "1m")
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
    graft.Bench.memProbeMs(); graft.Bench.memProbeMs()

    (1 to reps).foreach { _ =>
      listener.jobs.clear()
      // same fixed-work calibration probes as graft.Bench: ALU probe for
      // CPU-scheduler drag, memory probe for DRAM-bandwidth contention
      // (the failure mode the ALU probe is blind to — see memProbeMs).
      // Driver-side, but the executors share this host: common-mode.
      val probe = graft.Bench.loadProbeMs()
      val mem = graft.Bench.memProbeMs()
      val t0 = System.nanoTime()
      val (dps, n) = graft.Bench.pipelineDocsPerSec(spark, nPages)
      val wall = (System.nanoTime() - t0) / 1e9
      val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1 // minus driver
      println(f"[scalec] cores=$cores execs=$execs pages=$nPages rows=$n dps=$dps%.1f probeMs=$probe%.1f memMs=$mem%.1f")
      if (profile) {
        Thread.sleep(500)
        val js = listener.jobs.toSeq
        val jobWall = js.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
        println(f"[scalec] jobs=${js.size} jobWallSum=$jobWall%.1f wall=$wall%.1f betweenJobs=${wall - jobWall}%.1f")
        js.sortBy { case (_, j) => -(j.end - j.start) }.take(14).foreach { case (id, j) =>
          val w = (j.end - j.start) / 1e3
          val t = j.taskMs / 1e3
          // attribution columns: where 4-executor per-core inflation goes —
          // cpu (executorCpuTime), gc, shuffle fetch-wait, shuffle write
          // time, shuffle bytes read/written (cross-JVM serde + copy cost
          // that a single executor pays in-process)
          println(f"[scalec] job $id%3d wall=$w%7.2f s taskSum=$t%8.2f s tasks=${j.tasks}%4d par=${t / math.max(w, 0.001)}%5.2f" +
            f" cpu=${j.cpuNs / 1e9}%7.2f gc=${j.gcMs / 1e3}%5.2f fw=${j.fetchWaitMs / 1e3}%5.2f sw=${j.shuffleWriteNs / 1e9}%5.2f srMB=${j.shuffleReadBytes / 1e6}%7.1f swMB=${j.shuffleWriteBytes / 1e6}%7.1f")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
