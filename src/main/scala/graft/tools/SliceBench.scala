package graft.tools

/** Round-6 iteration aid: the bench's slice methodology (warmup + N reps of
  * flagship/pairs/full3 at 16x docs) plus q_pipeline_clusters, without the
  * full per-query sweep. Usage: runMain graft.tools.SliceBench <cores> [reps] */
object SliceBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Bench.makeSession(cores)
    val clock = new graft.Bench.TaskClock
    spark.sparkContext.addSparkListener(clock)
    graft.Bench.pipelineSlice(spark, 500) // warmup
    spark.catalog.clearCache()
    val sfDir = "/root/testdata/sf0.1"
    val nPages = 80000

    def q(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    for (r <- 1 to reps) {
      val fs = graft.Bench.pipelineSlice(spark, nPages, Some(clock))
      val ps = graft.Bench.pairsSlice(spark, nPages, clock = Some(clock))
      val f3 = graft.Bench.pairsSlice(spark, nPages, allStages = true,
        clock = Some(clock))
      println(f"[slice] rep $r flagship=${fs.dps}%.0f dps (core ${fs.coreSec}%.1f cpu ${fs.cpuSec}%.1f) " +
        f"pairs=${ps.dps}%.0f (core ${ps.coreSec}%.1f) full3=${f3.dps}%.0f (core ${f3.coreSec}%.1f)")
      println(f"[slice] rep $r q_pipeline_clusters=${q("q_pipeline_clusters")}%.2f s")
    }
    spark.stop()
  }
}
