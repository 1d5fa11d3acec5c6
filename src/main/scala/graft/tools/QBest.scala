package graft.tools

/** Round-6 iteration aid: warm + best-of-N wall time per named query (the
  * bench's per-query min methodology, without the slices).
  * Usage: runMain graft.tools.QBest <sfDir> <cores> <reps> <query...> */
object QBest {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val reps = args(2).toInt
    val names = args.drop(3)
    val spark = graft.Bench.makeSession(cores)
    // session warmup matching Bench.main: a tiny pipeline run
    graft.Bench.pipelineSlice(spark, 500)
    spark.catalog.clearCache()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (s, n)
      }
      val min = ts.map(_._1).min
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      println(f"[qbest] $name%-26s min=$min%6.2f med=$med%6.2f " +
        ts.map(t => f"${t._1}%.2f").mkString("[", " ", "]") + s" rows=${ts.head._2}")
    }
    spark.stop()
  }
}
