package graft.tools

/** Round-6: interleaved conf A/B over the bench slices (flagship at 80k +
  * q_pipeline_clusters) inside one session.
  * Usage: runMain graft.tools.SliceAb <cores> <pairs> <key=valA|valB> */
object SliceAb {
  def main(args: Array[String]): Unit = {
    val cores = args(0)
    val pairs = args(1).toInt
    val Array(key, vals) = args(2).split("=", 2)
    val Array(va, vb) = vals.split("\\|", 2)
    val spark = graft.Bench.makeSession(cores)
    graft.Bench.pipelineSlice(spark, 500)
    spark.catalog.clearCache()
    def setArm(v: String): Unit =
      if (v == "unset") spark.conf.unset(key) else spark.conf.set(key, v)
    def flag(): Double = graft.Bench.pipelineSlice(spark, 80000).dps
    def q(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_pipeline_clusters")(spark, "/root/testdata/sf0.1").count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    for (p <- 1 to pairs) {
      setArm(va); val fa = flag(); val qa = q()
      setArm(vb); val fb = flag(); val qb = q()
      println(f"[sliceab] pair $p A($va): flagship=$fa%.0f dps q_pipe=$qa%.2f s | " +
        f"B($vb): flagship=$fb%.0f dps q_pipe=$qb%.2f s")
    }
    spark.conf.unset(key)
    spark.stop()
  }
}
