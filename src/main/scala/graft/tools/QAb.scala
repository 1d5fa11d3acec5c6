package graft.tools

/** Round-6 iteration aid: interleaved conf A/B per query inside ONE session
  * (cancels JIT/ambient drift — the round-5 verdict's missing experiment
  * shape). Usage:
  *   runMain graft.tools.QAb <sfDir> <cores> <pairs> <key=valA|valB> <query...>
  * valA/valB of "unset" mean the conf is removed for that arm. */
object QAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val pairs = args(2).toInt
    val Array(key, vals) = args(3).split("=", 2)
    val Array(va, vb) = vals.split("\\|", 2)
    val names = args.drop(4)
    val spark = graft.Bench.makeSession(cores)
    graft.Bench.pipelineSlice(spark, 500)
    spark.catalog.clearCache()
    def setArm(v: String): Unit =
      if (v == "unset") spark.conf.unset(key) else spark.conf.set(key, v)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def one(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      // un-timed warm rep so JIT of this query's plans lands outside the A/B
      one()
      val (as, bs) = (1 to pairs).map { _ =>
        setArm(va); val a = one()
        setArm(vb); val b = one()
        (a, b)
      }.unzip
      spark.conf.unset(key)
      println(f"[qab] $name%-26s A($key=$va) min=${as.min}%6.2f med=${as.sorted.apply(as.size / 2)}%6.2f | " +
        f"B($key=$vb) min=${bs.min}%6.2f med=${bs.sorted.apply(bs.size / 2)}%6.2f " +
        "A=" + as.map(t => f"$t%.2f").mkString("[", " ", "]") +
        " B=" + bs.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
