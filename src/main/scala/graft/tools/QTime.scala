package graft.tools

/** Local iteration aid: time named SparkEntry queries on a sf dir.
  * Usage: runMain graft.tools.QTime <sfDir> <cores> <query...> */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val names = args.drop(2)
    val spark = graft.Bench.makeSession(cores)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qtime] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
