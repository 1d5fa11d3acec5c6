package graft.tools

/** Per-job decomposition of one SparkEntry query (JobProfile's listener over
  * QTime's loop): for each named query — warm run, then a measured run with
  * per-job wall/taskSum/parallelism and the between-jobs (driver-serial)
  * remainder. Round-6 measurement aid (guide §1: measure first).
  * Usage: runMain graft.tools.QProfile <sfDir> <cores> <query...> */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val names = args.drop(2)
    val spark = graft.Bench.makeSession(cores)
    val listener = new JobProfile.L
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (JIT + corpus/aux materialization)
      spark.catalog.clearCache()
      listener.jobs.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val js = listener.jobs.toSeq
      val jobWall = js.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
      println(f"[qprofile] $name rows=$n wall=$wall%.2f s jobs=${js.size} " +
        f"jobWallSum=$jobWall%.2f s betweenJobs=${wall - jobWall}%.2f s")
      js.sortBy { case (id, _) => id }.foreach { case (id, j) =>
        val w = (j.end - j.start) / 1e3
        val t = j.taskMs / 1e3
        println(f"[qprofile]   job $id%3d wall=$w%6.2f s taskSum=$t%7.2f s " +
          f"tasks=${j.tasks}%4d par=${t / math.max(w, 0.001)}%5.2f  ${j.desc.take(80)}")
        j.stages.foreach { case (sid, (sname, sms, stasks)) =>
          if (sms > 50)
            println(f"[qprofile]     stage $sid%4d taskSum=${sms / 1e3}%7.2f s " +
              f"tasks=$stasks%4d  ${sname.take(90)}")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
