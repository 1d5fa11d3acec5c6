package graft.tools

/** Print `.explain("formatted")` for named SparkEntry queries (plan-shape
  * iteration aid). Usage: runMain graft.tools.PlanDump <sfDir> <query...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1)
    val spark = graft.Bench.makeSession("4")
    names.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
