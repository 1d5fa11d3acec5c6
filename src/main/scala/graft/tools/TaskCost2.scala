package graft.tools

import org.apache.spark.sql.functions._

/** Round-6: bisect the fixed per-task cost of tiny aggregation stages.
  * Usage: runMain graft.tools.TaskCost2 <cores> */
object TaskCost2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.makeSession(if (args.nonEmpty) args(0) else "32")
    val listener = new JobProfile.L
    spark.sparkContext.addSparkListener(listener)

    def timed(name: String)(body: => Long): Unit = {
      listener.jobs.clear()
      val t0 = System.nanoTime()
      val n = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val stages = listener.jobs.values.flatMap(_.stages.values)
      val core = stages.map(_._2).sum / 1e3
      val tasks = stages.map(_._3).sum
      println(f"[tc2] $name%-46s wall=$w%5.2f s core=$core%6.2f s tasks=$tasks%4d " +
        f"(${core * 1000 / math.max(tasks, 1)}%5.0f ms/task) rows=$n")
    }
    val df = spark.range(64000).select(col("id"), (col("id") % 1000).as("k"),
      xxhash64(col("id")).as("v")).persist()
    df.count()
    df.groupBy("k").agg(sum("v")).count() // warm
    timed("groupBy.sum 32 parts")(df.groupBy("k").agg(sum("v")).count())
    timed("groupBy.count 32 parts")(df.groupBy("k").agg(count(lit(1))).count())
    timed("distinct k 32 parts")(df.select("k").distinct().count())
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    timed("groupBy.sum 4 parts")(df.groupBy("k").agg(sum("v")).count())
    timed("groupBy.sum 4 parts rep2")(df.groupBy("k").agg(sum("v")).count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("groupBy.sum 32 parts AQE off")(df.groupBy("k").agg(sum("v")).count())
    timed("groupBy.sum 32 parts AQE off rep2")(df.groupBy("k").agg(sum("v")).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // pure map stage, no shuffle
    timed("map-only filter count")(df.filter(col("v") =!= 0).count())
    // shuffle write only: repartition + count
    timed("repartition(32) count")(df.repartition(32).count())
    val one = df.coalesce(1).persist(); one.count()
    timed("1-part groupBy (1 map task)")(one.groupBy("k").agg(sum("v")).count())
    spark.stop()
  }
}
