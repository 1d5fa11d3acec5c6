package graft.tools

import org.apache.spark.sql.functions._

/** Round-6: isolate the fixed per-task cost of a tiny shuffle stage in the
  * bench session shape (zstd, 1m file buffer, 32 partitions).
  * Usage: runMain graft.tools.TaskCost <cores> */
object TaskCost {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.makeSession(if (args.nonEmpty) args(0) else "32")
    val clock = new graft.Bench.TaskClock
    spark.sparkContext.addSparkListener(clock)
    import spark.implicits._

    def timed(name: String)(body: => Long): Unit = {
      val b = clock.drained()
      val t0 = System.nanoTime()
      val n = body
      val w = (System.nanoTime() - t0) / 1e9
      val a = clock.drained()
      println(f"[taskcost] $name%-44s wall=$w%6.2f s coreSum=${(a._1 - b._1) / 1e3}%7.2f s rows=$n")
    }
    val df64k = spark.range(64000).select(col("id"), (col("id") % 1000).as("k"),
      xxhash64(col("id")).as("v"))
    val df64kC = df64k.persist(); df64kC.count()
    // warm
    df64kC.groupBy("k").agg(sum("v")).count()
    timed("groupBy 64k rows -> 32 parts (rep1)")(df64kC.groupBy("k").agg(sum("v")).count())
    timed("groupBy 64k rows -> 32 parts (rep2)")(df64kC.groupBy("k").agg(sum("v")).count())
    timed("chain of 3 shuffles 64k rows") {
      df64kC.groupBy("k").agg(sum("v").as("v"))
        .groupBy((col("k") % 10).as("k2")).agg(sum("v").as("v"))
        .join(df64kC, col("k2") === col("k")).count()
    }
    timed("window over 64k rows (partitionBy k)") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      df64kC.withColumn("c", count(lit(1)).over(w)).count()
    }
    // the blocking-stage shape: explode + window + self-join + distinct
    val sigsLike = spark.range(2000).select(col("id"),
      array((0 until 32).map(i => xxhash64(col("id") % 500, lit(i))): _*).as("bk"))
      .persist()
    sigsLike.count()
    timed("explode+window+selfjoin+distinct (2k x 32 keys)") {
      val m = sigsLike.select(col("id"), explode(col("bk")).as("bucket"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
      val j = m.withColumn("n", count(lit(1)).over(w))
      j.as("a").join(j.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct().count()
    }
    spark.stop()
  }
}
