package graft.tools

import org.apache.spark.sql.functions._

/** Round-6 measurement aid: decompose Ann.lshTopK cost at the bench shape.
  * Usage: runMain graft.tools.AnnProbe <sfDir> <cores> */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val spark = graft.Bench.makeSession(cores)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[annprobe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the whole query once
    time("warm lshTopK") {
      graft.operators.Ann.lshTopK(emb, 3, seed = 42L).count()
    }
    spark.catalog.clearCache()

    val e = emb.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(
        graft.expressions.SimilarityExpressions.dotProduct(col("v"), col("v"))))
      .persist()
    time("prep+persist")(e.count())
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val buckets = graft.operators.Ann.hyperplaneBuckets(emb, 12, 6, 42L)
    time("buckets count")(println("  buckets=" + buckets.count()))
    val capped = graft.operators.BucketJoin.pairs(
      buckets.select(col("id"), col("bucket")), 2048, "ann_lsh")
    val pairs = capped.pairs.persist()
    time("capped pairs")(println("  pairs=" + pairs.count()))
    val scored = pairs
      .join(e.select(col("id").as("id1"), col("v").as("v1"), col("norm").as("n1")), "id1")
      .join(e.select(col("id").as("id2"), col("v").as("v2"), col("norm").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(graft.expressions.SimilarityExpressions.dotProduct(col("v1"), col("v2"))
          / (col("n1") * col("n2")), 6).as("cosine"))
    time("rescore")(println("  scored=" + scored.count()))
    val directed = scored
      .select(col("id1").as("id"), col("id2").as("neighbor"), col("cosine"))
      .union(scored
        .select(col("id2").as("id"), col("id1").as("neighbor"), col("cosine")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("cosine"), asc("neighbor"))
    time("directed+topk") {
      println("  topk=" + directed.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count())
    }
    time("full lshTopK again") {
      graft.operators.Ann.lshTopK(emb, 3, seed = 42L).count()
    }
    spark.stop()
  }
}
