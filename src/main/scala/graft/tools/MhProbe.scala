package graft.tools

import org.apache.spark.sql.functions._

/** Round-6: decompose the minhash bucket-join stage at the 80k bench shape.
  * Usage: runMain graft.tools.MhProbe <nPages> <cores> */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 80000
    val spark = graft.Bench.makeSession(if (args.length > 1) args(1) else "32")
    val cfg = graft.SparkEntry.cfg
    val clock = new graft.Bench.TaskClock
    spark.sparkContext.addSparkListener(clock)
    val (pages, _) = graft.corpus.PageCorpus.generate(spark, nPages, cfg.seed)
    val df = pages.toDF()
    df.persist().count()
    val sigs = graft.operators.Signatures.compute(df, cfg, emitShingles = false,
      parts = graft.functions.TextSignatures.SigParts.minhashOnly)
      .persist()
    sigs.count()

    def timed(name: String)(body: => Long): Unit = {
      val b = clock.drained()
      val t0 = System.nanoTime()
      val n = body
      val w = (System.nanoTime() - t0) / 1e9
      val a = clock.drained()
      println(f"[mh] $name%-46s wall=$w%5.2f s core=${(a._1 - b._1) / 1e3}%7.2f s rows=$n")
    }
    val noop = (d: org.apache.spark.sql.DataFrame) => {
      d.write.format("noop").mode("overwrite").save(); 0L
    }
    val m = sigs.select(col("id"), explode(col("band_keys")).as("bucket"))
    timed("memberships explode (noop)")(noop(m))
    timed("memberships explode (noop) rep2")(noop(m))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
    val joined = m.withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("bucket_min", min("id").over(w))
    timed("window count+min (noop)")(noop(joined))
    timed("window count+min (noop) rep2")(noop(joined))
    val small = joined.filter(col("bucket_n") <= cfg.maxBandBucket)
    val sj = small.as("a").join(small.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    timed("self-join raw (count)")(sj.count())
    timed("self-join + groupBy dedupe")(sj.groupBy("id1", "id2").count().count())
    timed("full minhashStage (dedupe)")(
      graft.operators.CandidateGen.minhashStage(sigs, cfg).candidates.count())

    // alternative shape: bucket stats via map-side-combinable AGGREGATE +
    // join-back (no per-group window machinery), then the same self-join
    val stats = m.groupBy("bucket")
      .agg(count(lit(1)).as("bucket_n"), min("id").as("bucket_min"))
    val m2 = m.join(stats, "bucket")
    val small2 = m2.filter(col("bucket_n") <= cfg.maxBandBucket)
    val sj2 = small2.as("a").join(small2.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    timed("AGG form: self-join + groupBy dedupe")(
      sj2.groupBy("id1", "id2").count().count())
    timed("AGG form rep2")(sj2.groupBy("id1", "id2").count().count())
    timed("WINDOW form rep2")(sj.groupBy("id1", "id2").count().count())
    spark.stop()
  }
}
