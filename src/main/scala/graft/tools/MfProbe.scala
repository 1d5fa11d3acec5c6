package graft.tools

import org.apache.spark.sql.functions._

/** Round-6: multifield planner cost decomposition at the bench shape.
  * Usage: runMain graft.tools.MfProbe <sfDir> <cores> */
object MfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Bench.makeSession(args(1))
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.LogManager.getLogger("org.apache.spark").setLevel(org.apache.log4j.Level.WARN)
    // warm
    graft.SparkEntry.queries("q_multifield_pairs")(spark, sfDir).count()
    spark.catalog.clearCache()
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mfprobe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val nt = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val recs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"),
        nt.substr(lit(1), lit(48)).as("title"),
        nt.substr(lit(49), length(nt)).as("body"))
    val specs = graft.operators.MultiField.parseConfigs(
      """{"title": {"sig_type": "syntactic", "weight": 2.0},
         "body": {"sig_type": "semantic", "weight": 1.0}}""")
    val grams = specs.map { sp =>
      recs
        .select(col("id"), graft.operators.MultiField.gramCol(col(sp.source), sp).as("g"))
        .persist()
    }
    time("gram caches materialize")(grams.foreach(_.count()))
    val est = time("estimate job") {
      graft.operators.SetSimJoin.candidatePairEstimatesMulti(
        specs.zip(grams).map { case (sp, d) =>
          val tf = graft.operators.MultiField.fieldThreshold(sp, 3.0, 0.6)
          (sp.field, d, Seq(0.6, tf).filter(t => t > 0 && t <= 1))
        })
    }
    println("[mfprobe] estimates: " + est.toSeq.sortBy(_._1._1).mkString(", "))
    time("union plan (2 field joins)") {
      val u = specs.zip(grams).map { case (_, d) =>
        graft.operators.SetSimJoin.jaccardSelfJoin(d, 0.6).select("id1", "id2")
      }.reduce(_ union _).distinct()
      println("  cands=" + u.count())
    }
    time("single-field best") {
      val sp = specs.head // title, tf = (0.6*3-1)/2 = 0.4
      val tf = graft.operators.MultiField.fieldThreshold(sp, 3.0, 0.6)
      println("  cands=" + graft.operators.SetSimJoin
        .jaccardSelfJoin(grams.head, tf).select("id1", "id2").count())
    }
    time("full dedupPairs") {
      println("  rows=" + graft.operators.MultiField.dedupPairs(recs, specs, 0.6).count())
    }
    spark.stop()
  }
}
