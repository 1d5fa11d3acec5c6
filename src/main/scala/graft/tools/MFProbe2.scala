package graft.tools

import graft.operators._
import graft.operators.MultiField.FieldSpec
import org.apache.spark.sql.functions._

/** Probe the multifield planner estimates + chosen-plan cost. */
object MFProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.makeSession(if (args.length > 1) args(1) else "32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mf2] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val nt = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val recs = docs.select(col("doc_id").as("id"),
      nt.substr(lit(1), lit(48)).as("title"),
      nt.substr(lit(49), length(nt)).as("body")).persist()
    recs.count()
    val title = FieldSpec("title", "title", "syntactic", 2.0)
    val body = FieldSpec("body", "body", "semantic", 1.0)
    val gt = recs.select(col("id"), MultiField.gramCol(col("title"), title).as("g")).persist()
    val gb = recs.select(col("id"), MultiField.gramCol(col("body"), body).as("g")).persist()
    gt.count(); gb.count()
    val et = time("estimate title") {
      SetSimJoin.candidatePairEstimates(gt, Seq(0.6, 0.4)) }
    println("[mf2] title est: " + et)
    val eb = time("estimate body") {
      SetSimJoin.candidatePairEstimates(gb, Seq(0.6)) }
    println("[mf2] body est: " + eb)
    val jt = SetSimJoin.jaccardSelfJoin(gt, 0.4)
    time("title join @0.4") { println("[mf2] title pairs@0.4: " + jt.count()) }
    val specs = Seq(title, body)
    time("full dedupPairs") {
      println("[mf2] final: " + MultiField.dedupPairs(recs, specs, 0.6).count())
    }
    spark.stop()
  }
}
