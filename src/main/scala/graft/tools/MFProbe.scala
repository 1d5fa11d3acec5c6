package graft.tools

import graft.operators._
import graft.operators.MultiField.FieldSpec
import org.apache.spark.sql.functions._

/** Decompose q_multifield_pairs cost at a sf dir (iteration aid). */
object MFProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.makeSession(if (args.length > 1) args(1) else "32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mf] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val nt = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val recs = docs.select(col("doc_id").as("id"),
      nt.substr(lit(1), lit(48)).as("title"),
      nt.substr(lit(49), length(nt)).as("body")).persist()
    time("recs") { recs.count() }
    val title = FieldSpec("title", "title", "syntactic", 2.0)
    val body = FieldSpec("body", "body", "semantic", 1.0)
    val gt = recs.select(col("id"), MultiField.gramCol(col("title"), title).as("g")).persist()
    val gb = recs.select(col("id"), MultiField.gramCol(col("body"), body).as("g")).persist()
    time("gram title") { gt.count() }
    time("gram body") { gb.count() }
    val jt = SetSimJoin.jaccardSelfJoin(gt, 0.6)
    time("setsim title") { println("[mf] title pairs: " + jt.count()) }
    val jb = SetSimJoin.jaccardSelfJoin(gb, 0.6)
    time("setsim body") { println("[mf] body pairs: " + jb.count()) }
    val cands = jt.select("id1", "id2").union(jb.select("id1", "id2")).distinct().persist()
    time("cands") { println("[mf] cands: " + cands.count()) }
    val specs = Seq(title, body)
    time("rescore") {
      println("[mf] final: " + MultiField.rescore(cands, recs, specs, 0.6).count())
    }
    spark.stop()
  }
}
