package graft.tools

import graft.operators._
import org.apache.spark.sql.functions._

/** Decompose PPJoin + CC cost on the sf documents table (iteration aid). */
object PPProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1) else "32"
    val spark = graft.Bench.makeSession(cores)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[pp] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val t = 0.2
    val toks = split(lower(trim(col("text"))), "\\s+")
    val grams = array_distinct(transform(
      slice(toks, lit(1), greatest(size(toks) - 2, lit(0))),
      (_, i) => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    val d0 = docs.select(col("doc_id").as("id"), grams.as("g"))
    val d = d0.select(col("id"),
      array_sort(array_distinct(transform(col("g"), x => xxhash64(x)))).as("h"))
      .persist()
    time("gram+hash materialize") { d.count() }
    println("[pp] avg set size: " + d.select(avg(size(col("h")))).head().getDouble(0))

    val tok2 = d.select(col("id"), explode(col("h")).as("tok"))
    val dfreq = tok2.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    time("dfreq") { dfreq.count() }
    val sorted = tok2.join(dfreq, "tok").groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"),
        count(lit(1)).as("n")).persist()
    time("sorted") { sorted.count() }
    val pfxLen = (col("n") - ceil(lit(t) * col("n")) + 1).cast("int")
    val pfx = sorted.select(col("id"), col("n"),
        posexplode(slice(col("st"), lit(1), pfxLen)).as(Seq("pos", "s")))
      .select(col("id"), col("n"), col("pos"), col("s.tok").as("tok")).persist()
    time("prefix rows") { println("[pp] prefix rows: " + pfx.count()) }
    val reqOverlap = ceil(lit(t) / (1 + t) * (col("a.n") + col("b.n")))
    val rawCands = pfx.as("a").join(pfx.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id")
          && least(col("a.n"), col("b.n")) >= lit(t) * greatest(col("a.n"), col("b.n"))
          && least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= reqOverlap)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    time("raw cand rows") { println("[pp] raw cand rows: " + rawCands.count()) }
    val cands = rawCands.distinct().persist()
    time("distinct cands") { println("[pp] distinct cands: " + cands.count()) }
    val verified = cands
      .join(d.select(col("id").as("id1"), col("h").as("h1")), "id1")
      .join(d.select(col("id").as("id2"), col("h").as("h2")), "id2")
      .withColumn("jaccard",
        graft.expressions.SimilarityExpressions.jaccardSorted(col("h1"), col("h2")))
      .filter(col("jaccard") >= t)
      .select(col("id1"), col("id2"))
    time("verify") { println("[pp] verified pairs: " + verified.count()) }

    // CC loop cost on the verified edge set
    val edges = verified.persist()
    edges.count()
    time("CC loop") {
      println("[pp] components rows: " +
        ConnectedComponents.components(edges).count())
    }
    spark.stop()
  }
}
