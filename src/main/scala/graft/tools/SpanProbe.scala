package graft.tools

import graft.config.GraftConfig
import graft.corpus.PageCorpus
import graft.functions.TextSignatures
import org.apache.spark.sql.functions._

/** Decompose SuffixSpans cost on the 2000-page corpus. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.makeSession(if (args.length > 0) args(0) else "32")
    import spark.implicits._
    val cfg = GraftConfig.default
    val (pages0, _) = PageCorpus.generate(spark, 2000, cfg.seed)
    val pages = pages0.toDF().persist()
    pages.count()
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[span] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup JIT on a small run
    graft.operators.SuffixSpans.spans(pages.limit(200), cfg).count()

    val winnowUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else TextSignatures.winnow(TextSignatures.normalize(text),
        cfg.spanGramLen, cfg.winnowWindow)
    }
    val normUdf = udf { (text: String) =>
      if (text == null) "" else new String(TextSignatures.normalize(text))
    }
    val d = pages.select(col("id").cast("long").as("id"), normUdf(col("text")).as("ntext")).persist()
    time("normalize") { d.count() }
    val memberships = d.select(col("id"), explode(winnowUdf(col("ntext"))).as("bucket")).persist()
    time("memberships") { println("[span] membership rows: " + memberships.count()) }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("id")
    val capped = memberships.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
    val groups = capped.groupBy("bucket")
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .filter(size(col("members")) >= 2)
      .select(col("members")).distinct()
      .select(xxhash64(col("members")).as("gkey"), explode(col("members")).as("id"))
      .persist()
    time("distinct groups explode") { println("[span] group-member rows: " + groups.count()) }
    println("[span] distinct groups: " + groups.select("gkey").distinct().count())
    val grouped = groups.join(d, "id")
      .select(col("gkey"), col("id"), col("ntext"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.map(t => (t._2, t._3)).toArray.sortBy(_._1).distinct
        graft.functions.SuffixArrays.dupSpans(members.toSeq, cfg.minSpanLen)
          .iterator.map(p => (p.id1, p.id2, p.spanLen, p.span))
      }.toDF("id1", "id2", "span_len", "span").persist()
    time("SA flatMapGroups") { println("[span] raw span rows: " + grouped.count()) }
    time("merge max") {
      println("[span] merged pairs: " + grouped.groupBy("id1", "id2")
        .agg(max(struct(col("span_len"), col("span"))).as("m")).count())
    }
    spark.stop()
  }
}
