package graft.tools

import graft.functions.{SuffixArrays, TextSignatures}
import graft.operators.SuffixSpans
import org.apache.spark.sql.functions._

/** TEMPORARY iteration probe (round 5): phase-level cost split of the
  * suffix-span stage — winnow/groups vs SA build vs Kasai vs run-scan —
  * on the exact bench corpus, to direct the q_suffix_spans <= 3 s work.
  * Deleted once findings land as comments in SuffixSpans/SuffixArrays.
  * Usage: runMain graft.tools.SpanProfile [nPages] [cores]
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 2000
    val cores = if (args.length > 1) args(1) else "32"
    val spark = graft.Bench.makeSession(cores)
    import spark.implicits._
    val cfg = graft.config.GraftConfig()
    val (pages, _) = graft.SparkEntry.corpus(spark, nPages)

    // ---- end-to-end wall (matches q_suffix_spans minus orderBy) ----
    var t0 = System.nanoTime()
    val n1 = SuffixSpans.spans(pages, cfg).count()
    println(f"[span] end-to-end        ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n1")
    t0 = System.nanoTime()
    val n2 = SuffixSpans.spans(pages, cfg).count()
    println(f"[span] end-to-end warm   ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n2")

    // ---- replicate group extraction, then time kernel phases ----
    val winnowUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else TextSignatures.winnow(TextSignatures.normalize(text),
        cfg.spanGramLen, cfg.winnowWindow)
    }
    val normUdf = udf { (text: String) =>
      if (text == null) "" else new String(TextSignatures.normalize(text))
    }
    val d = pages.select(col("id").cast("long").as("id"),
      normUdf(col("text")).as("ntext")).cache()
    val memberships = d.select(col("id"), explode(winnowUdf(col("ntext"))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("id")
    val capped = memberships.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
    val sets = capped.groupBy("bucket")
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .filter(size(col("members")) >= 2)
      .select(col("members")).distinct()
      .select(xxhash64(col("members")).as("gkey"), col("members")).cache()
    val nSets = sets.count()
    val first = sets.select(col("gkey"), element_at(col("members"), 1).as("m0"),
      col("members"), size(col("members")).as("sz"))
    val containing = sets.select(col("gkey").as("sup_gkey"),
      explode(col("members")).as("m0"),
      col("members").as("sup_members"), size(col("members")).as("sup_sz"))
    val subsumed = first.join(containing, "m0")
      .filter(col("gkey") =!= col("sup_gkey") &&
        (col("sz") < col("sup_sz") ||
          (col("sz") === col("sup_sz") && col("gkey") < col("sup_gkey"))) &&
        size(array_except(col("members"), col("sup_members"))) === 0)
      .select(col("gkey")).distinct()
    val groups = sets.join(subsumed, Seq("gkey"), "left_anti")
      .select(col("gkey"), explode(col("members")).as("id"))
    val collected: Array[(Long, Array[(Long, String)])] = groups.join(d, "id")
      .select(col("gkey"), col("id"), col("ntext"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        (g, rows.map(t => (t._2, t._3)).sortBy(_._1).distinct)
      }.toArray
    val nGroups = collected.length
    val totChars = collected.map(_._2.map(_._2.length.toLong).sum).sum
    val maxChars = collected.map(_._2.map(_._2.length.toLong).sum).max
    val totMembers = collected.map(_._2.length.toLong).sum
    println(f"[span] distinct sets=$nSets maximal groups=$nGroups members=$totMembers chars=$totChars maxGroupChars=$maxChars")

    // per-phase, single thread (representative relative split)
    var tConcat = 0L; var tBuild = 0L; var tLcp = 0L; var tScan = 0L
    var spans = 0L
    collected.foreach { case (_, docs) =>
      var t = System.nanoTime()
      val totalLen = docs.map(_._2.length).sum + docs.length
      val s = new Array[Int](totalLen)
      val docOf = new Array[Int](totalLen)
      var pos = 0; var di = 0
      docs.foreach { case (_, text) =>
        var i = 0
        while (i < text.length) {
          s(pos) = text.charAt(i).toInt + 1; docOf(pos) = di; pos += 1; i += 1
        }
        s(pos) = -(di + 1); docOf(pos) = di; pos += 1; di += 1
      }
      tConcat += System.nanoTime() - t
      t = System.nanoTime()
      val sa = SuffixArrays.build(s)
      tBuild += System.nanoTime() - t
      t = System.nanoTime()
      val lcps = SuffixArrays.lcp(s, sa)
      tLcp += System.nanoTime() - t
      t = System.nanoTime()
      spans += SuffixArrays.dupSpans(docs.toSeq, cfg.minSpanLen).size
      tScan += System.nanoTime() - t
    }
    println(f"[span] 1-thread: concat ${tConcat / 1e9}%6.2f  build ${tBuild / 1e9}%6.2f  lcp ${tLcp / 1e9}%6.2f  dupSpans(all-in) ${tScan / 1e9}%6.2f s  spans=$spans")
    spark.stop()
  }
}
