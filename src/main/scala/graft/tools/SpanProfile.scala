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
    if (args.length > 2 && args(2) == "e2e-only") {
      // A/B the fast path at this size (best-of-2 each)
      for (fp <- Seq("100000", "0")) {
        spark.conf.set("graft.span.fastPathDocs", fp)
        val w = (1 to 2).map { _ =>
          val t = System.nanoTime()
          SuffixSpans.spans(pages, cfg).count()
          (System.nanoTime() - t) / 1e9
        }.min
        println(f"[span] fastPathDocs=$fp%-7s best-of-2 $w%7.2f s")
      }
      spark.conf.unset("graft.span.fastPathDocs")
      spark.stop(); return
    }
    // conf matrix: AQE x shuffle partitions (best-of-2 each)
    for (aqe <- Seq("true", "false"); parts <- Seq("32", "8")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val w = (1 to 2).map { _ =>
        val t = System.nanoTime()
        SuffixSpans.spans(pages, cfg).count()
        (System.nanoTime() - t) / 1e9
      }.min
      println(f"[span] conf aqe=$aqe%-5s parts=$parts%-2s best-of-2 $w%7.2f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

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

    // ---- staged DataFrame actions: approximate per-stage wall ----
    {
      var t = System.nanoTime()
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      var g = gcMs
      def lap(label: String, n: Long): Unit = {
        val g2 = gcMs
        println(f"[span] stage $label%-22s ${(System.nanoTime() - t) / 1e9}%7.2f s  gc=${g2 - g}ms  n=$n")
        t = System.nanoTime(); g = g2
      }
      val d2 = pages.select(col("id").cast("long").as("id"),
        normUdf(col("text")).as("ntext"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("norm+persist", d2.count())
      val mem2 = d2.select(col("id"), explode(winnowUdf(col("ntext"))).as("bucket"))
      lap("winnow+explode", mem2.count())
      val capped2 = mem2.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
      lap("window-cap", capped2.count())
      val sets2 = capped2.groupBy("bucket")
        .agg(sort_array(collect_list(col("id"))).as("members"))
        .filter(size(col("members")) >= 2)
        .select(col("members")).distinct()
        .select(xxhash64(col("members")).as("gkey"), col("members"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("sets+persist", sets2.count())
      val first2 = sets2.select(col("gkey"), element_at(col("members"), 1).as("m0"),
        col("members"), size(col("members")).as("sz"))
      val cont2 = sets2.select(col("gkey").as("sup_gkey"),
        explode(col("members")).as("m0"),
        col("members").as("sup_members"), size(col("members")).as("sup_sz"))
      val cand2 = first2.join(cont2, "m0")
        .filter(col("gkey") =!= col("sup_gkey") &&
          (col("sz") < col("sup_sz") ||
            (col("sz") === col("sup_sz") && col("gkey") < col("sup_gkey"))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("prune-candidates", cand2.count())
      val sub2 = cand2
        .filter(size(array_except(col("members"), col("sup_members"))) === 0)
        .select(col("gkey").as("sub_gkey"), col("members").as("sub_members"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("prune-verify", sub2.count())
      val groups2 = sets2.join(sub2,
          col("gkey") === col("sub_gkey") &&
            col("members") === col("sub_members"), "left_anti")
        .select(col("gkey"), explode(col("members")).as("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("[span] ---- anti-join plan ----")
      groups2.explain("formatted")
      lap("prune-antijoin", groups2.count())
      val joined2 = groups2.join(d2, "id")
        .select(col("gkey"), col("id"), col("ntext"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("join-texts", joined2.count())
      val grouped2 = joined2
        .as[(Long, Long, String)]
        .groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val members = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).distinct
          SuffixArrays.dupSpans(members.toSeq, cfg.minSpanLen)
            .iterator.map(p => (p.id1, p.id2, p.spanLen, p.span))
        }.toDF("id1", "id2", "span_len", "span")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("kernel(flatMapGroups)", grouped2.count())
      val out2 = grouped2.groupBy("id1", "id2")
        .agg(max(struct(col("span_len"), col("span"))).as("m"))
        .select(col("id1"), col("id2"),
          col("m.span_len").as("span_len"), col("m.span").as("span"))
        .localCheckpoint()
      lap("max-merge+checkpoint", out2.count())
      d2.unpersist(); sets2.unpersist()
    }

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

    // ---- true parallel kernel wall: 32 JVM threads over collected groups ----
    {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val t = System.nanoTime()
      val futs = collected.map { case (_, docs) =>
        scala.concurrent.Future(SuffixArrays.dupSpans(docs.toSeq, cfg.minSpanLen).size)
      }
      val total = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs.toSeq),
        scala.concurrent.duration.Duration.Inf).sum
      println(f"[span] 32-thread kernel   ${(System.nanoTime() - t) / 1e9}%7.2f s  spans=$total")
      pool.shutdown()
      // per-group cost distribution (top 5)
      val costs = collected.map { case (g, docs) =>
        val t0 = System.nanoTime()
        SuffixArrays.dupSpans(docs.toSeq, cfg.minSpanLen)
        (g, docs.length, docs.map(_._2.length).sum, (System.nanoTime() - t0) / 1e6)
      }.sortBy(-_._4)
      costs.take(5).foreach { case (g, nd, ch, ms) =>
        println(f"[span] top group $g%20d docs=$nd%3d chars=$ch%7d ${ms}%8.1f ms")
      }
    }
    spark.stop()
  }
}
