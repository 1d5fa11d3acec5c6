package graft.operators // private[graft]/private[operators] lazy-plan access

import org.apache.spark.sql.functions._

/**
 * Round-6 deliverable generator: `.explain("formatted")` of the touched
 * queries' INFORMATIVE plans (the public query forms eagerly localCheckpoint,
 * which collapses executedPlan to an RDD scan — the lazy operator variants
 * show the join/exchange structure the optimization claims are about).
 * Usage: runMain graft.operators.PlanDumpR06 <outDir> <suffix(before|after)>
 */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = "/root/testdata/sf0.01"
    val spark = graft.Bench.makeSession("32")
    val cfg = graft.SparkEntry.cfg
    new java.io.File(outDir).mkdirs()

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def dump(name: String, sections: (String, String)*): Unit = {
      val body = sections.map { case (h, s) => s"===== $h =====\n$s" }
        .mkString("\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), body)
      println(s"[plandump] wrote $name ($suffix)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // q_minhash_pairs: signatures -> minhash banding -> two-tier verify
    {
      val sigs = Signatures.compute(docs, cfg, "doc_id", "text",
        emitShingles = false,
        parts = graft.functions.TextSignatures.SigParts.minhashOnly)
        .persist()
      val cands = CandidateGen.minhashStage(sigs, cfg)
      val texts = docs.select(col("doc_id").cast("long").as("id"), col("text"))
      val v = JaccardVerify.verify(cands.candidates, sigs, cfg,
        texts = Some(texts))
      dump("q_minhash_pairs", "verify chain (lazy)" -> fmt(v))
      sigs.unpersist()
    }

    // q_ngram_jaccard_pairs / q_cc_clusters edge source: prefix-filter join
    {
      val toks = split(lower(trim(col("text"))), "\\s+")
      val th = docs.select(col("doc_id").as("id"),
        transform(toks, t => xxhash64(t)).as("th"))
      val grams = when(size(col("th")) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(col("th")) - 2),
          i => xxhash64((0 until 3).map(j => element_at(col("th"), i + j)): _*))))
        .otherwise(array().cast("array<long>"))
      val d = th.select(col("id"), grams.as("g"))
      val (plan, caches) = SetSimJoin.jaccardSelfJoinLazy(d, 0.2)
      dump("q_ngram_jaccard_pairs", "prefix-filter join (lazy)" -> fmt(plan))
      caches.foreach(_.unpersist())
    }

    // q_multifield_pairs: planner + chosen join + rescore
    {
      val nt = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val recs = docs.select(col("doc_id").as("id"),
        nt.substr(lit(1), lit(48)).as("title"),
        nt.substr(lit(49), length(nt)).as("body"))
      val specs = MultiField.parseConfigs(
        """{"title": {"sig_type": "syntactic", "weight": 2.0},
           "body": {"sig_type": "semantic", "weight": 1.0}}""")
      val (plan, caches) = MultiField.dedupPairsPlan(recs, specs, 0.6)
      dump("q_multifield_pairs", "planned join + rescore (lazy)" -> fmt(plan))
      caches.foreach(_.unpersist())
    }

    // q_ann_lsh_top3 + q_cosine_lsh_pairs
    {
      val (plan, caches) = Ann.lshTopKLazy(emb, 3)
      dump("q_ann_lsh_top3", "bucket join + rescore + topk (lazy)" -> fmt(plan))
      caches.foreach(_.unpersist())
      val (r, c2) = Ann.lshCosinePairsLazy(emb, 0.4)
      dump("q_cosine_lsh_pairs", "threshold pairs (lazy)" -> fmt(r.pairs))
      c2.foreach(_.unpersist())
    }

    // q_pipeline_clusters / q_linkage_pairs core: blocking union -> verify
    {
      val (pages, _) = graft.corpus.PageCorpus.generate(spark, 500, cfg.seed)
      val sigs = Signatures.compute(pages.toDF(), cfg, emitShingles = false)
        .persist()
      val cands = CandidateGen.all(sigs, cfg)
      val v = JaccardVerify.verify(cands.candidates, sigs, cfg,
        texts = Some(pages.toDF().select(col("id"), col("text"))))
      dump("q_pipeline_clusters",
        "3-stage blocking union -> candidates" -> fmt(cands.candidates),
        "two-tier verify over candidates (tier-1 survivors are lazily " +
          "localCheckpointed in round 6, so the union above appears here " +
          "as a Scan ExistingRDD)" -> fmt(v))
      sigs.unpersist()
    }
    spark.stop()
  }
}
