package graft

import graft.config.GraftConfig
import graft.operators._
import org.apache.spark.sql.functions._

/**
 * Physical-plan assertions — the "would this survive 100×" checks from
 * ARCHITECTURE.md, pinned so regressions in plan shape fail the build:
 *  - column pruning reaches the scan (signatures read only id+text),
 *  - predicate pushdown reaches the scan,
 *  - the bucket self-join reuses one exchange (no duplicate shuffle of the
 *    membership table),
 *  - no cartesian product anywhere in the flagship plan.
 */
class PlanSpec extends SparkSuite {
  import spark.implicits._

  val cfg = GraftConfig.default
  val docsPath = "/root/testdata/sf0.001/documents.parquet"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("signature projection prunes the scan to id+text (ReadSchema)") {
    val docs = spark.read.parquet(docsPath)
    val p = plan(Signatures.compute(docs, cfg, "doc_id", "text"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"scan must not read unused columns: $readSchema")
  }

  test("filters push down into the parquet scan (PushedFilters)") {
    val docs = spark.read.parquet(docsPath).filter($"lang" === "en")
      .select("doc_id", "text")
    val p = plan(docs)
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), p)
  }

  test("bucket join: bounded exchange count; stats side broadcast at small scale") {
    val docs = spark.read.parquet(docsPath)
    val sigs = Signatures.compute(docs, cfg, "doc_id", "text")
    val m = sigs.select(col("id"), explode(col("band_keys")).as("bucket"))
    val r = BucketJoin.pairs(m, cfg.maxBandBucket, "minhash")
    r.pairs.collect() // let AQE finalize (runtime exchange reuse / broadcasts)
    val p = plan(r.pairs)
    // regression guard: the whole candidate-pair job must stay within its
    // shuffle budget — stats agg (x3 branches pre-AQE-reuse) + final distinct
    // budget: 3 stats-agg partials (pre-AQE-reuse branches), join-side
    // repartitions, final distinct — anything beyond 8 means a regression
    // added an unplanned wide exchange
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 8, s"bucket join shuffle budget exceeded ($shuffles):\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("ReusedExchange"),
      s"small-scale stats join should broadcast or reuse:\n$p")
  }

  test("flagship pipeline plan contains no cartesian product") {
    val (pages, _) = graft.corpus.PageCorpus.generate(spark, 200, cfg.seed)
    val sigs = Signatures.compute(pages.toDF(), cfg)
    val cands = CandidateGen.all(sigs, cfg).candidates
    val verified = JaccardVerify.verify(cands, sigs, cfg)
    val p = plan(verified)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cosine LSH pairs + pairs-mode plans contain no cartesian product") {
    // lazy variants: the public forms eagerly checkpoint (cache hygiene),
    // which would collapse executedPlan to a checkpoint-RDD scan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // t=0.85 is the LSH regime (predicted random-pair admission ~3%): the
    // bucket-join plan must hold with no cartesian anywhere
    val (r1, c1) = Ann.lshCosinePairsLazy(emb, 0.85)
    try {
      val p1 = plan(r1.pairs)
      assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"), p1)
    } finally c1.foreach(_.unpersist())
    // t=0.5 is the documented weak regime (admission ~74%): the planner
    // must select the brute exact scan — LSH overhead prunes almost nothing
    val (r1b, c1b) = Ann.lshCosinePairsLazy(emb, 0.5)
    try {
      val p1b = plan(r1b.pairs)
      assert(p1b.contains("CartesianProduct") || p1b.contains("BroadcastNestedLoopJoin"),
        s"weak-regime cosine pairs should use the brute scan plan: $p1b")
    } finally c1b.foreach(_.unpersist())
    val (r2, c2) = Ann.lshTopKLazy(emb, 3)
    try {
      val p2 = plan(r2)
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
    } finally c2.foreach(_.unpersist())
  }

  test("whole-stage codegen covers the signature projection") {
    val docs = spark.read.parquet(docsPath)
    val df = Signatures.compute(docs, cfg, "doc_id", "text")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // scan -> UDF projection -> struct expansion fused into codegen id 1
    assert(formatted.contains("[codegen id : 1]"), formatted)
  }

  test("exactDupPairs keeps full text out of the candidate-join exchanges") {
    // AQE defers the physical plan and broadcast hides exchanges at this
    // tiny scale — force the shuffle form so the exchange payload is
    // inspectable (the 100 TB shape)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val exchanges = try {
      val docs = spark.read.parquet(docsPath)
      Dedup.exactDupPairs(docs).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.output.map(_.name)
      }
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // the hash self-join shuffles (id, h, len) only — any exchange carrying
    // the hash column must NOT also carry the text payload
    val hashExchanges = exchanges.filter(_.contains("h"))
    assert(hashExchanges.nonEmpty, s"expected a hash-keyed exchange: $exchanges")
    hashExchanges.foreach { cols =>
      assert(!cols.exists(c => c == "text" || c == "t" || c == "t1" || c == "t2"),
        s"text payload leaked into the candidate exchange: $cols")
    }
  }
}
