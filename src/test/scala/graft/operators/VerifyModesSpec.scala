package graft.operators

import graft.SparkSuite
import graft.config.GraftConfig
import graft.expressions.SimilarityExpressions
import org.apache.spark.sql.functions._

/** Round-4 advisor/verdict items: JaccardVerify narrow-bundle guard,
  * estimate-mode estimator contract, SuffixSpans group-cap truncation log,
  * SparkEntry corpus-cache release. */
class VerifyModesSpec extends SparkSuite {
  import spark.implicits._

  val cfg = GraftConfig.default

  private def toyDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps going for a while longer"),
    (2L, "the quick brown fox jumps over the lazy dog and keeps going for a bit longer"),
    (3L, "entirely unrelated content talking about distributed query engines and shuffles"))
    .toDF("id", "text")

  test("verify: narrow bundle without texts fails fast with the coupling spelled out") {
    val docs = toyDocs
    val sigs = Signatures.compute(docs, cfg, emitShingles = false)
    val cands = Seq((1L, 2L, "minhash")).toDF("id1", "id2", "stage")
    val e = intercept[IllegalArgumentException] {
      JaccardVerify.verify(cands, sigs, cfg)
    }
    assert(e.getMessage.contains("texts"))
    assert(e.getMessage.contains("emitShingles"))
    // estimate mode needs no shingles and no texts — must NOT throw
    assert(JaccardVerify.verify(cands, sigs, cfg, estimate = true).columns
      .contains("jaccard"))
  }

  test("verify estimate mode: unbiased full-lane estimator by default, packed on opt-in") {
    val docs = toyDocs
    val sigs = Signatures.compute(docs, cfg) // wide: minhash AND minhash8
      .persist()
    val cands = Seq((1L, 2L, "minhash")).toDF("id1", "id2", "stage")
    val lowCfg = cfg.copy(simThreshold = 0.0) // keep the pair regardless of score
    def est(packed: Boolean): Double =
      JaccardVerify.verify(cands, sigs, lowCfg, estimate = true,
          packedEstimate = packed)
        .select("jaccard").head().getDouble(0)
    val full = sigs.as("a").join(sigs.as("b"),
        col("a.id") === 1L && col("b.id") === 2L)
      .select(
        SimilarityExpressions.minhashAgreement(col("a.minhash"), col("b.minhash"))
          .as("f"),
        SimilarityExpressions.minhashAgreementPacked(
          col("a.minhash8"), col("b.minhash8"), cfg.numPerm).as("p"))
      .head()
    assert(est(packed = false) == full.getDouble(0),
      "default estimate mode must report the unbiased full-lane estimator")
    assert(est(packed = true) == full.getDouble(1),
      "packedEstimate=true must report the 8-bit-lane estimator")
    // the packed estimator's bias is one-sided: never below the full one
    assert(full.getDouble(1) >= full.getDouble(0))
    sigs.unpersist()
  }

  test("SuffixSpans: group-cap truncation is logged, spans stay exact") {
    // 8 docs share one long boilerplate block -> one fingerprint-group family
    // far above groupCap = 4
    val boiler = "this exact boilerplate navigation footer block is repeated " +
      "verbatim across every page of the site and is long enough to winnow"
    val docs = (1L to 8L).map(i => (i, s"unique lead $i $boiler unique tail $i"))
      .toDF("id", "text")
    val r = SuffixSpans.spansWithLog(docs, cfg, groupCap = 4)
    val log = r.oversizeLog.collect()
    assert(log.nonEmpty, "capped fingerprint groups must be logged")
    assert(log.forall(_.getAs[String]("policy") == "Truncate"))
    assert(log.forall(_.getAs[Long]("bucket_n") > 4))
    assert(log.forall(_.getAs[String]("stage") == "suffix_span_groups"))
    // spans among the surviving members are still exact and cover the block
    val spans = r.spans.collect()
    assert(spans.nonEmpty)
    assert(spans.forall(_.getAs[Int]("span_len") >= cfg.minSpanLen))
    // spans-only form returns the identical span set (no extra log job)
    val only = SuffixSpans.spans(docs, cfg, groupCap = 4).collect()
    assert(only.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      spans.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("runPairs minhash-only exact mode == minhashDupPairs (same stage, same result)") {
    val (pages, _) = graft.corpus.PageCorpus.generateLocal(300, cfg.seed)
    val df = spark.createDataset(pages.toSeq).toDF()
    val viaPipeline = new graft.pipeline.DedupPipeline(spark, cfg)
      .runPairs(df, exact = true, useSimhash = false, useSpans = false)
      .select("id1", "id2", "jaccard")
      .withColumn("jaccard", round(col("jaccard"), 6))
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.minhashDupPairs(df, cfg, idCol = "id")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaPipeline == direct)
    assert(direct.nonEmpty)
    // estimate mode on the same slice: scores are tier-1 estimates at >= t,
    // so every estimate pair is a real band collision scored >= threshold
    val est = new graft.pipeline.DedupPipeline(spark, cfg)
      .runPairs(df, useSimhash = false, useSpans = false)
    assert(est.columns.toSet == Set("id1", "id2", "jaccard", "stage"))
    assert(est.filter(col("jaccard") < cfg.simThreshold).count() == 0)
  }

  test("SigParts: disabled families come back empty, enabled ones identical to full") {
    val docs = toyDocs
    val full = Signatures.compute(docs, cfg, emitShingles = false).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val mh = Signatures.compute(docs, cfg, emitShingles = false,
      parts = graft.functions.TextSignatures.SigParts.minhashOnly).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    for ((id, r) <- mh) {
      assert(r.getAs[scala.collection.Seq[Long]]("band_keys") == full(id).getAs[scala.collection.Seq[Long]]("band_keys"))
      assert(r.getAs[scala.collection.Seq[Long]]("minhash8") == full(id).getAs[scala.collection.Seq[Long]]("minhash8"))
      assert(r.getAs[scala.collection.Seq[Long]]("span_keys").isEmpty)
      assert(r.getAs[scala.collection.Seq[Long]]("simhash_chunks").isEmpty)
    }
    val sh = Signatures.compute(docs, cfg, emitShingles = false,
      parts = graft.functions.TextSignatures.SigParts.simhashOnly).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    for ((id, r) <- sh) {
      assert(r.getAs[Long]("simhash") == full(id).getAs[Long]("simhash"))
      assert(r.getAs[scala.collection.Seq[Long]]("simhash_chunks") ==
        full(id).getAs[scala.collection.Seq[Long]]("simhash_chunks"))
      assert(r.getAs[scala.collection.Seq[Long]]("band_keys").isEmpty)
    }
  }

  test("verify semiJoin: output identical, non-participating docs pruned from the side") {
    val (pages, _) = graft.corpus.PageCorpus.generateLocal(300, cfg.seed)
    val df = spark.createDataset(pages.toSeq).toDF()
    val sigs = Signatures.compute(df, cfg, emitShingles = false).persist()
    val cands = CandidateGen.minhashStage(sigs, cfg).candidates
    val texts = Some(df.select(col("id"), col("text")))
    def run(semi: Boolean) =
      JaccardVerify.verify(cands, sigs, cfg, texts = texts, semiJoin = semi)
        .select("id1", "id2", "jaccard")
        .withColumn("jaccard", round(col("jaccard"), 9))
        .as[(Long, Long, Double)].collect().toSet
    val off = run(semi = false)
    val on = run(semi = true)
    assert(off.nonEmpty)
    assert(on == off, "semi-join prefilter must be output-identical")
    sigs.unpersist()
  }

  test("SparkEntry corpus cache has a release path") {
    graft.SparkEntry.corpus(spark, 50)
    assert(graft.SparkEntry.cachedCorpusCount(spark) >= 1)
    graft.SparkEntry.releaseCorpus(spark)
    assert(graft.SparkEntry.cachedCorpusCount(spark) == 0)
  }
}
