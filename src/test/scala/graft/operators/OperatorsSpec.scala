package graft.operators

import graft.SparkSuite
import graft.config.GraftConfig
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  val cfg = GraftConfig.default

  test("Dedup.exactDupGroups + exactDupPairs find planted exact duplicates") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta"),
      (4L, "alpha beta gamma"), (5L, "delta"), (6L, "unique")).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups == Set((1L, 3L), (3L, 2L)))
    val pairs = Dedup.exactDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 5L)))
  }

  test("Dedup.tokenJaccardPairs exact values") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w")).toDF("doc_id", "text")
    val got = Dedup.tokenJaccardPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.6))) // |{a,b,c}| / |{a,b,c,d,e}| = 3/5
  }

  test("Dedup.minhashDupPairs matches tokenJaccard-style ground truth on near-identical docs") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 100).map(i => if (i == 50) "CHANGED" else s"w$i").mkString(" ")
    val far = (1 to 100).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(docs, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("Dedup.embeddingCosinePairs exact cosine") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingCosinePairs(emb, 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("Ann.bruteForceTopK: correct neighbors and deterministic tie-break") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val top1 = Ann.bruteForceTopK(emb, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1 == Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L))
  }

  test("Ann.lshTopK achieves high recall@k vs brute force") {
    // clustered embeddings (the realistic ANN workload): 20 centers, small
    // per-point noise — true neighbors are intra-cluster, high-cosine
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian()))
    val emb = (0L until 200L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Ann.bruteForceTopK(emb, 5).select("id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, 5, nPlanes = 6, nTables = 16).select("id", "neighbor")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"ann recall@5 = $recall")
    assert(recall >= 0.95, s"LSH ANN recall too low: $recall")
  }

  test("Ann.lshTopK mega-bucket is capped (star degradation, no O(n²) blowup)") {
    // every vector identical → every table's bucket holds all n vectors;
    // with cap < n the candidate set must degrade to star pairs (O(n) rows),
    // never the O(n²) all-pairs the uncapped join would emit
    val emb = (0L until 100L).map(i => (i, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val got = Ann.lshTopK(emb, 3, nPlanes = 4, nTables = 2, bucketCap = 10)
    val n = got.count()
    // star pairs around the hub: hub has n-1 neighbors but keeps top-k;
    // members each see the hub only → total rows ≈ (n-1) + k, far below n²
    assert(n <= 200, s"capped LSH emitted $n rows — cap not applied")
    assert(n >= 99, s"star degradation lost connectivity: $n rows")
  }

  test("TextAnalysis.profile: token counts, ratios, langId") {
    val docs = Seq(
      (1L, "The cat and the dog of the house is big"),
      (2L, "Der Hund und die Katze ist gross und der Baum"),
      (3L, ""),
      (4L, "zz qq ww")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getAs[Long]("n_tokens_ws") == 10)
    assert(p(3L).getAs[Long]("n_tokens_ws") == 0)
    assert(p(1L).getAs[String]("lang_id") == "en")
    assert(p(2L).getAs[String]("lang_id") == "de")
    assert(p(4L).getAs[String]("lang_id") == "und")
    assert(p(1L).getAs[Double]("quality") > p(4L).getAs[Double]("quality"))
  }

  test("StatsJobs: maxStrLen even-rounding and vocabCount") {
    // reference fixture semantics (tests/test_utils.py:70-109): multitoken
    // max len 7 rounds to 8
    val df = Seq("abcdefg xy", "abc de").toDF("t")
    val ml = StatsJobs.maxStrLen(df, "t", multitoken = true).head().getLong(0)
    assert(ml == 8)
    val mlFull = StatsJobs.maxStrLen(df, "t", multitoken = false).head().getLong(0)
    assert(mlFull == 10)
    val vc = StatsJobs.vocabCount(df, "t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vc == Map("abcdefg" -> 1L, "xy" -> 1L, "abc" -> 1L, "de" -> 1L))
  }

  test("Splits: cluster-level, stratified, disjoint, deterministic") {
    // 200 plural clusters (3 members) + 400 singletons — both strata present
    val assign = ((0L until 600L).map(i => (i, i / 3)) ++
      (600L until 1000L).map(i => (i, i + 10000L))).toDF("id", "cluster")
    val s1 = Splits.stratifiedSplit(assign, 60, 20, seed = 42L)
    val s2 = Splits.stratifiedSplit(assign, 60, 20, seed = 42L)
    assert(s1.collect().toSet == s2.collect().toSet, "deterministic")
    assert(Splits.splitsDisjoint(s1))
    // no cluster straddles splits
    val straddle = s1.groupBy("cluster").agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count()
    assert(straddle == 0)
    // truly stratified: EXACT 60/20/20 cluster proportions inside each
    // stratum (singleton clusters vs plural), the reference's contract
    // (utils.py:92-117) — not just proportional in expectation
    val strata = s1.groupBy("cluster", "split").count()
      .withColumn("stratum", when($"cluster" >= 10000L, "singleton").otherwise("plural"))
      .groupBy("stratum", "split").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(strata(("singleton", "train")) == 240 && strata(("singleton", "valid")) == 80
      && strata(("singleton", "test")) == 80, s"singleton stratum off: $strata")
    assert(strata(("plural", "train")) == 120 && strata(("plural", "valid")) == 40
      && strata(("plural", "test")) == 40, s"plural stratum off: $strata")
    // shuffle-free variant keeps the same invariants (approximate proportions)
    val h = Splits.hashSplit(assign, 60, 20, seed = 42L)
    assert(Splits.splitsDisjoint(h))
    assert(h.groupBy("cluster").agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count() == 0)
  }

  test("PairAlgebra golden fixture: cluster → 19-pair expansion (reference test_utils.py:192-222)") {
    val clusters = Map(
      1L -> Seq(1L, 2L, 3L), 4L -> Seq(4L, 5L), 6L -> Seq(6L, 7L, 8L, 9L, 10L),
      11L -> Seq(11L, 18L), 12L -> Seq(12L, 13L, 15L), 14L -> Seq(14L, 16L))
    val assign = clusters.toSeq.flatMap { case (c, ms) => ms.map(m => (m, c)) }
      .toDF("id", "cluster")
    val pairs = PairAlgebra.clusterToPairs(assign).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (6L, 10L), (7L, 8L), (7L, 9L), (7L, 10L),
      (8L, 9L), (8L, 10L), (9L, 10L), (11L, 18L),
      (12L, 13L), (12L, 15L), (13L, 15L), (14L, 16L))
    assert(pairs == expected)
    assert(pairs.size == 19)
  }

  test("Metrics: precision 0 when no TP; f1 0 when both 0 (evaluation.py:9-30)") {
    val found = Seq((1L, 2L)).toDF("id1", "id2")
    val pos = Seq((3L, 4L)).toDF("id1", "id2")
    val m = Metrics.evaluate(found, pos, nRecords = 4, threshold = 0.5)
    assert(m.precision == 0.0 && m.recall == 0.0 && m.f1 == 0.0)
    assert(Metrics.f1(0.0, 0.0) == 0.0)
    val m2 = Metrics.evaluate(found, found, nRecords = 4, threshold = 0.5)
    assert(m2.precision == 1.0 && m2.recall == 1.0 && m2.f1 == 1.0)
    assert(m2.pairEntityRatio == 0.25)
  }

  test("Metrics.sweep cumulates correctly in one pass") {
    val scored = Seq((1L, 2L, 0.9), (3L, 4L, 0.6), (5L, 6L, 0.3))
      .toDF("id1", "id2", "jaccard")
    val pos = Seq((1L, 2L), (5L, 6L), (7L, 8L)).toDF("id1", "id2")
    val ms = Metrics.sweep(scored, pos, nRecords = 8, thresholds = Seq(0.3, 0.5, 0.7))
    assert(ms.map(_.foundPairs) == Seq(3L, 2L, 1L))
    assert(ms.map(_.truePositives) == Seq(2L, 1L, 1L))
    assert(ms.map(_.recall) == Seq(2.0 / 3, 1.0 / 3, 1.0 / 3))
  }
}
