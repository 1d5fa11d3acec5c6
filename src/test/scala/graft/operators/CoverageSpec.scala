package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic specs for the small operators the round-1 audit flagged as
  * implemented-but-untested: A6 source partition, W2 top clusters, SET1
  * universe restriction, SP2 split filter, SP3 enumerator. */
class CoverageSpec extends SparkSuite {
  import spark.implicits._

  test("A6: clusterToLinkagePairs partitions by source and orients (left, right)") {
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L))
      .toDF("id", "cluster")
    val src = Seq((1L, "l"), (2L, "r"), (3L, "r"), (4L, "l"), (5L, "l"))
      .toDF("id", "source")
    val got = PairAlgebra.clusterToLinkagePairs(assign, src, "l")
      .as[(Long, Long)].collect().toSet
    // cluster 10: left {1} × right {2,3}; cluster 20: left {4,5} × right {} = ∅
    assert(got == Set((1L, 2L), (1L, 3L)))
  }

  test("W2: topClusters returns N largest with deterministic tie-break") {
    val assign = (Seq.fill(5)(100L) ++ Seq.fill(5)(200L) ++ Seq.fill(2)(300L))
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("id", "cluster")
    val got = Clustering.topClusters(assign, 2).select("cluster", "size")
      .as[(Long, Long)].collect().toSeq
    // two size-5 clusters tie → ordered by min member id (100's ids are lower)
    assert(got == Seq((100L, 5L), (200L, 5L)))
  }

  test("SET1: restrictToUniverse keeps only labeled pairs") {
    val found = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    val pos = Seq((1L, 2L)).toDF("id1", "id2")
    val neg = Seq((5L, 6L)).toDF("id1", "id2")
    val got = PairAlgebra.restrictToUniverse(found, pos, neg)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (5L, 6L))) // (3,4) is unlabeled → dropped
  }

  test("SP2: filterBySplit keeps only the requested split's records") {
    val records = (1L to 6L).map(i => (i, s"t$i")).toDF("id", "text")
    val assign = Seq((1L, 1L, "train"), (2L, 1L, "train"), (3L, 2L, "test"),
      (4L, 2L, "test"), (5L, 3L, "valid"), (6L, 3L, "valid"))
      .toDF("id", "cluster", "split")
    val got = Splits.filterBySplit(records, assign, "test")
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 4L))
  }

  test("SP3: enumerate assigns dense stable ids by natural key order") {
    val df = Seq("delta", "alpha", "charlie", "bravo").toDF("name")
    val got = Splits.enumerate(df, "name").select("name", "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map("alpha" -> 0L, "bravo" -> 1L, "charlie" -> 2L, "delta" -> 3L))
  }

  test("Column-level tokenizer injection: stats jobs accept any tokenizer") {
    import spark.implicits._
    val d = Seq((1L, "aa bb-cc"), (2L, "bb dd")).toDF("id", "text")
    // default whitespace: tokens aa, bb-cc, bb, dd
    val defVocab = StatsJobs.vocabCount(d, "text")
      .collect().map(_.getString(0)).toSet
    assert(defVocab == Set("aa", "bb-cc", "bb", "dd"))
    // injected tokenizer: split on non-letters (the reference's pluggable
    // tokenizer reaching the stats pass, utils.py:179/203)
    val injected = StatsJobs.vocabCount(d, "text",
      c => split(lower(c), "[^a-z]+"))
      .collect().map(_.getString(0)).toSet
    assert(injected == Set("aa", "bb", "cc", "dd"))
    val msl = StatsJobs.maxStrLen(d, "text", multitoken = true,
      c => split(c, "[^a-zA-Z]+")).head().getLong(0)
    assert(msl == 2)
    // pair features take the same injection point
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val feat = PairFeatures.enrich(pairs, d, tokenizer = c => split(lower(c), "[^a-z]+"))
      .head()
    // tokens {aa,bb,cc} vs {bb,dd}: jaccard 1/4
    assert(feat.getAs[Double]("token_jaccard") == 0.25)
  }
}
