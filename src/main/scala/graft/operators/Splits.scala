package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cluster-level stratified train/valid/test splitting, semantics pinned to
 * the reference (entity_embed/data_utils/utils.py:76-158 `split_clusters`):
 * the split is over CLUSTER ids (never records, so no cluster straddles two
 * splits), stratified singleton-vs-plural, seeded and deterministic.
 *
 * RNG difference (documented in SURVEY.md SP1): the reference uses Python's
 * `random.Random(seed).sample`; reproducing CPython's Mersenne-Twister
 * sampling is a non-goal — we use a deterministic hash bucket
 * pmod(xxhash64(cluster, seed), 100) < proportions, which has the same
 * contract (cluster-level, stratified, seeded, reproducible) and is
 * shuffle-free at any scale.
 */
object Splits {

  /**
   * assignments(id, cluster) → (id, cluster, split), truly STRATIFIED like
   * the reference: within each stratum (singleton clusters vs plural
   * clusters, utils.py:92-117) clusters are ranked by a seeded hash — a
   * deterministic pseudo-random permutation — and the first trainPct% go to
   * train, the next validPct% to valid, the rest to test. Proportions are
   * exact per stratum (±1 cluster), not just in expectation.
   *
   * Scale note: the per-stratum ranking is a window over one row per
   * CLUSTER (2 strata) — at 10^11 clusters use hashSplit below, which is
   * shuffle-free and proportional in expectation only.
   */
  def stratifiedSplit(assignments: DataFrame, trainPct: Int, validPct: Int,
      seed: Long): DataFrame = {
    require(trainPct + validPct <= 100)
    val sizes = assignments.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val strata = sizes.withColumn("stratum",
      when(col("cluster_size") === 1, "singleton").otherwise("plural"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(xxhash64(col("cluster"), lit(seed)), col("cluster"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("stratum")
    val labeled = strata
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("rk") * 100 <= col("n") * trainPct, "train")
          .when(col("rk") * 100 <= col("n") * (trainPct + validPct), "valid")
          .otherwise("test"))
      .select(col("cluster"), col("split"))
    assignments.join(labeled, "cluster")
      .select(col("id"), col("cluster"), col("split"))
  }

  /**
   * Shuffle-free cluster-level split for web scale: seeded hash bucket per
   * cluster, proportional in expectation (law of large numbers makes the
   * error negligible at 10^9+ clusters). No aggregation, no window — the
   * label is a pure projection over the assignment row.
   */
  def hashSplit(assignments: DataFrame, trainPct: Int, validPct: Int,
      seed: Long): DataFrame = {
    require(trainPct + validPct <= 100)
    val bucket = pmod(xxhash64(col("cluster"), lit(seed)), lit(100))
    assignments.select(col("id"), col("cluster"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test").as("split"))
  }

  /** Keep records whose cluster landed in `split` (SP2, utils.py:161-176). */
  def filterBySplit(records: DataFrame, splitAssign: DataFrame, split: String): DataFrame =
    records.join(
      splitAssign.filter(col("split") === split).select("id"), Seq("id"), "left_semi")

  /**
   * Split-disjointness check (SET4, data_modules.py:16-38): true iff no id
   * appears in two different splits.
   */
  def splitsDisjoint(splitAssign: DataFrame): Boolean =
    splitAssign.groupBy("id").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).limit(1).count() == 0

  /**
   * Stable dense id assignment for a string key (SP3 Enumerator,
   * utils.py:13-14): rank over the natural key. A narrow global sort — fine
   * at fixture scale; at 10^12 rows use the key's 64/128-bit hash instead
   * (documented tradeoff, SURVEY.md SP3).
   */
  def enumerate(df: DataFrame, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(keyCol))
    df.withColumn("id", row_number().over(w).cast("long") - 1)
  }
}
