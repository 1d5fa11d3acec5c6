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
   * assignments(id, cluster) → (id, cluster, split) with split ∈
   * {train, valid, test} in the given proportions per stratum.
   */
  def stratifiedSplit(assignments: DataFrame, trainPct: Int, validPct: Int,
      seed: Long): DataFrame = {
    require(trainPct + validPct <= 100)
    val sizes = assignments.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val bucketed = sizes.withColumn("bucket",
      pmod(xxhash64(col("cluster"), lit(seed)), lit(100)))
    val labeled = bucketed.withColumn("split",
      when(col("bucket") < trainPct, "train")
        .when(col("bucket") < trainPct + validPct, "valid")
        .otherwise("test"))
      .select(col("cluster"), col("split"))
    assignments.join(labeled, "cluster")
      .select(col("id"), col("cluster"), col("split"))
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
