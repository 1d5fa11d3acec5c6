package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared candidate-pair machinery for every blocking stage: given a table of
 * (id, bucket) memberships, produce canonical candidate pairs (id1 < id2,
 * reference invariant entity_embed/indexes.py:58-60).
 *
 * Scale design (the engine's one wide exchange, SURVEY.md §4):
 *  - ONE shuffle keyed by bucket computes per-bucket count + min(id);
 *  - normal buckets (size <= cap) self-join on the bucket key — the join
 *    reuses the bucket partitioning, and output volume is bounded by
 *    cap^2/2 per bucket (AQE skew-join splits anything moderately hot);
 *  - oversize buckets (boilerplate/empty-ish content at web scale can put
 *    millions of pages in one bucket) would emit O(n^2) pairs and OOM any
 *    executor. They degrade to STAR pairs around the bucket's min id:
 *    n-1 pairs, computed with a plain join — never a collect_list, so no
 *    single-bucket memory hot spot. Star preserves connectivity for
 *    clustering; pairs that fail verification through the hub are a logged,
 *    recall-accounted tradeoff (no silent caps — see oversizeLog).
 */
object BucketJoin {

  final case class Result(pairs: DataFrame, oversizeLog: DataFrame)

  /**
   * memberships: DataFrame(id: Long, bucket: Long). Returns distinct
   * candidate pairs (id1 < id2) + a log of capped buckets.
   */
  def pairs(memberships: DataFrame, cap: Int, stage: String): Result = {
    val m = memberships.select(col("id").cast("long"), col("bucket").cast("long"))
    val stats = m.groupBy("bucket")
      .agg(count(lit(1)).as("bucket_n"), min("id").as("bucket_min"))

    val joined = m.join(stats, "bucket")

    val small = joined.filter(col("bucket_n") <= cap)
    val smallPairs = small.as("a")
      .join(small.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))

    val big = joined.filter(col("bucket_n") > cap)
    val starPairs = big.filter(col("id") =!= col("bucket_min"))
      .select(col("bucket_min").as("id1"), col("id").as("id2"))

    val oversizeLog = stats.filter(col("bucket_n") > cap)
      .select(lit(stage).as("stage"), col("bucket"), col("bucket_n"))

    Result(smallPairs.union(starPairs).distinct(), oversizeLog)
  }
}
