package graft.operators

import graft.config.GraftConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Record-linkage mode (reference: ANNLinkageIndex,
 * entity_embed/indexes.py:85-140; API entity_embed.py:536-582): two tagged
 * sources, only cross-source pairs, output ordered (leftId, rightId)
 * regardless of id magnitude (indexes.py:123-130).
 *
 * Where the reference needs TWO HNSW indexes searched bidirectionally
 * (k-NN is asymmetric), a relational equi-join on band keys is symmetric by
 * construction — one join, both directions covered (SURVEY.md J3).
 *
 * Ids must be globally unique across both sources (the reference renumbers
 * with its Enumerator, benchmarks/base.py:107; use Splits.enumerate).
 */
object Linkage {

  /**
   * records(id, text, source) → verified cross-source pairs
   * (left_id, right_id, jaccard).
   */
  def linkagePairs(records: DataFrame, cfg: GraftConfig, leftSource: String,
      idCol: String = "id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    ConfScope.smallInputScope(records.sparkSession, records) {
    val src = records.select(col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"))
    val sigsCached = Signatures.compute(records, cfg, idCol, textCol, emitShingles = false)
      .join(src, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // lineage-cut after persist: blocking + verify re-analyze this subtree
    // per consumer otherwise (GraftSqlBridge.truncateLineage scaladoc)
    val sigs = org.apache.spark.sql.GraftSqlBridge.truncateLineageLocal(sigsCached)
    // source-disjointness evaluated INSIDE the bucket join (pairFilter hook):
    // intra-source collisions — ~half of all pairs on balanced sources —
    // never reach the pair exchange or the verify stage. Star pairs from
    // oversize buckets bypass the filter, so the post-verify source filter
    // below stays as the correctness guarantee.
    val crossSource: CandidateGen.PairFilter = (a, b) =>
      col(s"$a.source") =!= col(s"$b.source")
    val cands = CandidateGen.all(sigs, cfg,
      extra = Seq("source"), pairFilter = Some(crossSource)).candidates
    val texts = records.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    val verified = JaccardVerify.verify(cands, sigs, cfg, texts = Some(texts))
    val out = verified
      .join(src.select(col("id").as("id1"), col("source").as("src1")), "id1")
      .join(src.select(col("id").as("id2"), col("source").as("src2")), "id2")
      .filter(col("src1") =!= col("src2"))
      .filter(col("src1") === leftSource || col("src2") === leftSource)
      .select(
        when(col("src1") === leftSource, col("id1")).otherwise(col("id2")).as("left_id"),
        when(col("src1") === leftSource, col("id2")).otherwise(col("id1")).as("right_id"),
        col("jaccard"))
      .filter(col("left_id").isNotNull && col("right_id").isNotNull)
      // eager: release the signature cache instead of leaking it (see
      // SetSimJoin.jaccardSelfJoin)
      .localCheckpoint()
    sigsCached.unpersist()
    out
    }
}
