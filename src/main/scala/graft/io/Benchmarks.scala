package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark-dataset loader shape (reference: the 9 Deepmatcher loaders,
 * entity_embed/benchmarks/base.py:93-128 + subclasses): a per-dataset
 * config record over the existing scan primitives (PairIO) instead of one
 * subclass per dataset.
 *
 * A Deepmatcher-style dataset is two record tables (tableA/tableB CSVs, an
 * `id` column each) plus labeled pair splits (train/valid/test CSVs of
 * (ltable_id, rtable_id, label)). The reference renumbers both tables into
 * one global id space with its Enumerator (base.py:107); here ids are made
 * globally unique by offsetting the right table by `rightIdOffset`
 * (default: 1 + max left id — deterministic, no global sort), and the same
 * offset is applied to the pair files' rtable ids.
 */
object Benchmarks {

  /** One dataset = paths + column conventions. `unlabeled` datasets (dedup
    * corpora with a cluster column) set `clusterField` instead of pairs. */
  final case class DatasetConfig(
      name: String,
      tableA: String,
      tableB: Option[String] = None,
      trainPairs: Option[String] = None,
      validPairs: Option[String] = None,
      testPairs: Option[String] = None,
      clusterField: Option[String] = None,
      rightIdOffset: Option[Long] = None)

  final case class LabeledSplit(pos: DataFrame, neg: DataFrame)

  final case class Dataset(
      records: DataFrame, // one table, `source` column when two-source
      train: Option[LabeledSplit],
      valid: Option[LabeledSplit],
      test: Option[LabeledSplit],
      rightIdOffset: Long)

  /** Load per the config: records unioned + tagged (S2), ids globally
    * unique, labeled pair splits (S3) renumbered into the same id space. */
  def load(spark: SparkSession, cfg: DatasetConfig): Dataset = {
    val left = PairIO.readRecords(spark, cfg.tableA, cfg.clusterField)
    cfg.tableB match {
      case None =>
        // single-table dataset: labeled pairs (if any) are same-table —
        // loaded unshifted (offset 0), never silently discarded
        def split0(p: Option[String]): Option[LabeledSplit] = p.map { path =>
          val (pos, neg) = PairIO.readLabeledPairs(spark, path)
          LabeledSplit(pos, neg)
        }
        Dataset(left, split0(cfg.trainPairs), split0(cfg.validPairs),
          split0(cfg.testPairs), 0L)
      case Some(bPath) =>
        val rightRaw = PairIO.readRecords(spark, bPath, cfg.clusterField)
        val offset = cfg.rightIdOffset.getOrElse(
          left.agg(coalesce(max("id"), lit(-1L))).head().getLong(0) + 1L)
        val right = rightRaw.withColumn("id", col("id") + offset)
        val records = PairIO.unionTagged(left, right, "left", "right")
        def split(p: Option[String]): Option[LabeledSplit] = p.map { path =>
          val (pos, neg) = PairIO.readLabeledPairs(spark, path)
          def shift(df: DataFrame) =
            df.withColumn("id2", col("id2") + offset)
          LabeledSplit(shift(pos), shift(neg))
        }
        Dataset(records, split(cfg.trainPairs), split(cfg.validPairs),
          split(cfg.testPairs), offset)
    }
  }
}
