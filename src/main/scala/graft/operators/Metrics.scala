package graft.operators

import graft.model.PairMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocking-quality metrics, semantics pinned to the reference
 * (entity_embed/evaluation.py):
 *   - pair_entity_ratio = |found| / |records|            (evaluation.py:5-6)
 *   - precision = TP/|found|, 0.0 when TP = 0            (evaluation.py:9-23)
 *   - recall    = TP/|pos|
 *   - f1        = harmonic mean, 0 when both are 0       (evaluation.py:26-30)
 *   - threshold sweep over sim thresholds                (entity_embed.py:355-385)
 *
 * The sweep computes the scored-pair table ONCE and cumulates counts per
 * threshold bucket in a single aggregation pass — the reference re-searches
 * the ANN index per threshold; we don't re-shuffle per threshold.
 */
object Metrics {

  final case class Counts(tp: Long, found: Long, pos: Long)

  def precision(tp: Long, found: Long): Double =
    if (tp == 0L) 0.0 else tp.toDouble / found

  def recall(tp: Long, pos: Long): Double =
    if (pos == 0L) 0.0 else tp.toDouble / pos

  def f1(p: Double, r: Double): Double =
    if (p + r == 0.0) 0.0 else 2 * p * r / (p + r)

  def pairEntityRatio(found: Long, records: Long): Double =
    if (records == 0L) 0.0 else found.toDouble / records

  /** One metrics row at one threshold (pairs already filtered). */
  def evaluate(found: DataFrame, pos: DataFrame, nRecords: Long,
      threshold: Double): PairMetrics = {
    val tp = PairAlgebra.truePositives(found, pos).count()
    val nFound = found.count()
    val nPos = pos.count()
    val p = precision(tp, nFound)
    val r = recall(tp, nPos)
    PairMetrics(threshold, tp, nFound, nPos, p, r, f1(p, r),
      pairEntityRatio(nFound, nRecords))
  }

  /**
   * Threshold sweep (M4) in ONE pass: label every scored pair with whether
   * it is a true positive, then for each threshold count pairs/TPs with
   * jaccard >= t via conditional aggregation — no per-threshold jobs.
   * scored: (id1, id2, jaccard); pos: ground-truth pairs.
   */
  def sweep(scored: DataFrame, pos: DataFrame, nRecords: Long,
      thresholds: Seq[Double]): Seq[PairMetrics] = {
    val nPos = pos.count()
    val labeled = scored.join(
        pos.select(col("id1"), col("id2")).withColumn("is_tp", lit(1L)),
        Seq("id1", "id2"), "left")
      .withColumn("is_tp", coalesce(col("is_tp"), lit(0L)))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"found_$i"),
        sum(when(col("jaccard") >= t, col("is_tp")).otherwise(0L)).as(s"tp_$i"))
    }
    val row = labeled.agg(aggs.head, aggs.tail: _*).head()
    thresholds.zipWithIndex.map { case (t, i) =>
      val found = if (row.isNullAt(row.fieldIndex(s"found_$i"))) 0L
        else row.getLong(row.fieldIndex(s"found_$i"))
      val tp = if (row.isNullAt(row.fieldIndex(s"tp_$i"))) 0L
        else row.getLong(row.fieldIndex(s"tp_$i"))
      val p = precision(tp, found)
      val r = recall(tp, nPos)
      PairMetrics(t, tp, found, nPos, p, r, f1(p, r), pairEntityRatio(found, nRecords))
    }
  }
}
