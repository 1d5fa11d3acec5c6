package graft.operators

import graft.config.GraftConfig
import graft.functions.{SuffixArrays, TextSignatures}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Suffix-array substring stage (north-rule addition): find pairs of
 * documents sharing an EXACT common substring of length >= cfg.minSpanLen,
 * with the span length — catches boilerplate/quotation overlap that
 * set-based Jaccard dilutes away on long documents.
 *
 * Distributed shape: winnowing fingerprints (TextSignatures.winnow) guarantee
 * any common substring of length >= winnowWindow + spanGramLen - 1 ==
 * minSpanLen shares a selected fingerprint, so docs are exploded by
 * fingerprint, co-shuffled into fingerprint groups (each group small — the
 * fingerprint is 64-bit content-derived), and a per-group suffix array
 * (prefix-doubling + Kasai, graft.functions.SuffixArrays) recovers exact
 * span lengths. Pairs found via several fingerprints are max-merged.
 *
 * This is the one operator where built-in Spark relational ops genuinely
 * cannot express the semantics (exact common-substring extents), so the
 * per-group kernel runs in flatMapGroups over a typed Dataset — the
 * documented (SURVEY.md §4) "mapPartitions-style last resort", still fully
 * distributed and shuffle-planned by Catalyst.
 */
object SuffixSpans {

  final case class SpanRow(id1: Long, id2: Long, span_len: Int)

  /**
   * docs(id, text) → (id1, id2, span_len) for every pair sharing an exact
   * normalized substring >= cfg.minSpanLen. groupCap bounds degenerate
   * fingerprint groups (identical boilerplate across millions of pages):
   * larger groups are truncated to the first groupCap members by id
   * (deterministic) — star-connectivity for those is still provided by the
   * MinHash stage; truncation is logged by the caller via group sizes.
   */
  def spans(docs: DataFrame, cfg: GraftConfig, groupCap: Int = 64,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val winnowUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else TextSignatures.winnow(TextSignatures.normalize(text),
        cfg.spanGramLen, cfg.winnowWindow)
    }
    val normUdf = udf { (text: String) =>
      if (text == null) "" else new String(TextSignatures.normalize(text))
    }

    val exploded = docs
      .select(col(idCol).cast("long").as("id"), normUdf(col(textCol)).as("ntext"),
        explode(winnowUdf(col(textCol))).as("bucket"))

    val grouped: Dataset[SpanRow] = exploded
      .select(col("bucket"), col("id"), col("ntext"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.map(t => (t._2, t._3)).toArray.sortBy(_._1).distinct.take(groupCap)
        SuffixArrays.dupSpans(members.toSeq, cfg.minSpanLen)
          .iterator.map(p => SpanRow(p.id1, p.id2, p.spanLen))
      }

    grouped.toDF()
      .groupBy("id1", "id2")
      .agg(max("span_len").as("span_len"))
  }
}
