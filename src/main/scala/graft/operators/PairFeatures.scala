package graft.operators

import graft.functions.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Post-blocking pair enrichment (reference J5: the notebook `compare_pairs` /
 * SIM_FUNC_DICT stage, End-to-End-Matching-Example.ipynb cells 30-43):
 * for each candidate pair fetch both records and compute similarity
 * features — token jaccard, overlap coefficient, normalized Levenshtein.
 * All built-ins (levenshtein is a native Catalyst expression).
 */
object PairFeatures {

  /**
   * pairs(id1, id2) x docs(id, text) → pair feature table. Two pair-keyed
   * equi-joins (uniform keys); at scale the docs side is the big one — the
   * joins shuffle by id which is the layout the verify stage already used.
   */
  def enrich(pairs: DataFrame, docs: DataFrame,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val toks = (c: org.apache.spark.sql.Column) => array_distinct(Tokenize.default(c))
    pairs.select(col("id1"), col("id2"))
      .join(d.select(col("id").as("id1"), col("t").as("t1")), "id1")
      .join(d.select(col("id").as("id2"), col("t").as("t2")), "id2")
      .withColumn("tok1", toks(col("t1")))
      .withColumn("tok2", toks(col("t2")))
      .select(
        col("id1"), col("id2"),
        round(size(array_intersect(col("tok1"), col("tok2"))).cast("double") /
          greatest(size(array_union(col("tok1"), col("tok2"))), lit(1)), 6)
          .as("token_jaccard"),
        round(size(array_intersect(col("tok1"), col("tok2"))).cast("double") /
          greatest(least(size(col("tok1")), size(col("tok2"))), lit(1)), 6)
          .as("overlap_coef"),
        round(lit(1.0) - levenshtein(col("t1"), col("t2")).cast("double") /
          greatest(length(col("t1")), length(col("t2")), lit(1)), 6)
          .as("levenshtein_sim"))
  }

  /**
   * W1 pair cap (reference ann_k, entity_embed/indexes.py:43-48): keep at
   * most k best-scoring partners per record — bounds pair-entity ratio
   * exactly like the reference's k-NN k. Applied symmetrically: a pair
   * survives if it is within the top-k of EITHER endpoint (HNSW semantics:
   * found-by-either-side).
   */
  def capPairsPerRecord(scored: DataFrame, k: Int,
      scoreCol: String = "jaccard"): DataFrame = {
    val both = scored.select(col("id1").as("anchor"), col("id2").as("partner"),
        col(scoreCol).as("s"))
      .union(scored.select(col("id2"), col("id1"), col(scoreCol)))
    val w = Window.partitionBy("anchor").orderBy(desc("s"), asc("partner"))
    val kept = both.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(
        least(col("anchor"), col("partner")).as("id1"),
        greatest(col("anchor"), col("partner")).as("id2"))
      .distinct()
    scored.join(kept, Seq("id1", "id2"), "left_semi")
  }
}
