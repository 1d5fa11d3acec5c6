package graft.operators

import graft.config.GraftConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deduplication operator family for training-data pipelines, over any
 * (id, text) table. Exact dedup is a hash aggregation; the near-dup variants
 * reuse the blocking stages (CandidateGen) at document granularity.
 */
object Dedup {

  /**
   * Exact duplicate groups: one row per text value occurring > 1 time, with
   * the canonical (minimum) id and the duplicate count. Scale note: grouping
   * by xxhash64(text) instead of the full text keeps shuffle payload at 8
   * bytes/row; the full-text groupBy here is the oracle-friendly exact form
   * and Catalyst still map-side-combines it.
   */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .select(col("canonical_id"), col("dup_count"))

  /** Exact duplicate pairs (id1 < id2), scale form: the self-join moves
    * only (id, xxhash64(text), length(text)) — 24 bytes/row — through the
    * exchange; full text is compared ONLY for hash+length-colliding
    * candidate pairs (≈ true dups + ~0 64-bit collisions) via id-keyed
    * joins whose probe side is the tiny candidate set (AQE broadcasts it,
    * so the text column never enters an exchange at all on the common
    * path). Result identical to a full-text self-join. */
  def exactDupPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val h = docs.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("h"), length(col(textCol)).as("len"))
    val cand = h.as("a").join(h.as("b"),
        col("a.h") === col("b.h") && col("a.len") === col("b.len")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    val t = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand
      .join(t.select(col("id").as("id1"), col("t").as("t1")), "id1")
      .join(t.select(col("id").as("id2"), col("t").as("t2")), "id2")
      .filter(col("t1") === col("t2"))
      .select(col("id1"), col("id2"))
  }

  /**
   * Word-token n-gram Jaccard near-dup pairs — EXACT (same result set as a
   * brute-force all-pairs compare, which the DuckDB oracle still uses), but
   * executed as a prefix-filter set-similarity equi-join (SetSimJoin:
   * AllPairs/PPJoin), so it is sub-quadratic and shuffle-partitionable at
   * web scale instead of a cartesian product.
   */
  def tokenJaccardPairs(docs: DataFrame, threshold: Double, ngram: Int = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    ConfScope.smallInputScope(docs.sparkSession, docs) {
    // n-gram identity = hash of the n consecutive TOKEN HASHES, not of the
    // joined string: set counts are unchanged (modulo 64-bit collisions, the
    // engine-wide convention), and the projection is O(tokens) — the
    // string-concat form (slice + concat_ws per position) copied O(tokens²)
    // chars per document and was the hottest expression in the whole join.
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val th = docs.select(col(idCol).as("id"),
      transform(toks, t => xxhash64(t)).as("th"))
    val grams =
      if (ngram == 1) array_distinct(col("th"))
      else when(size(col("th")) >= ngram,
        array_distinct(transform(
          sequence(lit(1), size(col("th")) - (ngram - 1)),
          i => xxhash64((0 until ngram).map(j => element_at(col("th"), i + j)): _*))))
        .otherwise(array().cast("array<long>"))
    val d = th.select(col("id"), grams.as("g"))
    SetSimJoin.jaccardSelfJoin(d, threshold)
    }

  /** MinHash+LSH near-dup pairs over any (id, text) table — the scale path. */
  def minhashDupPairs(docs: DataFrame, cfg: GraftConfig,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    ConfScope.smallInputScope(docs.sparkSession, docs) {
    // persisted: consumed by the banding stage and twice by the verify
    // joins; narrow bundle (no shingle arrays — exact verify recomputes
    // from text, bitwise-identical)
    val sigs = Signatures.compute(docs, cfg, idCol, textCol, emitShingles = false,
        parts = graft.functions.TextSignatures.SigParts.minhashOnly)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = CandidateGen.minhashStage(sigs, cfg)
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val out = JaccardVerify.verify(cands.candidates, sigs, cfg, texts = Some(texts))
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      // eager: release the signature cache instead of leaking it (see
      // SetSimJoin.jaccardSelfJoin)
      .localCheckpoint()
    sigs.unpersist()
    out
    }

  /** SimHash Hamming-ball near-dup pairs (token-level semantic near-dup). */
  def simhashDupPairs(docs: DataFrame, cfg: GraftConfig,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = Signatures.compute(docs, cfg, idCol, textCol, emitShingles = false,
      parts = graft.functions.TextSignatures.SigParts.simhashOnly)
    val cands = CandidateGen.simhashStage(sigs, cfg)
    val fp = sigs.select(col("id"), col("simhash"))
    cands.candidates
      .join(fp.select(col("id").as("id1"), col("simhash").as("sh1")), "id1")
      .join(fp.select(col("id").as("id2"), col("simhash").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
  }

  /**
   * Embedding-cosine near-dup pairs over an (id, embedding Array[Float])
   * table: brute-force O(n²) with the dot product expressed via
   * zip_with + aggregate (no UDF; stays in codegen). Scale path = Ann.lsh.
   */
  def embeddingCosinePairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dot = graft.expressions.SimilarityExpressions.dotProduct _
    val e = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine",
        dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(col("cosine"), 6).as("cosine"))
  }
}
