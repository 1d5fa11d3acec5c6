package graft

import graft.config.GraftConfig
import graft.corpus.PageCorpus
import graft.operators._
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  val cfg: GraftConfig = GraftConfig.default

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /**
   * Flagship query on sf=0.001 (driver smoke-checks rows > 0): the full
   * near-duplicate pipeline — signatures → 3-stage blocking → Jaccard verify
   * → connected components → cluster assignment — over the deterministic
   * synthetic web-page corpus (BASELINE.json::input_hint shape), one row per
   * page with its cluster id.
   */
  def entry(spark: SparkSession): DataFrame = {
    val (pages, _) = PageCorpus.generate(spark, 2000, cfg.seed)
    val result = new DedupPipeline(spark, cfg).run(pages.toDF())
    Clustering.writeback(pages.toDF().select("id", "url", "lang"), result.assignments)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship (non-SQL): full dedup pipeline over the page corpus.
    "q_pipeline_clusters" -> ((s, _) => {
      val (pages, _) = PageCorpus.generate(s, 2000, cfg.seed)
      new DedupPipeline(s, cfg).run(pages.toDF()).assignments
        .orderBy("id")
    }),
    // A3: group records by cluster — members sorted ascending.
    "q_cluster_members" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("label").cast("long").as("cluster"))
      Clustering.clusterMembers(emb)
        .select(col("cluster"), col("members"))
    }),
    // A4: cluster → intra-cluster pair expansion (id1 < id2).
    "q_cluster_pairs" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("label").cast("long").as("cluster"))
      PairAlgebra.clusterToPairs(emb)
    }),
    // A5: Σ n(n-1)/2 pair count.
    "q_cluster_pair_count" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("label").cast("long").as("cluster"))
      PairAlgebra.clusterPairCount(emb)
    })
  )

  /** DuckDB-equivalent SQL per query (driver correctness gate). */
  def oracleSql: Map[String, String] = Map(
    "q_cluster_members" ->
      ("SELECT CAST(label AS BIGINT) AS cluster, list_sort(list(vec_id)) AS members " +
        "FROM embeddings GROUP BY label"),
    "q_cluster_pairs" ->
      ("SELECT a.vec_id AS id1, b.vec_id AS id2 FROM embeddings a " +
        "JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id"),
    "q_cluster_pair_count" ->
      ("SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS total_pairs FROM " +
        "(SELECT count(*) AS n FROM embeddings GROUP BY label)")
  )
}
