package graft

import graft.config.GraftConfig
import graft.corpus.PageCorpus
import graft.operators._
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 * Every SURVEY.md §2 operator with a SQL-expressible semantic has a DuckDB
 * oracle entry; signature/LSH-based operators (non-SQL) are rows-only.
 */
object SparkEntry {

  val cfg: GraftConfig = GraftConfig.default

  /** Trigram-Jaccard near-dup threshold for the documents table: the data
    * has a wide empty margin between 0.12 and 0.25 (probed), so any value
    * inside is boundary-unambiguous for the float filter in both engines. */
  private val ngramThreshold = 0.2

  /** Input tables come through the TableIO seam (graft.io.TableIO): the
    * driver's sf dirs are path-per-table parquet; an Iceberg deployment
    * swaps the implementation without touching any query below. */
  private def tables(s: SparkSession, dir: String): graft.io.TableIO =
    new graft.io.ParquetTables(s, dir, suffix = ".parquet")
  private def docs(s: SparkSession, dir: String): DataFrame =
    tables(s, dir).read("documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    tables(s, dir).read("embeddings")
  private def labelClusters(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id").as("id"), col("label").cast("long").as("cluster"))

  /** Fixed aux dir: the synthetic corpus and per-query result mirrors are
    * materialized here so the driver's DuckDB oracle can read THE SAME BYTES
    * the Spark queries consumed (read_parquet over these paths in oracleSql). */
  val auxDir = "/root/repo/target/verify_aux"

  /** Session-scoped corpus cache: the corpus is generated deterministically
    * once per (session, n), written to parquet under auxDir (DuckDB oracle
    * input), and every consumer — Spark queries and the oracle alike — reads
    * it back from that parquet. */
  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), (DataFrame, DataFrame)]()
  private[graft] def corpus(s: SparkSession, n: Int = 2000): (DataFrame, DataFrame) = {
    // lazy reaping: entries of stopped sessions are dead weight (their
    // cached blocks died with the context) — drop them on every access so
    // no cached corpus outlives its session even without an explicit release
    val dead = corpusCache.keySet().iterator()
    while (dead.hasNext) if (dead.next()._1.sparkContext.isStopped) dead.remove()
    corpusCache.computeIfAbsent((s, n), { _ =>
      val (pages, truth) = PageCorpus.generate(s, n, cfg.seed)
      val pDir = s"$auxDir/corpus_pages_$n"
      val tDir = s"$auxDir/corpus_truth_$n"
      pages.toDF().write.mode("overwrite").parquet(pDir)
      truth.toDF().coalesce(1).write.mode("overwrite").parquet(tDir)
      (s.read.parquet(pDir).cache(), s.read.parquet(tDir).cache())
    })
  }

  /** Unpersist + evict THIS session's cached corpus entries — Verify/Bench
    * call it at teardown (the cache previously had no release path). */
  def releaseCorpus(s: SparkSession): Unit = {
    val it = corpusCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        if (!s.sparkContext.isStopped) {
          e.getValue._1.unpersist(); e.getValue._2.unpersist()
        }
        it.remove()
      }
    }
  }
  private[graft] def cachedCorpusCount(s: SparkSession): Int = {
    var n = 0
    corpusCache.keySet().forEach(k => if (k._1 eq s) n += 1)
    n
  }

  /**
   * Flagship query (driver smoke-checks rows > 0): the full near-duplicate
   * pipeline — signatures → 3-stage blocking (MinHash LSH + SimHash
   * Hamming-ball + winnowing substring) → exact-Jaccard verify → iterative
   * DataFrame connected components → cluster assignment — over the
   * deterministic synthetic web-page corpus (BASELINE.json::input_hint
   * shape), one row per page.
   */
  def entry(spark: SparkSession): DataFrame = {
    val (pages, _) = corpus(spark)
    val result = new DedupPipeline(spark, cfg).run(pages)
    Clustering.writeback(pages.select("id", "url", "lang"), result.assignments)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ===== flagship + signature stages (non-SQL; rows-only checks) =====
    "q_pipeline_clusters" -> ((s, _) => {
      val (pages, _) = corpus(s)
      new DedupPipeline(s, cfg).run(pages).assignments.orderBy("id")
    }),
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashDupPairs(docs(s, dir), cfg).orderBy("id1", "id2")),
    "q_simhash_fingerprints" -> ((s, dir) =>
      Signatures.compute(docs(s, dir), cfg, "doc_id", "text")
        .select(col("id"), col("simhash"), col("n_shingles"), col("n_tokens"))
        .orderBy("id")),
    "q_suffix_spans" -> ((s, _) => {
      val (pages, _) = corpus(s)
      SuffixSpans.spans(pages, cfg).orderBy("id1", "id2")
    }),
    "q_linkage_pairs" -> ((s, _) => {
      val (pages, _) = corpus(s)
      val tagged = pages.withColumn("source",
        when(pmod(col("id"), lit(2)) === 0, "left").otherwise("right"))
      Linkage.linkagePairs(tagged, cfg, "left")
        .select(col("left_id"), col("right_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("left_id", "right_id")
    }),
    "q_threshold_sweep" -> ((s, _) => {
      import s.implicits._
      val (pages, truth) = corpus(s)
      val sigs = Signatures.compute(pages, cfg, emitShingles = false)
      val cands = CandidateGen.all(sigs, cfg).candidates
      val scored = JaccardVerify.verify(cands, sigs,
        cfg.copy(simThreshold = 0.0), // score all candidates, sweep filters
        texts = Some(pages.select(col("id"), col("text"))))
      // materialize the scored intermediate so the DuckDB oracle can
      // recompute the sweep metrics from the exact same pair scores
      scored.select("id1", "id2", "jaccard")
        .write.mode("overwrite").parquet(s"$auxDir/scored_pairs")
      val scoredPq = s.read.parquet(s"$auxDir/scored_pairs")
      val pos = PairAlgebra.clusterToPairs(truth.select("id", "cluster"))
      s.createDataset(Metrics.sweep(scoredPq, pos, pages.count(), Seq(0.3, 0.5, 0.7)))
        .toDF()
    }),
    "q_multimodal_features" -> ((s, _) => {
      // oracle-comparable scalar columns only (md5 is replicable in DuckDB;
      // the StubCodec checksum/features stay covered by the sbt spec)
      val (pages, _) = corpus(s)
      val feats = Multimodal.extractFeatures(Multimodal.mediaFromPages(pages))
      val sums = pages.select(col("id").as("media_id"), md5(col("html")).as("payload_md5"))
      feats.join(sums, "media_id")
        .select(col("media_id"), col("kind"), col("n_bytes"), col("payload_md5"))
        .orderBy("media_id")
    }),
    "q_ann_lsh_top3" -> ((s, dir) =>
      Ann.lshTopK(emb(s, dir), 3, seed = cfg.seed).orderBy("id", "rank")),

    // ===== SQL-expressible operators (DuckDB oracle) =====
    "q_cluster_members" -> ((s, dir) =>
      // members emitted as a canonical comma-joined string: the driver's
      // pandas-based comparator cannot sort array-typed columns
      Clustering.clusterMembers(labelClusters(s, dir))
        .select(col("cluster"),
          array_join(transform(col("members"), _.cast("string")), ",").as("members"))),
    "q_cluster_pairs" -> ((s, dir) =>
      PairAlgebra.clusterToPairs(labelClusters(s, dir))),
    "q_cluster_pair_count" -> ((s, dir) =>
      PairAlgebra.clusterPairCount(labelClusters(s, dir))),
    "q_exact_dup_pairs" -> ((s, dir) =>
      Dedup.exactDupPairs(docs(s, dir)).orderBy("id1", "id2")),
    "q_ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.tokenJaccardPairs(docs(s, dir), ngramThreshold, ngram = 3)
        .orderBy("id1", "id2")),
    "q_cc_clusters" -> ((s, dir) => {
      val edges = Dedup.tokenJaccardPairs(docs(s, dir), ngramThreshold, ngram = 3)
      val comps = ConnectedComponents.components(edges.select("id1", "id2"))
      Clustering.assignAll(docs(s, dir).select(col("doc_id").as("id")),
        comps, normalizeIds = false).orderBy("id")
    }),
    "q_text_profile" -> ((s, dir) =>
      TextAnalysis.profile(docs(s, dir)).drop("fingerprint").orderBy("doc_id")),
    "q_vocab_count" -> ((s, dir) =>
      StatsJobs.vocabCount(docs(s, dir), "text").orderBy("token")),
    "q_max_str_len" -> ((s, dir) =>
      StatsJobs.maxStrLen(docs(s, dir), "text", multitoken = true)),
    "q_topk_per_lang" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(desc("n_chars"), asc("doc_id"))
      docs(s, dir).withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rank"))
        .orderBy("lang", "rank")
    }),
    "q_split_assign" -> ((s, dir) => {
      // oracle-parity variant: modulo bucket (the production path uses
      // xxhash64 buckets — same operator, injectable bucket fn; see Splits)
      val assign = labelClusters(s, dir)
      val sizes = assign.groupBy("cluster").agg(count(lit(1)).as("n"))
      val labeled = sizes.withColumn("bucket", pmod(col("cluster") + cfg.seed, lit(100)))
        .withColumn("split",
          when(col("bucket") < 60, "train")
            .when(col("bucket") < 80, "valid").otherwise("test"))
        .select("cluster", "split")
      assign.join(labeled, "cluster").select("id", "cluster", "split").orderBy("id")
    }),
    "q_metrics_pr" -> ((s, dir) => {
      val found = Dedup.tokenJaccardPairs(docs(s, dir), ngramThreshold, ngram = 3)
        .select("id1", "id2")
      val pos = PairAlgebra.clusterToPairs(labelClusters(s, dir))
      val nRec = docs(s, dir).count()
      val tp = PairAlgebra.truePositives(found, pos).count()
      val nF = found.count(); val nP = pos.count()
      val p = Metrics.precision(tp, nF); val r = Metrics.recall(tp, nP)
      import s.implicits._
      Seq((tp, nF, nP, p, r, Metrics.f1(p, r), Metrics.pairEntityRatio(nF, nRec)))
        .toDF("tp", "found", "pos", "precision", "recall", "f1", "pair_entity_ratio")
    }),
    "q_ann_top3" -> ((s, dir) =>
      Ann.bruteForceTopK(emb(s, dir), 3).orderBy("id", "rank")),
    "q_cosine_pairs" -> ((s, dir) =>
      Dedup.embeddingCosinePairs(emb(s, dir), 0.4).orderBy("id1", "id2")),
    "q_cosine_lsh_pairs" -> ((s, dir) =>
      Ann.lshCosinePairs(emb(s, dir), 0.4, seed = cfg.seed).orderBy("id1", "id2")),
    "q_pair_features" -> ((s, dir) => {
      val pairs = Dedup.tokenJaccardPairs(docs(s, dir), ngramThreshold, ngram = 3)
        .persist()
      val base = PairFeatures.enrich(pairs, docs(s, dir), "doc_id", "text")
      val tfidf = PairFeatures.tfidfCosine(pairs, docs(s, dir), "doc_id", "text")
      base.join(tfidf, Seq("id1", "id2")).orderBy("id1", "id2")
    }),
    "q_pair_cap" -> ((s, dir) => {
      val scored = Dedup.tokenJaccardPairs(docs(s, dir), 0.02, ngram = 3)
      PairFeatures.capPairsPerRecord(scored, 2).orderBy("id1", "id2")
    }),
    "q_multifield_pairs" -> ((s, dir) => {
      // multi-field ER (reference's core shape): derived title/body fields,
      // char-shingle title (fuzzy) + word-token body, 2:1 weighted score;
      // configs exercised through the JSON parser (S4). Threshold 0.6 sits
      // in the probed empty margin [0.516, 0.917] at sf0.01.
      val (recs, specs) = multifieldInput(s, dir)
      MultiField.dedupPairs(recs, specs, 0.6).orderBy("id1", "id2")
    }),
    "q_multifield_lsh_pairs" -> ((s, dir) => {
      // the 100 TB multi-field mode: per-field MinHash LSH OR-blocking →
      // exact weighted rescore (threshold-independent blocking cost)
      val (recs, specs) = multifieldInput(s, dir)
      MultiField.rescore(
        MultiField.lshCandidates(recs, specs, cfg).candidates, recs, specs, 0.6)
        .orderBy("id1", "id2")
    }),
    "q_multifield_linkage" -> ((s, dir) => {
      // multi-field record LINKAGE (reference Record-Linkage-Example shape):
      // same derived title/body fields, sources by id parity, oriented
      // (left_id, right_id) output — source-disjointness evaluated inside
      // each field's prefix-filter join
      val (recs, specs) = multifieldInput(s, dir)
      val tagged = recs.withColumn("source",
        when(pmod(col("id"), lit(2)) === 0, "left").otherwise("right"))
      MultiField.linkagePairs(tagged, specs, 0.6, "left")
        .orderBy("left_id", "right_id")
    })
  )

  /** Shared derived title/body input for the two multi-field queries. */
  private def multifieldInput(s: SparkSession, dir: String) = {
    val nt = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val recs = docs(s, dir).select(col("doc_id").as("id"),
      nt.substr(lit(1), lit(48)).as("title"),
      nt.substr(lit(49), length(nt)).as("body"))
    val specs = MultiField.parseConfigs(
      """{"title": {"sig_type": "syntactic", "weight": 2.0},
         "body": {"sig_type": "semantic", "weight": 1.0}}""")
    (recs, specs)
  }

  /** DuckDB-equivalent SQL per query (driver correctness gate).
    *
    * Two oracle families:
    *  - TWO-SIDED: the SQL recomputes the full result from base tables
    *    (documents/embeddings sf views, or the corpus parquet materialized
    *    under auxDir) — any Spark-side error, missing row or extra row is
    *    caught.
    *  - ONE-SIDED (marked below): for LSH/signature operators whose pair
    *    COVERAGE is probabilistic by design (recall gates live in the sbt
    *    specs against brute-force oracles), the SQL reads the emitted result
    *    (mirrored by Verify under auxDir/out), recomputes every checkable
    *    value column from base tables in DuckDB, and re-emits only rows
    *    passing all checks — a wrong jaccard/cosine/count/span in ANY row
    *    makes the row vanish and the compare go red. Each one-sided oracle
    *    ALSO emits a poison row when the mirrored result has fewer rows
    *    than a pinned floor for the deterministic sf0.01 corpus, so a
    *    silently-empty/shrunken Spark result can no longer compare green
    *    (vacuous-pass guard).
    */
  private val N = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private def shingleSql(src: String, idc: String): String =
    s"""SELECT $idc AS sid, list_distinct([substr(nt, i, 5)
        FOR i IN range(1, len(nt) - 3)]) s
        FROM (SELECT $idc, $N nt FROM $src) WHERE len(nt) >= 5"""

  def oracleSql: Map[String, String] = Map(
    "q_cluster_members" ->
      """SELECT CAST(label AS BIGINT) AS cluster,
           array_to_string(list_sort(list(vec_id)), ',') AS members
         FROM embeddings GROUP BY label""",
    // ONE-SIDED: every emitted near-dup pair's exact char-5-shingle Jaccard
    // is recomputed from `documents` and must equal the emitted value
    "q_minhash_pairs" ->
      s"""WITH sh AS (${shingleSql("documents", "doc_id")}),
          r AS (SELECT * FROM read_parquet('$auxDir/out/q_minhash_pairs/*.parquet'))
          SELECT r.id1, r.id2, r.jaccard FROM r
          JOIN sh a ON a.sid = r.id1 JOIN sh b ON b.sid = r.id2
          WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(a.s || b.s)), 6) = r.jaccard
            AND r.jaccard >= ${cfg.simThreshold}
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1.0::DOUBLE
            WHERE (SELECT count(*) FROM r) < 20
          ORDER BY 1, 2""",
    // ONE-SIDED: emitted n_shingles / n_tokens recomputed from `documents`
    // (simhash itself is pinned by determinism + Hamming specs in sbt)
    "q_simhash_fingerprints" ->
      s"""WITH m AS (SELECT doc_id,
            CASE WHEN len(nt) >= 5 THEN len(list_distinct(
              [substr(nt, i, 5) FOR i IN range(1, len(nt) - 3)])) ELSE 0 END ns,
            CASE WHEN len(nt) >= 5 THEN len(string_split(nt, ' ')) ELSE 0 END ntok
            FROM (SELECT doc_id, $N nt FROM documents)),
          r AS (SELECT * FROM read_parquet('$auxDir/out/q_simhash_fingerprints/*.parquet'))
          SELECT r.id, r.simhash, r.n_shingles, r.n_tokens FROM r
          JOIN m ON m.doc_id = r.id
          WHERE r.n_shingles = m.ns AND r.n_tokens = m.ntok
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1::INT, -1::INT
            WHERE (SELECT count(*) FROM r) < (SELECT count(*) FROM documents)
          ORDER BY 1""",
    // ONE-SIDED: every emitted cross-source pair is cross-source by parity,
    // and its exact shingle Jaccard (recomputed from the materialized
    // corpus) equals the emitted value
    "q_linkage_pairs" ->
      s"""WITH sh AS (${shingleSql(s"read_parquet('$auxDir/corpus_pages_2000/*.parquet')", "id")}),
          r AS (SELECT * FROM read_parquet('$auxDir/out/q_linkage_pairs/*.parquet'))
          SELECT r.left_id, r.right_id, r.jaccard FROM r
          JOIN sh a ON a.sid = r.left_id JOIN sh b ON b.sid = r.right_id
          WHERE r.left_id % 2 = 0 AND r.right_id % 2 = 1
            AND round(len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(a.s || b.s)), 6) = r.jaccard
            AND r.jaccard >= ${cfg.simThreshold}
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1.0::DOUBLE
            WHERE (SELECT count(*) FROM r) < 2500
          ORDER BY 1, 2""",
    // ONE-SIDED: every emitted span must be a true common substring of both
    // normalized pages with the emitted length (>= minSpanLen)
    "q_suffix_spans" ->
      s"""WITH p AS (SELECT id, $N nt
            FROM read_parquet('$auxDir/corpus_pages_2000/*.parquet')),
          r AS (SELECT * FROM read_parquet('$auxDir/out/q_suffix_spans/*.parquet'))
          SELECT r.id1, r.id2, r.span_len, r.span FROM r
          JOIN p a ON a.id = r.id1 JOIN p b ON b.id = r.id2
          WHERE len(r.span) = r.span_len AND r.span_len >= ${cfg.minSpanLen}
            AND contains(a.nt, r.span) AND contains(b.nt, r.span)
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1::INT, ''
            WHERE (SELECT count(*) FROM r) < 18000
          ORDER BY 1, 2""",
    // ONE-SIDED: emitted cosine recomputed from `embeddings`; emitted rank
    // must be consistent with the emitted (cosine, neighbor) ordering
    "q_ann_lsh_top3" ->
      s"""WITH r AS (SELECT * FROM read_parquet('$auxDir/out/q_ann_lsh_top3/*.parquet')),
          chk AS (SELECT r.id, r.neighbor, r.cosine, r.rank,
            round(list_cosine_similarity(a.embedding::DOUBLE[],
              b.embedding::DOUBLE[]), 6) c2,
            row_number() OVER (PARTITION BY r.id
              ORDER BY r.cosine DESC, r.neighbor ASC) rk2
            FROM r JOIN embeddings a ON a.vec_id = r.id
            JOIN embeddings b ON b.vec_id = r.neighbor)
          SELECT id, neighbor, cosine, rank FROM chk
          WHERE cosine = c2 AND rank = rk2 AND rank <= 3
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1.0::DOUBLE, -1::INT
            WHERE (SELECT count(*) FROM r) < 400
          ORDER BY 1, 4""",
    // TWO-SIDED: full pipeline vs DuckDB-native prefix-filtered exact
    // shingle-Jaccard join + recursive-CTE connected components over the
    // materialized corpus (cluster id = min member id; singletons = own id)
    // (each stage is materialized as a temp table: DuckDB 1.0 inlines CTEs
    // per reference and re-evaluates them on every recursion step — the
    // whole similarity join would otherwise re-run once per CC round)
    "q_pipeline_clusters" ->
      s"""CREATE OR REPLACE TEMP TABLE __g_sh AS
            SELECT id, list_distinct([substr(nt, i, 5)
              FOR i IN range(1, len(nt) - 3)]) s
            FROM (SELECT id, $N nt
              FROM read_parquet('$auxDir/corpus_pages_2000/*.parquet'))
            WHERE len(nt) >= 5;
          CREATE OR REPLACE TEMP TABLE __g_tok AS
            SELECT id, unnest(s) t FROM __g_sh;
          CREATE OR REPLACE TEMP TABLE __g_pfx AS
            SELECT id, t, pos, n FROM (
              SELECT k.id, k.t,
                row_number() OVER (PARTITION BY k.id ORDER BY dfr.d, k.t) pos,
                count(*) OVER (PARTITION BY k.id) n
              FROM __g_tok k
              JOIN (SELECT t, count(*) d FROM __g_tok GROUP BY t) dfr USING (t))
            WHERE pos <= n - ceil(${cfg.simThreshold} * n) + 1;
          CREATE OR REPLACE TEMP TABLE __g_edges AS
            WITH cand AS (SELECT DISTINCT a.id id1, b.id id2
              FROM __g_pfx a JOIN __g_pfx b
              ON a.t = b.t AND a.id < b.id
              AND least(a.n, b.n) >= ${cfg.simThreshold} * greatest(a.n, b.n)
              AND least(a.n - a.pos, b.n - b.pos) + 1 >=
                ceil(${cfg.simThreshold} / ${1 + cfg.simThreshold} * (a.n + b.n))),
            ic AS (SELECT c.id1, c.id2, count(*) ni FROM cand c
              JOIN __g_tok a ON a.id = c.id1
              JOIN __g_tok b ON b.id = c.id2 AND b.t = a.t
              GROUP BY c.id1, c.id2),
            e0 AS (SELECT ic.id1, ic.id2 FROM ic
              JOIN (SELECT id, len(s) n2 FROM __g_sh) x ON x.id = ic.id1
              JOIN (SELECT id, len(s) n2 FROM __g_sh) y ON y.id = ic.id2
              WHERE ni::DOUBLE / (x.n2 + y.n2 - ni) >= ${cfg.simThreshold})
            SELECT id1 u, id2 v FROM e0 UNION SELECT id2, id1 FROM e0;
          WITH RECURSIVE
          reach(id, comp) AS (
            SELECT id, id FROM read_parquet('$auxDir/corpus_pages_2000/*.parquet')
            UNION
            SELECT e.v, r.comp FROM reach r JOIN __g_edges e ON e.u = r.id
            WHERE r.comp < e.v)
          SELECT id, min(comp) AS cluster FROM reach GROUP BY id ORDER BY id""",
    // TWO-SIDED given the materialized scored pairs: sweep metrics
    // recomputed from auxDir/scored_pairs + the corpus truth
    "q_threshold_sweep" ->
      s"""WITH s AS (SELECT * FROM read_parquet('$auxDir/scored_pairs/*.parquet')),
          tr AS (SELECT id, cluster
            FROM read_parquet('$auxDir/corpus_truth_2000/*.parquet')),
          pos AS (SELECT a.id id1, b.id id2 FROM tr a
            JOIN tr b ON a.cluster = b.cluster AND a.id < b.id),
          th(threshold) AS (SELECT unnest([0.3::DOUBLE, 0.5::DOUBLE, 0.7::DOUBLE])),
          lab AS (SELECT s.jaccard,
            CASE WHEN p.id1 IS NULL THEN 0 ELSE 1 END is_tp
            FROM s LEFT JOIN pos p ON s.id1 = p.id1 AND s.id2 = p.id2),
          agg AS (SELECT th.threshold,
            coalesce(sum(CASE WHEN lab.jaccard >= th.threshold THEN 1 ELSE 0 END), 0)::BIGINT found,
            coalesce(sum(CASE WHEN lab.jaccard >= th.threshold THEN lab.is_tp ELSE 0 END), 0)::BIGINT tp
            FROM th CROSS JOIN lab GROUP BY th.threshold),
          c AS (SELECT (SELECT count(*) FROM pos)::BIGINT npos,
            (SELECT count(*) FROM read_parquet('$auxDir/corpus_truth_2000/*.parquet'))::BIGINT nrec)
          SELECT threshold, tp AS truePositives, found AS foundPairs,
            npos AS positivePairs,
            CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END AS precision,
            CASE WHEN npos = 0 THEN 0.0 ELSE tp::DOUBLE / npos END AS recall,
            CASE WHEN (CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                + (CASE WHEN npos = 0 THEN 0.0 ELSE tp::DOUBLE / npos END) = 0.0
              THEN 0.0
              ELSE 2 * (CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                * (CASE WHEN npos = 0 THEN 0.0 ELSE tp::DOUBLE / npos END)
                / ((CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                  + (CASE WHEN npos = 0 THEN 0.0 ELSE tp::DOUBLE / npos END)) END AS f1,
            CASE WHEN nrec = 0 THEN 0.0 ELSE found::DOUBLE / nrec END AS pairEntityRatio
          FROM agg, c ORDER BY threshold""",
    // TWO-SIDED: brute-force weighted multi-field score over derived
    // title/body fields (the Spark side is the exact SetSimJoin union, so
    // full result-set equality is expected)
    "q_multifield_pairs" ->
      """WITH nd AS (SELECT doc_id,
            trim(regexp_replace(lower(text), '\s+', ' ', 'g')) nt FROM documents),
          f AS (SELECT doc_id, trim(substr(nt, 1, 48)) title,
            trim(substr(nt, 49)) body FROM nd),
          g AS (SELECT doc_id,
            CASE WHEN len(title) >= 5 THEN list_distinct(
              [substr(title, i, 5) FOR i IN range(1, len(title) - 3)])
              ELSE []::VARCHAR[] END gt,
            CASE WHEN len(body) > 0 THEN list_distinct(string_split(body, ' '))
              ELSE []::VARCHAR[] END gb FROM f)
          SELECT id1, id2, score FROM (
            SELECT a.doc_id id1, b.doc_id id2,
              round((coalesce(len(list_intersect(a.gt, b.gt))::DOUBLE
                  / nullif(len(list_distinct(a.gt || b.gt)), 0), 0.0) * 2.0
                + coalesce(len(list_intersect(a.gb, b.gb))::DOUBLE
                  / nullif(len(list_distinct(a.gb || b.gb)), 0), 0.0) * 1.0)
                / 3.0, 6) score
            FROM g a JOIN g b ON a.doc_id < b.doc_id)
          WHERE score >= 0.6 ORDER BY 1, 2""",
    // TWO-SIDED: scalar media features recomputed from the corpus html blob
    "q_multimodal_features" ->
      s"""SELECT id AS media_id, 'html' AS kind,
            octet_length(html)::BIGINT AS n_bytes,
            md5(decode(html)) AS payload_md5
          FROM read_parquet('$auxDir/corpus_pages_2000/*.parquet')
          ORDER BY media_id""",
    "q_cluster_pairs" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2 FROM embeddings a
         JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id""",
    "q_cluster_pair_count" ->
      """SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS total_pairs FROM
         (SELECT count(*) AS n FROM embeddings GROUP BY label)""",
    "q_exact_dup_pairs" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2 FROM documents a
         JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
         ORDER BY 1, 2""",
    "q_ngram_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') tk
            FROM documents),
          g AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
            FOR i IN range(1, len(tk) - 1)]) g FROM t)
          SELECT id1, id2, round(j, 6) AS jaccard FROM (
            SELECT a.doc_id id1, b.doc_id id2,
              len(list_intersect(a.g, b.g))::DOUBLE / len(list_distinct(a.g || b.g)) j
            FROM g a JOIN g b ON a.doc_id < b.doc_id)
          WHERE j >= $ngramThreshold ORDER BY 1, 2""",
    "q_cc_clusters" ->
      s"""WITH RECURSIVE
          t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') tk
            FROM documents),
          g AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
            FOR i IN range(1, len(tk) - 1)]) g FROM t),
          e0 AS (SELECT a.doc_id id1, b.doc_id id2
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.g, b.g))::DOUBLE
              / len(list_distinct(a.g || b.g)) >= $ngramThreshold),
          edges AS (SELECT id1 u, id2 v FROM e0 UNION SELECT id2, id1 FROM e0),
          reach(id, comp) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.id
            WHERE r.comp < e.v)
          SELECT id, min(comp) AS cluster FROM reach GROUP BY id ORDER BY id""",
    "q_text_profile" ->
      """WITH p AS (SELECT doc_id, text, trim(text) tt,
            string_split_regex(lower(trim(text)), '\s+') tk FROM documents),
          m AS (SELECT doc_id, text, tt, tk,
            CASE WHEN len(tt) = 0 THEN 0 ELSE len(tk) END::BIGINT n_tokens_ws,
            len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT words,
            coalesce(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
              w -> greatest(CAST(ceil(len(w) / 4.0) AS BIGINT) - 1, 0))), 0)::BIGINT extra,
            len(regexp_extract_all(text, '[0-9]'))::BIGINT digits,
            len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::BIGINT punct_bpe,
            CASE WHEN len(text) = 0 THEN 0.0 ELSE
              len(regexp_extract_all(text, '[^\p{L}\p{N}\s]'))::DOUBLE / len(text)
            END punct_ratio_raw,
            CASE WHEN len(tt) = 0 THEN 0.0 ELSE
              len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is','for','on','with')))::DOUBLE / len(tk)
            END stop_ratio_raw,
            CASE WHEN len(tt) = 0 THEN 0.0 ELSE
              list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
            END mean_word_len,
            len(string_split(' ' || lower(text) || ' ', ' the ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' and ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' of ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' is ')) - 1 AS en_s,
            len(string_split(' ' || lower(text) || ' ', ' der ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' und ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' die ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' ist ')) - 1 AS de_s,
            len(string_split(' ' || lower(text) || ' ', ' el ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' los ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' las ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' es ')) - 1 AS es_s,
            len(string_split(' ' || lower(text) || ' ', ' le ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' les ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' et ')) - 1
              + len(string_split(' ' || lower(text) || ' ', ' est ')) - 1 AS fr_s
          FROM p)
          SELECT doc_id, n_tokens_ws,
            (words + extra + digits + punct_bpe)::BIGINT AS n_tokens_bpe,
            round(punct_ratio_raw, 6) AS punct_ratio,
            round(stop_ratio_raw, 6) AS stopword_ratio,
            round(least(len(text) / 500.0, 1.0) * 0.3
              + greatest(1.0 - punct_ratio_raw * 5.0, 0.0) * 0.3
              + least(stop_ratio_raw * 5.0, 1.0) * 0.2
              + (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
            CASE
              WHEN en_s > 0 AND en_s >= de_s AND en_s >= es_s AND en_s >= fr_s THEN 'en'
              WHEN de_s > 0 AND de_s >= es_s AND de_s >= fr_s THEN 'de'
              WHEN es_s > 0 AND es_s >= fr_s THEN 'es'
              WHEN fr_s > 0 THEN 'fr'
              ELSE 'und' END AS lang_id
          FROM m ORDER BY doc_id""",
    "q_vocab_count" ->
      """SELECT token, count(*)::BIGINT AS freq FROM (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           FROM documents)
         WHERE len(token) > 0 GROUP BY token ORDER BY token""",
    "q_max_str_len" ->
      """SELECT (m + m % 2)::BIGINT AS max_str_len FROM (
           SELECT max(len(t)) m FROM (
             SELECT unnest(string_split_regex(trim(text), '\s+')) t FROM documents))""",
    "q_topk_per_lang" ->
      """SELECT lang, doc_id, n_chars, rank FROM (
           SELECT lang, doc_id, n_chars, row_number() OVER
             (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
           FROM documents)
         WHERE rank <= 3 ORDER BY lang, rank""",
    "q_split_assign" ->
      s"""WITH labeled AS (
           SELECT label,
             CASE WHEN (label + ${cfg.seed}) % 100 < 60 THEN 'train'
                  WHEN (label + ${cfg.seed}) % 100 < 80 THEN 'valid'
                  ELSE 'test' END AS split
           FROM (SELECT DISTINCT label FROM embeddings))
         SELECT e.vec_id AS id, CAST(e.label AS BIGINT) AS cluster, l.split
         FROM embeddings e JOIN labeled l ON e.label = l.label ORDER BY id""",
    "q_metrics_pr" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') tk
            FROM documents),
          g AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
            FOR i IN range(1, len(tk) - 1)]) g FROM t),
          found AS (SELECT a.doc_id id1, b.doc_id id2
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.g, b.g))::DOUBLE
              / len(list_distinct(a.g || b.g)) >= $ngramThreshold),
          pos AS (SELECT a.vec_id id1, b.vec_id id2 FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id),
          c AS (SELECT
            (SELECT count(*) FROM found f JOIN pos p
               ON f.id1 = p.id1 AND f.id2 = p.id2)::BIGINT tp,
            (SELECT count(*) FROM found)::BIGINT found,
            (SELECT count(*) FROM pos)::BIGINT pos,
            (SELECT count(*) FROM documents)::BIGINT nrec)
          SELECT tp, found, pos,
            CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END AS precision,
            CASE WHEN pos = 0 THEN 0.0 ELSE tp::DOUBLE / pos END AS recall,
            CASE WHEN (CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                    + (CASE WHEN pos = 0 THEN 0.0 ELSE tp::DOUBLE / pos END) = 0.0
              THEN 0.0
              ELSE 2 * (CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                     * (CASE WHEN pos = 0 THEN 0.0 ELSE tp::DOUBLE / pos END)
                   / ((CASE WHEN tp = 0 THEN 0.0 ELSE tp::DOUBLE / found END)
                      + (CASE WHEN pos = 0 THEN 0.0 ELSE tp::DOUBLE / pos END)) END AS f1,
            CASE WHEN nrec = 0 THEN 0.0 ELSE found::DOUBLE / nrec END AS pair_entity_ratio
          FROM c""",
    "q_ann_top3" ->
      """SELECT id, neighbor, cosine, rank FROM (
           SELECT a.vec_id AS id, b.vec_id AS neighbor,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                        b.vec_id ASC) AS rank
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
         WHERE rank <= 3 ORDER BY id, rank""",
    "q_cosine_pairs" ->
      """SELECT id1, id2, round(c, 6) AS cosine FROM (
           SELECT a.vec_id id1, b.vec_id id2,
             list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) c
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         WHERE c >= 0.4 ORDER BY 1, 2""",
    // ONE-SIDED: every emitted pair's exact weighted multi-field score is
    // recomputed from `documents` (same derived title/body fields as
    // q_multifield_pairs) and must equal the emitted value at >= 0.6;
    // floor 22 vs the 25-row exact result pins LSH recall (measured 25/25)
    "q_multifield_lsh_pairs" ->
      s"""WITH nd AS (SELECT doc_id,
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) nt FROM documents),
          f AS (SELECT doc_id, trim(substr(nt, 1, 48)) title,
            trim(substr(nt, 49)) body FROM nd),
          g AS (SELECT doc_id,
            CASE WHEN len(title) >= 5 THEN list_distinct(
              [substr(title, i, 5) FOR i IN range(1, len(title) - 3)])
              ELSE []::VARCHAR[] END gt,
            CASE WHEN len(body) > 0 THEN list_distinct(string_split(body, ' '))
              ELSE []::VARCHAR[] END gb FROM f),
          r AS (SELECT * FROM read_parquet('$auxDir/out/q_multifield_lsh_pairs/*.parquet'))
          SELECT r.id1, r.id2, r.score FROM r
          JOIN g a ON a.doc_id = r.id1 JOIN g b ON b.doc_id = r.id2
          WHERE round((coalesce(len(list_intersect(a.gt, b.gt))::DOUBLE
                / nullif(len(list_distinct(a.gt || b.gt)), 0), 0.0) * 2.0
              + coalesce(len(list_intersect(a.gb, b.gb))::DOUBLE
                / nullif(len(list_distinct(a.gb || b.gb)), 0), 0.0) * 1.0)
              / 3.0, 6) = r.score
            AND r.score >= 0.6 AND r.id1 < r.id2
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1.0::DOUBLE
            WHERE (SELECT count(*) FROM r) < 22
          ORDER BY 1, 2""",
    // ONE-SIDED: every emitted pair's exact cosine is recomputed from
    // `embeddings` and must equal the emitted value at >= threshold; floor
    // 55 vs the 59-row brute-force result pins recall (measured 59/59 with
    // the tuned LSH at seed 42)
    "q_cosine_lsh_pairs" ->
      s"""WITH r AS (SELECT * FROM read_parquet('$auxDir/out/q_cosine_lsh_pairs/*.parquet'))
          SELECT r.id1, r.id2, r.cosine FROM r
          JOIN embeddings a ON a.vec_id = r.id1
          JOIN embeddings b ON b.vec_id = r.id2
          WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
              b.embedding::DOUBLE[]), 6) = r.cosine
            AND r.cosine >= 0.4 AND r.id1 < r.id2
          UNION ALL SELECT -1::BIGINT, -1::BIGINT, -1.0::DOUBLE
            WHERE (SELECT count(*) FROM r) < 55
          ORDER BY 1, 2""",
    "q_pair_features" ->
      s"""WITH t AS (SELECT doc_id, text,
            string_split_regex(lower(trim(text)), '\\s+') tk FROM documents),
          g AS (SELECT doc_id, text,
            list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
              FOR i IN range(1, len(tk) - 1)]) g,
            list_distinct(regexp_extract_all(lower(text),
              '[\\p{L}\\p{Nd}]+|[^\\p{L}\\p{Nd}\\s]+')) tok FROM t),
          p AS (SELECT a.doc_id id1, b.doc_id id2,
              a.text t1, b.text t2, a.tok tok1, b.tok tok2
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.g, b.g))::DOUBLE
              / len(list_distinct(a.g || b.g)) >= $ngramThreshold),
          tc AS (SELECT doc_id, tok2 tok, count(*) tf FROM (
              SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '[\\p{L}\\p{Nd}]+|[^\\p{L}\\p{Nd}\\s]+')) tok2 FROM documents)
            GROUP BY 1, 2),
          dfr AS (SELECT tok, count(*) df FROM tc GROUP BY tok),
          n AS (SELECT count(*)::DOUBLE nn FROM documents),
          w AS (SELECT tc.doc_id, tc.tok,
              tc.tf * (ln((n.nn + 1.0) / (dfr.df + 1.0)) + 1.0) w
            FROM tc JOIN dfr USING (tok) CROSS JOIN n),
          nrm AS (SELECT doc_id, sqrt(sum(w * w)) norm FROM w GROUP BY doc_id),
          dots AS (SELECT p.id1, p.id2, sum(a.w * b.w) dot FROM p
            JOIN w a ON a.doc_id = p.id1 JOIN w b ON b.doc_id = p.id2
              AND b.tok = a.tok
            GROUP BY p.id1, p.id2)
          SELECT p.id1, p.id2,
            round(len(list_intersect(tok1, tok2))::DOUBLE
              / greatest(len(list_distinct(tok1 || tok2)), 1), 6) AS token_jaccard,
            round(len(list_intersect(tok1, tok2))::DOUBLE
              / greatest(least(len(tok1), len(tok2)), 1), 6) AS overlap_coef,
            round(1.0 - levenshtein(t1, t2)::DOUBLE
              / greatest(len(t1), len(t2), 1), 6) AS levenshtein_sim,
            round(1.0 - damerau_levenshtein(t1, t2)::DOUBLE
              / greatest(len(t1), len(t2), 1), 6) AS damerau_levenshtein_sim,
            round(coalesce(dots.dot, 0.0) / (na.norm * nb.norm), 6) AS tfidf_cosine
          FROM p
          LEFT JOIN dots ON dots.id1 = p.id1 AND dots.id2 = p.id2
          JOIN nrm na ON na.doc_id = p.id1 JOIN nrm nb ON nb.doc_id = p.id2
          ORDER BY 1, 2""",
    // TWO-SIDED: brute-force weighted multi-field score over derived
    // title/body fields, cross-parity only, oriented (left = even doc_id) —
    // the Spark side is the exact source-filtered SetSimJoin union, so full
    // result-set equality is expected
    "q_multifield_linkage" ->
      """WITH nd AS (SELECT doc_id,
            trim(regexp_replace(lower(text), '\s+', ' ', 'g')) nt FROM documents),
          f AS (SELECT doc_id, trim(substr(nt, 1, 48)) title,
            trim(substr(nt, 49)) body FROM nd),
          g AS (SELECT doc_id,
            CASE WHEN len(title) >= 5 THEN list_distinct(
              [substr(title, i, 5) FOR i IN range(1, len(title) - 3)])
              ELSE []::VARCHAR[] END gt,
            CASE WHEN len(body) > 0 THEN list_distinct(string_split(body, ' '))
              ELSE []::VARCHAR[] END gb FROM f)
          SELECT left_id, right_id, score FROM (
            SELECT a.doc_id left_id, b.doc_id right_id,
              round((coalesce(len(list_intersect(a.gt, b.gt))::DOUBLE
                  / nullif(len(list_distinct(a.gt || b.gt)), 0), 0.0) * 2.0
                + coalesce(len(list_intersect(a.gb, b.gb))::DOUBLE
                  / nullif(len(list_distinct(a.gb || b.gb)), 0), 0.0) * 1.0)
                / 3.0, 6) score
            FROM g a JOIN g b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
          WHERE score >= 0.6 ORDER BY 1, 2""",
    "q_pair_cap" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') tk
            FROM documents),
          g AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
            FOR i IN range(1, len(tk) - 1)]) g FROM t),
          scored AS (SELECT id1, id2, round(j, 6) AS jaccard FROM (
            SELECT a.doc_id id1, b.doc_id id2,
              len(list_intersect(a.g, b.g))::DOUBLE / len(list_distinct(a.g || b.g)) j
            FROM g a JOIN g b ON a.doc_id < b.doc_id) WHERE j >= 0.02),
          b AS (SELECT id1 anchor, id2 partner, jaccard s FROM scored
            UNION ALL SELECT id2, id1, jaccard FROM scored),
          kept AS (SELECT DISTINCT least(anchor, partner) id1,
              greatest(anchor, partner) id2 FROM (
            SELECT anchor, partner, row_number() OVER
              (PARTITION BY anchor ORDER BY s DESC, partner ASC) rk FROM b)
            WHERE rk <= 2)
          SELECT s.id1, s.id2, s.jaccard FROM scored s
          JOIN kept k ON s.id1 = k.id1 AND s.id2 = k.id2 ORDER BY 1, 2"""
  ).map { case (k, v) => k -> v.linesIterator.map(_.trim).mkString(" ") }
}
