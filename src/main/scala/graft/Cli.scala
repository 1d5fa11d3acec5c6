package graft

import graft.config.GraftConfig
import graft.operators._
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Config-driven, spark-submit-able entry point — the engine analog of the
 * reference's primary UX, the `entity_embed_predict` console script
 * (entity_embed/cli.py:177-524, setup.py:36-39): point it at an input table
 * and get pairs / clusters / metrics out, no code required.
 *
 * {{{
 * spark-submit --class graft.Cli graft.jar \
 *   --mode dedup --input /data/pages.parquet --output /out \
 *   [--threshold 0.6] [--field-config fields.json] [--estimate] \
 *   [--id-col id] [--text-col text] [--cluster-col cluster] \
 *   [--checkpoint-dir /ckpt]                  # stage resume (dedup pipeline)
 *   [--source-col source --left-source left]           # linkage mode
 *   [--sweep 0.3,0.5,0.7]   # evaluation mode: one metrics row per threshold
 * }}}
 *
 * Outputs (ParquetTables under --output; an Iceberg deployment swaps the
 * TableIO implementation):
 *   pairs/    (id1, id2, score)      — verified duplicate / linkage pairs
 *   clusters/ (id, cluster)          — CC assignment, every input record
 *                                      (dedup modes only)
 *   metrics/  one PairMetrics row    — when --cluster-col names a
 *                                      ground-truth column in the input
 *
 * Modes:
 *  - dedup, no field config: the flagship pipeline (signatures → 3-stage
 *    blocking → two-tier verify; --estimate keeps tier 1 only) over
 *    (--id-col, --text-col).
 *  - dedup, --field-config: multi-field ER — the JSON is parsed with the
 *    reference's field_config semantics (MultiField.parseConfigs), stats
 *    are bound (bindStats), and pairs come from the selectivity-planned
 *    exact weighted join (MultiField.dedupPairs) at --threshold.
 *  - linkage: cross-source pairs only (--source-col / --left-source),
 *    oriented (left_id, right_id) — reference ANNLinkageIndex semantics.
 *    With --field-config: multi-field linkage (MultiField.linkagePairs),
 *    the reference's Record-Linkage-Example shape.
 *  - --sweep (needs --cluster-col): pairs are scored down to min(sweep ∪
 *    {threshold}) and the metrics table gets one row per swept threshold
 *    (reference entity_embed.py:355-385).
 */
object Cli {

  final case class Args(
      mode: String = "dedup",
      input: String = "",
      inputFormat: String = "",
      output: String = "",
      fieldConfig: Option[String] = None,
      threshold: Option[Double] = None,
      idCol: String = "id",
      textCol: String = "text",
      clusterCol: Option[String] = None,
      sourceCol: String = "source",
      leftSource: String = "left",
      estimate: Boolean = false,
      checkpointDir: Option[String] = None,
      sweep: Seq[Double] = Nil)

  def parseArgs(argv: Array[String]): Args = {
    def loop(a: Args, rest: List[String]): Args = rest match {
      case Nil => a
      case "--mode" :: v :: t => loop(a.copy(mode = v), t)
      case "--input" :: v :: t => loop(a.copy(input = v), t)
      case "--input-format" :: v :: t => loop(a.copy(inputFormat = v), t)
      case "--output" :: v :: t => loop(a.copy(output = v), t)
      case "--field-config" :: v :: t => loop(a.copy(fieldConfig = Some(v)), t)
      case "--threshold" :: v :: t => loop(a.copy(threshold = Some(v.toDouble)), t)
      case "--id-col" :: v :: t => loop(a.copy(idCol = v), t)
      case "--text-col" :: v :: t => loop(a.copy(textCol = v), t)
      case "--cluster-col" :: v :: t => loop(a.copy(clusterCol = Some(v)), t)
      case "--source-col" :: v :: t => loop(a.copy(sourceCol = v), t)
      case "--left-source" :: v :: t => loop(a.copy(leftSource = v), t)
      case "--estimate" :: t => loop(a.copy(estimate = true), t)
      case "--checkpoint-dir" :: v :: t => loop(a.copy(checkpointDir = Some(v)), t)
      case "--sweep" :: v :: t =>
        loop(a.copy(sweep = v.split(",").toSeq.map(_.trim.toDouble)), t)
      case x :: _ => throw new IllegalArgumentException(s"unknown argument: $x")
    }
    val a = loop(Args(), argv.toList)
    require(a.input.nonEmpty, "--input is required")
    require(a.output.nonEmpty, "--output is required")
    require(Set("dedup", "linkage")(a.mode), s"unknown --mode ${a.mode}")
    a
  }

  private def readInput(spark: SparkSession, a: Args): DataFrame = {
    val fmt =
      if (a.inputFormat.nonEmpty) a.inputFormat
      else if (a.input.endsWith(".csv")) "csv" else "parquet"
    fmt match {
      // CSV goes through the reference-coercion scan (S1): strings
      // everywhere, long id (+ long cluster col when present), ANSI raise
      case "csv" => graft.io.PairIO.readRecords(spark, a.input, a.clusterCol, a.idCol)
      case "parquet" => spark.read.parquet(a.input)
      case f => throw new IllegalArgumentException(s"unknown --input-format $f")
    }
  }

  /** Fail fast with a clear message when the id column is not integral —
    * a silent ANSI cast error (or, with ANSI off, null-ed ids and an empty
    * result) deep in a join is the alternative. The reference renumbers
    * non-integer ids (Enumerator, benchmarks/base.py:107); so should the
    * caller (Splits.enumerate / Benchmarks.load). */
  private def requireIntegralIds(df: DataFrame, idCol: String): Unit = {
    val bad = df.filter(col(idCol).isNotNull &&
      expr(s"try_cast(`$idCol` AS LONG)").isNull).count()
    require(bad == 0, s"$bad rows of '$idCol' are not integral ids — " +
      "renumber first (graft.operators.Splits.enumerate or graft.io.Benchmarks)")
  }

  /** Run with an existing session (tests call this; main wraps it). */
  def run(spark: SparkSession, a: Args): Unit = {
    val cfg0 = GraftConfig.default
    // --sweep implies scoring down to min(sweep): pairs must be retained at
    // the lowest swept threshold or the sweep rows below it would count a
    // truncated pair set (reference sweeps over the full retrieved set,
    // entity_embed.py:355-385)
    val baseT = a.threshold.getOrElse(cfg0.simThreshold)
    // --sweep without --cluster-col would LOWER the emission threshold (the
    // sweep's retention contract below) while the metrics block that
    // justifies it never runs — reject loudly, like --estimate (round-5
    // verdict defect #1)
    require(a.sweep.isEmpty || a.clusterCol.nonEmpty,
      "--sweep needs --cluster-col (ground truth): without it the sweep " +
        "would only lower the emission threshold and evaluate nothing")
    val effT = (baseT +: a.sweep).min
    val cfg = cfg0.copy(simThreshold = effT)
    // --estimate is only wired into the plain-dedup pipeline path; reject
    // the other modes loudly instead of silently running exact scoring
    require(!a.estimate || (a.mode == "dedup" && a.fieldConfig.isEmpty),
      "--estimate applies only to --mode dedup without --field-config")
    require(a.sweep.forall(t => t > 0 && t <= 1), "--sweep thresholds in (0, 1]")
    val io = new graft.io.ParquetTables(spark, a.output)
    val raw = readInput(spark, a)
    require(raw.columns.contains(a.idCol), s"input needs column '${a.idCol}'")
    // a --cluster-col typo must not silently drop the evaluation the user
    // asked for (same fail-fast contract as --id-col / --source-col)
    a.clusterCol.foreach(cc => require(raw.columns.contains(cc),
      s"--cluster-col '$cc' not in input (available: ${raw.columns.mkString(", ")})"))
    requireIntegralIds(raw, a.idCol)
    // field config read once: the checkpoint scope below hashes its CONTENT
    // (editing fields.json in place + rerunning with the same
    // --checkpoint-dir must recompute, not serve stale stage outputs)
    val fieldJson = a.fieldConfig.map { path =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    }
    // config-scoped checkpoint root: a rerun with a different threshold /
    // estimate / mode / field config can never be served another config's
    // stage outputs. Input identity remains the caller's contract.
    val ckpt = a.checkpointDir.map { d =>
      // signature format version in the scope: a jar whose hash family
      // changed (round 5: mod-prime -> wraparound) must never resume stage
      // outputs written by the old family (round-5 advisor finding)
      val h = (a.mode, cfg.simThreshold, a.estimate, fieldJson,
        graft.functions.TextSignatures.formatVersion).##
      f"$d/cfg_${h & 0xffffffffL}%08x"
    }

    val (pairs, clustered) = (a.mode, fieldJson) match {
      case ("linkage", fj) =>
        require(raw.columns.contains(a.sourceCol),
          s"linkage mode needs --source-col '${a.sourceCol}' in the input")
        val recs = raw.withColumn(a.idCol, col(a.idCol).cast("long"))
        val p = fj match {
          case Some(json) =>
            // multi-field linkage: the reference's flagship linkage shape
            // (field config over two catalogs, Record-Linkage-Example)
            val specs = MultiField.bindStats(raw, MultiField.parseConfigs(json))
            MultiField.linkagePairs(recs, specs, cfg.simThreshold,
              a.leftSource, a.idCol, a.sourceCol)
              .select(col("left_id").as("id1"), col("right_id").as("id2"),
                col("score"))
          case None =>
            Linkage.linkagePairs(recs, cfg, a.leftSource,
              a.idCol, a.textCol, a.sourceCol)
              .select(col("left_id").as("id1"), col("right_id").as("id2"),
                col("jaccard").as("score"))
        }
        (p, false)
      case ("dedup", Some(json)) =>
        val specs = MultiField.bindStats(raw, MultiField.parseConfigs(json))
        def compute() = MultiField.dedupPairs(
          raw.withColumn(a.idCol, col(a.idCol).cast("long")), specs,
          cfg.simThreshold, a.idCol)
        // checkpoint at the pairs granularity (same marker contract as the
        // pipeline path). The scope hash covers the field-config CONTENT:
        // editing fields.json in place and rerunning with the same
        // --checkpoint-dir recomputes under a fresh scope instead of
        // silently serving pairs scored under the old config.
        val p = ckpt match {
          case Some(dir) =>
            val t = new graft.io.ParquetTables(spark, dir)
            if (!t.isComplete("pairs")) {
              t.write(compute(), "pairs"); t.markComplete("pairs")
            }
            t.read("pairs")
          case None => compute()
        }
        (p, true)
      case ("dedup", None) =>
        val recs = raw.select(col(a.idCol).cast("long").as("id"),
          col(a.textCol).as("text"))
        // --checkpoint-dir: stage outputs land there (config-scoped, see
        // ckpt above) with completion markers, so a killed job resumes
        val p = new DedupPipeline(spark, cfg, checkpointDir = ckpt)
          .runPairs(recs, exact = !a.estimate)
          .select(col("id1"), col("id2"), col("jaccard").as("score"))
        (p, true)
    }
    io.write(pairs, "pairs")
    io.markComplete("pairs")
    val written = io.read("pairs")

    if (clustered) {
      val comps = ConnectedComponents.components(written.select("id1", "id2"))
      val assign = Clustering.assignAll(
        raw.select(col(a.idCol).cast("long").as("id")), comps,
        normalizeIds = false)
      io.write(assign, "clusters")
      io.markComplete("clusters")
    }

    a.clusterCol.foreach { cc =>
      val truth = raw.select(col(a.idCol).cast("long").as("id"),
        col(cc).cast("long").as("cluster"))
      // ground truth must match the mode's pair semantics: linkage emits
      // ORIENTED (left_id, right_id) pairs and can only ever find
      // cross-source pairs, so the truth set is the oriented cross-source
      // expansion (clusterToLinkagePairs) — comparing against the
      // canonical id1<id2 intra+cross expansion would zero precision
      // whenever left ids sort above right ids and deflate recall with
      // pairs linkage is defined to exclude
      val pos = a.mode match {
        case "linkage" =>
          val sources = raw.select(col(a.idCol).cast("long").as("id"),
            col(a.sourceCol).as("source"))
          PairAlgebra.clusterToLinkagePairs(truth, sources, a.leftSource)
        case _ => PairAlgebra.clusterToPairs(truth)
      }
      import spark.implicits._
      // --sweep t1,t2,...: one metrics row per threshold over the ONE scored
      // pair table (reference evaluation-mode sweep, entity_embed.py:355-385
      // — it re-searches the index per threshold; Metrics.sweep is a single
      // conditional aggregation). Without --sweep: one row at the run
      // threshold.
      val rows =
        if (a.sweep.nonEmpty)
          Metrics.sweep(written.select(col("id1"), col("id2"),
            col("score").as("jaccard")), pos, raw.count(), a.sweep.sorted)
        else Seq(Metrics.evaluate(written.select("id1", "id2"), pos,
          raw.count(), cfg.simThreshold))
      io.write(rows.toDS().toDF(), "metrics")
      io.markComplete("metrics")
    }
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, a) finally spark.stop()
  }
}
