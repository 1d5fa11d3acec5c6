package graft

import graft.corpus.PageCorpus
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs the headline queries on
 * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], prints ONE JSON line
 * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
 *
 * The flagship metric is the end-to-end dedup pipeline (signatures →
 * 3-stage blocking → Jaccard verify → connected components → clusters) on a
 * synthetic page corpus sized from the sf dir's documents table; its
 * per-doc throughput is reported alongside as docs_per_sec.
 *
 * LOAD-INVARIANT EVIDENCE (this host is time-shared; the identical jar has
 * measured 2,750–5,906 pairs docs/sec across ambient-load conditions, which
 * makes wall-clock alone unable to adjudicate a ≤2×-of-baseline claim):
 *  - every slice rep also records SparkListener task-time sums — core
 *    seconds (scheduler task duration) and CPU seconds (executor CPU time,
 *    the most contention-resistant measure) — normalized per 1000 docs;
 *  - a fixed-work single-thread calibration probe runs before every slice
 *    rep; its wall time on this JVM is a constant on an idle host, so
 *    inflation over the session minimum quantifies ambient drag inside the
 *    same JSON artifact;
 *  - flagship / pairs / full3 reps are INTERLEAVED (one of each per round)
 *    so an ambient burst lands across slices instead of poisoning all reps
 *    of whichever slice happened to run during it.
 */
object Bench {

  /** Headline queries: flagship pipeline + each operator family once.
    * q_ann_top3 (brute-force O(n²) ANN) is intentionally NOT here: it is a
    * documented oracle baseline, not an engine path — the ANN headline is
    * the LSH variant. It stays in SparkEntry.queries/oracleSql, so the
    * correctness gate still covers it. */
  val headline: Seq[String] = Seq(
    "q_pipeline_clusters", "q_minhash_pairs", "q_ngram_jaccard_pairs",
    "q_cc_clusters", "q_text_profile", "q_ann_lsh_top3",
    "q_suffix_spans", "q_linkage_pairs", "q_multimodal_features",
    "q_exact_dup_pairs", "q_vocab_count", "q_topk_per_lang",
    "q_multifield_pairs", "q_cosine_lsh_pairs")

  def makeSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // GRAFT_AQE=false: session-level AQE off, for stage-level tools
      // (Profile et al.) that call operators OUTSIDE DedupPipeline's
      // planningScope — at 1M pages with many live caches, AQE's
      // TableCacheQueryStageExec recache path NPEs inside Spark
      // (SparkPlan.session null on the AQE thread pool); the pipeline
      // itself already runs AQE-off below 10M docs and is unaffected.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      // zstd halved the distributed protocol's shuffle-byte volume and
      // erased its 4-executor per-core inflation (see ScalingCluster);
      // locally the 32 writer threads share the same disk, A/B'd below.
      // GRAFT_IO_CODEC overrides for A/B runs.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "zstd"))
      .config("spark.shuffle.file.buffer", "1m")
      // NOTE: autoBroadcastJoinThreshold stays at the 10m default. A 128m
      // experiment backfired: Catalyst under-estimates array-column
      // projections, tried to broadcast a ~1.2 GB signature side at 120k
      // pages and died on driver.maxResultSize. The verify joins win their
      // speed from the hashed-array merge kernel, not from broadcasting.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Accumulating task-time listener: core-ms (task durations) + CPU-ns
    * (executor CPU time). Deltas between [[drained]] snapshots around a
    * slice give its load-invariant cost — CPU time especially barely moves
    * under co-tenant contention, where wall time swings 2×+. */
  final class TaskClock extends org.apache.spark.scheduler.SparkListener {
    private val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      taskMs.addAndGet(e.taskInfo.duration)
      val m = e.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
    def snapshot(): (Long, Long) = (taskMs.get(), cpuNs.get())
    /** Snapshot after the async listener bus has gone quiet (no new
      * task-end events for quietMs; bounded total wait). */
    def drained(quietMs: Long = 200, maxWaitMs: Long = 3000): (Long, Long) = {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var last = snapshot()
      var quietSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
          System.nanoTime() - quietSince < quietMs * 1000000L) {
        Thread.sleep(25)
        val cur = snapshot()
        if (cur != last) { last = cur; quietSince = System.nanoTime() }
      }
      last
    }
  }

  @volatile private var probeSink = 0L
  /** Fixed-work single-thread calibration probe (pure mix64 loop, no
    * allocation): its wall time on this JVM is a constant on an idle host;
    * inflation over the session minimum measures ambient co-tenant drag at
    * that moment. ~100 ms idle at the default 2^25 iterations. */
  def loadProbeMs(iters: Int = 1 << 25): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < iters) { x = graft.functions.Hashing.mix64(x + i); i += 1 }
    probeSink = x // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e6
  }

  private lazy val memProbeArr = {
    val a = new Array[Long](1 << 23) // 64 MiB — far past any LLC
    var i = 0
    while (i < a.length) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }
  /** Fixed-work DRAM-bandwidth probe: the ALU probe above is blind to
    * memory-subsystem contention (a register-only loop runs at full speed
    * while co-tenants saturate DRAM — measured round 5: probeMs 152 vs idle
    * 147 while the same jar's 1-executor pipeline leg ran 35% slower).
    * This sweeps a 64 MiB array at cache-line stride 8 times, so its wall
    * time moves with available bandwidth. */
  def memProbeMs(sweeps: Int = 8): Double = {
    val a = memProbeArr
    val t0 = System.nanoTime()
    var s = 0L
    var k = 0
    while (k < sweeps) {
      var i = 0
      while (i < a.length) { s += a(i); i += 8 } // 64 B stride
      k += 1
    }
    probeSink = s
    (System.nanoTime() - t0) / 1e6
  }

  /** One measured slice run: wall throughput + load-invariant task sums. */
  final case class SliceRun(dps: Double, rows: Long, wallSec: Double,
      coreSec: Double, cpuSec: Double)

  private def measured(spark: SparkSession, clock: Option[TaskClock],
      nPages: Int)(body: => Long): SliceRun = {
    val before = clock.map(_.drained())
    val t0 = System.nanoTime()
    val n = body
    val secs = (System.nanoTime() - t0) / 1e9
    val after = clock.map(_.drained())
    val (coreSec, cpuSec) = (before, after) match {
      case (Some((ms0, ns0)), Some((ms1, ns1))) =>
        ((ms1 - ms0) / 1e3, (ns1 - ns0) / 1e9)
      case _ => (-1.0, -1.0)
    }
    SliceRun(nPages / secs, n, secs, coreSec, cpuSec)
  }

  /** End-to-end pipeline slice on an nPages corpus (fresh, uncached). */
  def pipelineSlice(spark: SparkSession, nPages: Int,
      clock: Option[TaskClock] = None): SliceRun = {
    val (pages, _) = PageCorpus.generate(spark, nPages, SparkEntry.cfg.seed)
    val df = pages.toDF()
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val run = measured(spark, clock, nPages) {
      val result = new DedupPipeline(spark, SparkEntry.cfg).run(df)
      val n = result.assignments.count()
      result.signatures.unpersist(); result.candidates.unpersist()
      result.verified.unpersist(); result.assignments.unpersist()
      n
    }
    df.unpersist()
    run
  }

  /** Pairs-only slice (reference `predict_pairs` work shape: signatures →
    * blocking → tier-1 estimate verify; no CC, no assignment) on an nPages
    * corpus (fresh, uncached). The apples-to-apples slice against
    * BASELINE.md's 10,600 rec/s HNSW-search number.
    *
    * allStages = false (the headline `pairs_docs_per_sec`): MinHash LSH
    * only — the exact work shape of the reference's predict, which
    * searches ONE index per record. allStages = true
    * (`pairs_full3_docs_per_sec`): this engine's full 3-stage blocking
    * union, reported alongside because it is what the flagship recall
    * architecture actually runs. */
  def pairsSlice(spark: SparkSession, nPages: Int, allStages: Boolean = false,
      clock: Option[TaskClock] = None): SliceRun = {
    val (pages, _) = PageCorpus.generate(spark, nPages, SparkEntry.cfg.seed)
    val df = pages.toDF()
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val run = measured(spark, clock, nPages) {
      new DedupPipeline(spark, SparkEntry.cfg).runPairs(df,
        useSimhash = allStages, useSpans = allStages).count()
    }
    df.unpersist()
    run
  }

  /** Back-compat forms (Scaling / tools callers): wall throughput only. */
  def pipelineDocsPerSec(spark: SparkSession, nPages: Int): (Double, Long) = {
    val r = pipelineSlice(spark, nPages); (r.dps, r.rows)
  }
  def pairsDocsPerSec(spark: SparkSession, nPages: Int,
      allStages: Boolean = false): (Double, Long) = {
    val r = pairsSlice(spark, nPages, allStages); (r.dps, r.rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = makeSession(cpus)
    val clock = new TaskClock
    spark.sparkContext.addSparkListener(clock)

    // JIT/codegen warmup: a tiny end-to-end pipeline run (~40s of first-query
    // latency otherwise lands on whichever query happens to run first);
    // same for the probe loop
    pipelineSlice(spark, 500)
    loadProbeMs(); loadProbeMs(); memProbeMs(); memProbeMs()
    spark.catalog.clearCache()

    // Best-of-2 per query: a single shot on this time-shared host has shown
    // run-to-run disparities up to ~3x (driver BENCH_r02 vs the identical
    // jar measured interleaved) — the min of two runs is the closest
    // estimate of what the engine itself costs. Failures are surfaced in a
    // `failed` list instead of silently reporting a wall time for a query
    // that returned nothing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val runs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count() catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1L
          }
          val secs = (System.nanoTime() - t0) / 1e9
          // drop persisted blocks a query left behind so later measurements
          // don't pay its cache-eviction pressure
          spark.catalog.clearCache()
          (secs, n)
        }
        val ok = runs.filter(_._2 >= 0)
        if (ok.isEmpty) (name, runs.map(_._1).min, -1L)
        else (name, ok.map(_._1).min, ok.head._2)
      }
    }
    val failed = results.collect { case (n, _, -1L) => n }

    // flagship + pairs slices at a corpus sized ~16x the documents table (a
    // larger job amortizes the fixed driver time — Catalyst planning + CC
    // rounds — which would otherwise be ~15% of the wall and all noise).
    // Reps are INTERLEAVED — one (flagship, pairs, full3) round per rep —
    // with a calibration probe before each slice (see object scaladoc).
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nPages = math.max(2000, (nDocs * 16).toInt)
    val flagshipReps = math.max(reps, 3)
    val slices = Seq("flagship", "pairs", "full3")
    val obs = scala.collection.mutable.Map[String, Vector[(SliceRun, Double)]]()
      .withDefaultValue(Vector.empty)
    val memProbes = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to flagshipReps; s <- slices) {
      val probe = loadProbeMs()
      memProbes += memProbeMs()
      val r = s match {
        case "flagship" => pipelineSlice(spark, nPages, Some(clock))
        case "pairs" => pairsSlice(spark, nPages, clock = Some(clock))
        case _ => pairsSlice(spark, nPages, allStages = true, clock = Some(clock))
      }
      obs(s) = obs(s) :+ (r, probe)
    }
    // wall stat stays max-of-reps (best ≈ least co-tenant-disturbed);
    // task sums take min-of-reps (same reasoning in cost space)
    def dpsOf(s: String) = obs(s).map(_._1.dps).max
    def corePerKdoc(s: String) =
      obs(s).map(_._1.coreSec).min / (nPages / 1000.0)
    def cpuPerKdoc(s: String) =
      obs(s).map(_._1.cpuSec).min / (nPages / 1000.0)
    val probes = obs.values.flatten.map(_._2).toVector.sorted
    val probeStats = (probes.head, probes(probes.size / 2), probes.last)
    val mems = memProbes.toVector.sorted
    val memStats = (mems.head, mems(mems.size / 2), mems.last)

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // methodology is IN the JSON (advisor finding: cross-round comparisons
    // must not silently mix methodologies — r1/r2 were single-shot, no
    // warmup, flagship at 8x; schema 2 = warmup + min-of-reps per query,
    // max-of-flagshipReps flagship at 16x, q_ann_top3 excluded by design;
    // schema 3 = slice reps interleaved + core/cpu-seconds + load probe;
    // +mem_probe_ms: fixed-work DRAM sweep before each slice rep — the
    // bandwidth-contention signal the ALU probe cannot see)
    val method =
      s"""{"schema":3,"reps":$reps,"per_query_stat":"min","flagship_reps":$flagshipReps,"flagship_stat":"max","corpus_multiplier":16,"warmup":true,"excluded":["q_ann_top3"],"pairs_slice":"minhash-only estimate (reference one-index shape); pairs_full3 = 3-stage union","slice_order":"interleaved per rep: flagship,pairs,full3","core_seconds":"SparkListener task-duration sum (min of reps)","cpu_seconds":"SparkListener executorCpuTime sum (min of reps)","load_probe":"single-thread fixed-work wall ms before each slice rep (min/med/max)","mem_probe":"single-thread 64MiB x8 cache-line-stride sweep wall ms (min/med/max)"}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","pipeline_pages":$nPages""" +
      f""","pipeline_docs_per_sec":${dpsOf("flagship")}%.1f""" +
      f""","pairs_docs_per_sec":${dpsOf("pairs")}%.1f""" +
      f""","pairs_full3_docs_per_sec":${dpsOf("full3")}%.1f""" +
      f""","pipeline_core_seconds_per_kdoc":${corePerKdoc("flagship")}%.3f""" +
      f""","pipeline_cpu_seconds_per_kdoc":${cpuPerKdoc("flagship")}%.3f""" +
      f""","pairs_core_seconds_per_kdoc":${corePerKdoc("pairs")}%.3f""" +
      f""","pairs_cpu_seconds_per_kdoc":${cpuPerKdoc("pairs")}%.3f""" +
      f""","full3_core_seconds_per_kdoc":${corePerKdoc("full3")}%.3f""" +
      f""","full3_cpu_seconds_per_kdoc":${cpuPerKdoc("full3")}%.3f""" +
      f""","load_probe_ms":{"min":${probeStats._1}%.1f,"med":${probeStats._2}%.1f,"max":${probeStats._3}%.1f}""" +
      f""","mem_probe_ms":{"min":${memStats._1}%.1f,"med":${memStats._2}%.1f,"max":${memStats._3}%.1f}""" +
      s""","method":$method}"""
    println(json)
    // sbt wraps stdout in [info] prefixes which breaks the driver's JSON
    // parse — also write the raw line to a plain file it can pick up
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH/result.json"), json + "\n")
    SparkEntry.releaseCorpus(spark)
    spark.stop()
  }
}
