package graft.pipeline

import graft.SparkSuite
import graft.config.GraftConfig
import graft.corpus.PageCorpus
import java.nio.file.Files

/**
 * North-rule gate: "resumable from checkpoint" — a re-run skips completed
 * stages and produces byte-identical results; a killed-after-stage-k run
 * resumes from stage k+1.
 */
class ResumeSpec extends SparkSuite {

  val cfg = GraftConfig.default

  test("checkpointed run persists stages + lineage; resume skips completed stages") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val (pages, _) = PageCorpus.generate(spark, 400, cfg.seed)
    val df = pages.toDF()

    val r1 = new DedupPipeline(spark, cfg, Some(dir)).run(df)
    val a1 = r1.assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // all stage outputs + markers + lineage exist
    for (stage <- Seq("signatures", "candidates", "verified", "clusters")) {
      assert(new java.io.File(s"$dir/$stage/_GRAFT_OK").exists(), s"$stage marker")
    }
    assert(new java.io.File(s"$dir/lineage").exists())
    val lineage = spark.read.parquet(s"$dir/lineage")
    assert(lineage.columns.toSet == Set("partition", "rows", "stage"))
    assert(lineage.count() > 0)

    // resume: delete the LAST stage's marker only — earlier stages must be
    // loaded, the deleted one recomputed, and results byte-identical
    new java.io.File(s"$dir/clusters/_GRAFT_OK").delete()
    val r2 = new DedupPipeline(spark, cfg, Some(dir)).run(df)
    val a2 = r2.assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a2 == a1, "resumed run must match original exactly")

    // full resume (all markers intact): instant stage loads, same output
    val r3 = new DedupPipeline(spark, cfg, Some(dir)).run(df)
    val a3 = r3.assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a3 == a1)
  }

  test("checkpointed and un-checkpointed runs agree") {
    val dir = Files.createTempDirectory("graft_ckpt2").toString
    val (pages, _) = PageCorpus.generate(spark, 300, cfg.seed + 1)
    val df = pages.toDF()
    val ck = new DedupPipeline(spark, cfg, Some(dir)).run(df)
      .assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mem = new DedupPipeline(spark, cfg, None).run(df)
      .assignments.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ck == mem)
  }
}
