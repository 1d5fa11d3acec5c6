package graft.tools

import graft.corpus.PageCorpus
import graft.pipeline.DedupPipeline
import org.apache.spark.storage.StorageLevel

/** TEMPORARY A/B harness (round 5): the pairs slice profile shows ~half its
  * wall in sequential low-parallelism jobs under the eager localCheckpoint —
  * AQE stage-chaining + the checkpoint's row-copy materialization. Compare,
  * at the bench shape (80k pages, local[32], best-of-3 warm):
  *   a) current runPairs (AQE on, localCheckpoint)
  *   b) AQE off
  *   c) plain count() on the lazy plan (no checkpoint; sigs cache released
  *      after — only valid when the caller consumes the pairs ONCE)
  *   d) AQE off + plain count()
  * Usage: runMain graft.tools.PairsTune [nPages] [cores] [flagship]
  *   arg(2) = "flagship" A/Bs the full pipeline (run) instead: AQE on/off.
  */
object PairsTune {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 80000
    val cores = if (args.length > 1) args(1) else "32"
    val flagship = args.length > 2 && args(2) == "flagship"
    val spark = graft.Bench.makeSession(cores)

    val (pages, _) = PageCorpus.generate(spark, nPages, graft.SparkEntry.cfg.seed)
    val df = pages.toDF()
    df.persist(StorageLevel.MEMORY_AND_DISK).count()

    def run(aqe: Boolean, checkpoint: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      val p = new DedupPipeline(spark, graft.SparkEntry.cfg)
      if (checkpoint) p.runPairs(df, useSimhash = false, useSpans = false).count()
      else {
        // lazy-plan count: mirrors runPairsPlan without the checkpoint
        val m = classOf[DedupPipeline].getDeclaredMethods
          .find(_.getName.contains("runPairsPlan")).get
        m.setAccessible(true)
        val (plan, caches) = m.invoke(p, df, Boolean.box(false), Boolean.box(true),
          Boolean.box(false), Boolean.box(false))
          .asInstanceOf[(org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame])]
        plan.count()
        caches.foreach(_.unpersist())
      }
      (System.nanoTime() - t0) / 1e9
    }

    def runFlagship(aqe: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      val result = new DedupPipeline(spark, graft.SparkEntry.cfg).run(df)
      result.assignments.count()
      Seq(result.signatures, result.candidates, result.verified,
        result.assignments).foreach(_.unpersist())
      (System.nanoTime() - t0) / 1e9
    }

    if (flagship) {
      runFlagship(aqe = true) // warmup
      for ((name, aqe) <- Seq(("flag aqeOn ", true), ("flag aqeOff", false))) {
        val best = (1 to 3).map(_ => runFlagship(aqe)).min
        println(f"[pairstune] $name best-of-3 $best%6.2f s  (${nPages / best}%7.0f dps)")
      }
    } else {
      run(aqe = true, checkpoint = true) // warmup
      for ((name, aqe, cp) <- Seq(("aqeOn+ckpt ", true, true), ("aqeOff+ckpt", false, true),
          ("aqeOn+count", true, false), ("aqeOff+count", false, false))) {
        val best = (1 to 3).map(_ => run(aqe, cp)).min
        println(f"[pairstune] $name best-of-3 $best%6.2f s  (${nPages / best}%7.0f dps)")
      }
    }
    spark.stop()
  }
}
