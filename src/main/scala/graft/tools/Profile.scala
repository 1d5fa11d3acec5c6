package graft.tools

import graft.config.GraftConfig
import graft.corpus.PageCorpus
import graft.operators._
import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of the flagship pipeline.
  * Usage: runMain graft.tools.Profile [nPages] [cores] */
object Profile {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toInt else 20000
    val cores = if (args.length > 1) args(1) else "8"
    val spark = graft.Bench.makeSession(cores)
    val cfg = GraftConfig.default

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pages = time("corpus generate+cache") {
      val (p, _) = PageCorpus.generate(spark, nPages, cfg.seed)
      val df = p.toDF()
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      df
    }
    val sigs = time("signatures (materialize)") {
      val s = Signatures.compute(pages, cfg, emitShingles = false)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count()
      s
    }
    val mh = time("minhash stage") {
      val r = CandidateGen.minhashStage(sigs, cfg)
      val c = r.candidates.persist(); println(s"  minhash cands: ${c.count()}"); c
    }
    val sh = time("simhash stage") {
      val r = CandidateGen.simhashStage(sigs, cfg)
      val c = r.candidates.persist(); println(s"  simhash cands: ${c.count()}"); c
    }
    val sp = time("span stage") {
      val r = CandidateGen.spanStage(sigs, cfg)
      val c = r.candidates.persist(); println(s"  span cands: ${c.count()}"); c
    }
    val cands = time("union+dedup") {
      val c = mh.union(sh).union(sp)
        .groupBy("id1", "id2").agg(min("stage").as("stage")).persist()
      println(s"  total cands: ${c.count()}"); c
    }
    val verified = time("jaccard verify") {
      val v = JaccardVerify.verify(cands, sigs, cfg,
        texts = Some(pages.select(col("id"), col("text")))).persist()
      println(s"  verified: ${v.count()}"); v
    }
    val comps = time("connected components") {
      val c = ConnectedComponents.components(verified); c.count(); c
    }
    time("assignment") {
      Clustering.assignAll(pages.select("id"), comps, normalizeIds = false).count()
    }
    spark.stop()
  }
}
