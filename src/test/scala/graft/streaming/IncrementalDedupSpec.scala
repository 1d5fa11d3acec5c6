package graft.streaming

import graft.SparkSuite
import graft.config.GraftConfig
import graft.corpus.PageCorpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  val cfg = GraftConfig.default

  test("streaming pages find their near-duplicates in the static corpus") {
    // static corpus: pages 0..599; stream: fresh variants of the same clusters
    val (pages, truth) = PageCorpus.generateLocal(600, cfg.seed)
    val staticDf = spark.createDataset(pages.toSeq).toDF()
    val bands = IncrementalDedup.staticBandTable(staticDf, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // new crawl snapshot: unseen variants (variant index 90+) of clusters
    // that have >= 2 members in the static corpus
    val bigClusters = truth.groupBy(_.cluster).filter(_._2.length >= 3).keys.take(5).toSeq
    val newPages = bigClusters.zipWithIndex.map { case (c, i) =>
      (10000L + i, PageCorpus.makeText(cfg.seed, c, 90))
    }
    val stream = MemoryStream[(Long, String)](spark)
    val streamDf = stream.toDF().select(col("_1").as("id"), col("_2").as("text"))

    val cands = IncrementalDedup.candidates(streamDf, bands, cfg)
    val q = cands.writeStream.format("memory").queryName("inc_cands")
      .outputMode("append").start()
    stream.addData(newPages)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("inc_cands").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every streamed page must hit at least one member of its source cluster
    val clusterMembers = truth.groupBy(_.cluster).view.mapValues(_.map(_.id).toSet).toMap
    bigClusters.zipWithIndex.foreach { case (c, i) =>
      val hits = got.filter(_._1 == 10000L + i).map(_._2)
      assert(hits.intersect(clusterMembers(c)).nonEmpty,
        s"streamed variant of cluster $c found no static near-dup")
    }
    bands.unpersist()
  }
}
