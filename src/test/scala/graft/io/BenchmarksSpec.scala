package graft.io

import graft.SparkSuite
import java.nio.file.Files

/** Deepmatcher-shaped loader round-trip (reference benchmarks/base.py:93-128). */
class BenchmarksSpec extends SparkSuite {

  test("two-source dataset: union-tagged records, globally unique ids, shifted pairs") {
    val dir = Files.createTempDirectory("bench_ds").toString
    def w(name: String, lines: String*): String = {
      val p = java.nio.file.Paths.get(dir, name)
      Files.writeString(p, lines.mkString("\n")); p.toString
    }
    val a = w("tableA.csv", "id,name", "0,acme anvil", "1,roadrunner trap")
    val b = w("tableB.csv", "id,name", "0,acme anvil deluxe", "1,giant magnet")
    val tr = w("train.csv", "ltable_id,rtable_id,label",
      "0,0,1", "1,1,0")
    val ds = Benchmarks.load(spark, Benchmarks.DatasetConfig(
      "toy", a, Some(b), trainPairs = Some(tr)))

    val recs = ds.records.collect()
    assert(recs.length == 4)
    val ids = recs.map(_.getAs[Long]("id")).toSet
    assert(ids == Set(0L, 1L, 2L, 3L), s"ids must be globally unique: $ids")
    assert(ds.rightIdOffset == 2L)
    val bySource = recs.groupBy(_.getAs[String]("source"))
    assert(bySource("left").map(_.getAs[Long]("id")).toSet == Set(0L, 1L))
    assert(bySource("right").map(_.getAs[Long]("id")).toSet == Set(2L, 3L))

    val pos = ds.train.get.pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = ds.train.get.neg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == Set((0L, 2L)), "rtable id must be shifted into the global space")
    assert(neg == Set((1L, 3L)))
    assert(ds.valid.isEmpty && ds.test.isEmpty)
  }

  test("single-table dedup dataset with cluster column coercion") {
    val dir = Files.createTempDirectory("bench_ds1").toString
    val p = java.nio.file.Paths.get(dir, "t.csv")
    Files.writeString(p, Seq("id,text,cluster_id",
      "7,some text,100", "8,other text,100").mkString("\n"))
    val ds = Benchmarks.load(spark, Benchmarks.DatasetConfig(
      "toy1", p.toString, clusterField = Some("cluster_id")))
    val recs = ds.records.collect()
    assert(recs.map(_.getAs[Long]("id")).toSet == Set(7L, 8L))
    assert(recs.map(_.getAs[Long]("cluster_id")).toSet == Set(100L))
    assert(ds.train.isEmpty && ds.rightIdOffset == 0L)
  }

  test("single-table dataset with labeled pairs: loaded unshifted, not discarded") {
    val dir = Files.createTempDirectory("bench_ds2").toString
    val t = java.nio.file.Paths.get(dir, "t.csv")
    Files.writeString(t, Seq("id,text", "1,aa", "2,ab", "3,zz").mkString("\n"))
    val tr = java.nio.file.Paths.get(dir, "train.csv")
    Files.writeString(tr, Seq("ltable_id,rtable_id,label",
      "1,2,1", "1,3,0").mkString("\n"))
    val ds = Benchmarks.load(spark, Benchmarks.DatasetConfig(
      "toy2", t.toString, trainPairs = Some(tr.toString)))
    val pos = ds.train.get.pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = ds.train.get.neg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == Set((1L, 2L)) && neg == Set((1L, 3L)))
  }
}
