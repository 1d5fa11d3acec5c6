package graft.tools

import org.apache.spark.sql.functions._

/** TEMPORARY iteration probe (round 5, verdict item #7): re-derive the CC
  * loop's partition right-sizing at the 2-10M edge shape. Builds a
  * synthetic edge set matching the verified-pair profile at 1M pages
  * (bounded clusters <= 24 members as chains + ladders, ~2.25 edges/node)
  * and times components() with the loop forced (driverFinishEdges=0) at
  * several rows-per-partition targets, plus the driver finish for the
  * crossover comparison. Deleted once constants land in
  * ConnectedComponents. Usage: runMain graft.tools.CcTune [nEdgesM] [cores]
  */
object CcTune {
  def main(args: Array[String]): Unit = {
    val nEdgesM = if (args.length > 0) args(0).toDouble else 2.25
    val cores = if (args.length > 1) args(1) else "32"
    val spark = graft.Bench.makeSession(cores)
    import spark.implicits._

    // clusters of size 24: 23 chain edges + 24 ladder edges (id, id+2) →
    // ~2 edges/node, plus 10% random cross-noise within a bounded window
    val nEdges = (nEdgesM * 1e6).toLong
    val nClusters = (nEdges / 47.0).toLong
    val edges = spark.range(nClusters).select(col("id").as("c"))
      .select(explode(sequence(lit(0), lit(22))).as("i"), col("c"))
      .select((col("c") * 24 + col("i")).as("id1"),
        (col("c") * 24 + col("i") + 1).as("id2"))
      .union(spark.range(nClusters).select(col("id").as("c"))
        .select(explode(sequence(lit(0), lit(21))).as("i"), col("c"))
        .select((col("c") * 24 + col("i")).as("id1"),
          (col("c") * 24 + col("i") + 2).as("id2")))
      // noise stays LOCAL (within one 24-node cluster span): verified
      // true-dup edges never bridge clusters, so components stay bounded —
      // a giant component is not the workload shape
      .union(spark.range(nEdges / 10).select(
        pmod(xxhash64(col("id")), lit(nClusters * 24)).as("id1"))
        .select(col("id1"),
          (col("id1") - pmod(col("id1"), lit(24)) +
            pmod(xxhash64(col("id1"), lit(7)), lit(24))).as("id2")))
      .localCheckpoint()
    val n = edges.count()
    println(f"[cctune] edges=$n%,d clusters=$nClusters%,d")

    // loop at several rows-per-partition targets (patch via conf knob)
    for (target <- Seq(100000L, 250000L, 500000L, 1000000L, 2000000L)) {
      spark.conf.set("graft.cc.rowsPerPartition", target.toString)
      val t0 = System.nanoTime()
      val nc = graft.operators.ConnectedComponents
        .components(edges, driverFinishEdges = 0L)
        .agg(countDistinct(col("component"))).head().getLong(0)
      println(f"[cctune] loop target=$target%,10d  ${(System.nanoTime() - t0) / 1e9}%7.2f s  components=$nc%,d")
    }
    spark.conf.unset("graft.cc.rowsPerPartition")

    // driver finish at the same size (crossover comparison)
    val t0 = System.nanoTime()
    val nc = graft.operators.ConnectedComponents
      .components(edges, driverFinishEdges = Long.MaxValue)
      .agg(countDistinct(col("component"))).head().getLong(0)
    println(f"[cctune] driver-finish        ${(System.nanoTime() - t0) / 1e9}%7.2f s  components=$nc%,d")
    spark.stop()
  }
}
