package graft.tools

import org.apache.spark.sql.functions._

/** Round-6: isolate the hyperplane bucket UDF cost (driver-side replica vs
  * in-plan). Usage: runMain graft.tools.AnnProbe2 <sfDir> <cores> */
object AnnProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1)
    val spark = graft.Bench.makeSession(cores)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nTables = 6; val nPlanes = 12; val seed = 42L
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[annprobe2] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(nTables, nPlanes, dim) { (t, p, d) =>
        (0 until 4).map { r =>
          val h = graft.functions.Hashing.mix64(
            seed ^ (t.toLong << 40) ^ (p.toLong << 20) ^ (d.toLong << 2) ^ r)
          (h >>> 11) * 1.1102230246251565e-16 - 0.5
        }.sum
      }
    time("plane table build (driver)")(())
    // driver-side replica over collected vectors
    val vecs = emb.select(transform(col("embedding"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    time(s"driver loop over ${vecs.length} vecs x2") {
      var sink = 0L
      for (_ <- 1 to 2; v <- vecs) {
        var t = 0
        while (t < nTables) {
          var bits = 0L
          var p = 0
          while (p < nPlanes) {
            val plane = planes(t)(p)
            var dot = 0.0
            var d = 0
            while (d < dim && d < v.length) { dot += v(d) * plane(d); d += 1 }
            if (dot >= 0) bits |= (1L << p)
            p += 1
          }
          sink ^= bits
          t += 1
        }
      }
      println("  sink=" + sink)
    }
    val bucketsUdf = udf { (v: Seq[Double]) =>
      Array.tabulate(nTables) { t =>
        var bits = 0L
        var p = 0
        while (p < nPlanes) {
          val plane = planes(t)(p)
          var dot = 0.0
          var d = 0
          while (d < dim && d < v.length) { dot += v(d) * plane(d); d += 1 }
          if (dot >= 0) bits |= (1L << p)
          p += 1
        }
        bits + (t.toLong << 32)
      }
    }
    val e = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v")).persist()
    e.count()
    time("in-plan UDF pass 1") {
      println("  n=" + e.select(explode(bucketsUdf(col("v")))).count())
    }
    time("in-plan UDF pass 2") {
      println("  n=" + e.select(explode(bucketsUdf(col("v")))).count())
    }
    time("in-plan UDF pass 3 (no explode)") {
      println("  n=" + e.select(bucketsUdf(col("v")).as("b")).count())
    }
    val ndUdf = bucketsUdf.asNondeterministic()
    time("project-then-explode (nondet)") {
      println("  n=" + e.select(col("id"), ndUdf(col("v")).as("bs"))
        .select(col("id"), explode(col("bs")).as("bucket")).count())
    }
    time("project-then-explode (nondet) x2") {
      println("  n=" + e.select(col("id"), ndUdf(col("v")).as("bs"))
        .select(col("id"), explode(col("bs")).as("bucket")).count())
    }
    time("plain explode(udf) deterministic") {
      println("  n=" + e.select(col("id"), explode(bucketsUdf(col("v"))).as("bucket")).count())
    }
    @volatile var cls: String = ""
    val arrUdf = udf { (v0: Seq[Double]) =>
      if (cls.isEmpty) cls = v0.getClass.getName
      val v = v0.toArray
      Array.tabulate(nTables) { t =>
        var bits = 0L
        var p = 0
        while (p < nPlanes) {
          val plane = planes(t)(p)
          var dot = 0.0
          var d = 0
          val n = math.min(dim, v.length)
          while (d < n) { dot += v(d) * plane(d); d += 1 }
          if (dot >= 0) bits |= (1L << p)
          p += 1
        }
        bits + (t.toLong << 32)
      }
    }
    time("explode(udf) with toArray input") {
      println("  n=" + e.select(col("id"), explode(arrUdf(col("v"))).as("bucket")).count())
    }
    time("explode(udf) with toArray input x2") {
      println("  n=" + e.select(col("id"), explode(arrUdf(col("v"))).as("bucket")).count())
    }
    println("  input class seen by udf: " + cls)
    spark.stop()
  }
}
