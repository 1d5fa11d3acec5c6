package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (local iteration aid;
    // the driver always calls with exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // engine default (measured round 5, see Bench.makeSession): zstd
      // shuffle compression — fewer bytes through shared storage
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.file.buffer", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // One-sided oracles (see SparkEntry.oracleSql) read the emitted results
    // back via DuckDB: mirror each result dir under the fixed aux path.
    val mirrorBase = Paths.get(s"${SparkEntry.auxDir}/out")
    def mirror(name: String): Unit = {
      val src = Paths.get(s"$outDir/$name")
      val dst = mirrorBase.resolve(name)
      if (Files.exists(dst)) {
        Files.walk(dst).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.createDirectories(dst)
      Files.walk(src).forEach { p =>
        val rel = src.relativize(p)
        val t = dst.resolve(rel.toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        mirror(name)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.releaseCorpus(spark)
    spark.stop()
  }
}
