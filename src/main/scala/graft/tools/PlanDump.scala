package graft.tools
import graft.config.GraftConfig
import graft.operators._
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.makeSession("4")
    val cfg = GraftConfig.default
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = Signatures.compute(docs, cfg, "doc_id", "text")
    println("===== SIGNATURES =====")
    sigs.explain("formatted")
    val m = sigs.select(col("id"), explode(col("band_keys")).as("bucket"))
    val r = BucketJoin.pairs(m, cfg.maxBandBucket, "minhash")
    println("===== BUCKET JOIN =====")
    r.pairs.explain("formatted")
    spark.stop()
  }
}
