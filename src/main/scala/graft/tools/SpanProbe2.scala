package graft.tools
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.functions.TextSignatures
object SpanProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.makeSession("32")
    import spark.implicits._
    val cfg = GraftConfig.default
    val (pages, _) = graft.SparkEntry.corpus(spark, 2000)
    pages.count()
    val winnowUdf = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else TextSignatures.winnow(TextSignatures.normalize(text), cfg.spanGramLen, cfg.winnowWindow) }
    val normUdf = udf { (text: String) => if (text == null) "" else new String(TextSignatures.normalize(text)) }
    val d = pages.select(col("id").cast("long").as("id"), normUdf(col("text")).as("ntext")).persist()
    val memberships = d.select(col("id"), explode(winnowUdf(col("ntext"))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket").orderBy("id")
    val capped = memberships.withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
    val groups = capped.groupBy("bucket")
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .filter(size(col("members")) >= 2)
      .select(col("members")).distinct()
      .select(xxhash64(col("members")).as("gkey"), col("members"))
      .persist()
    val n = groups.count()
    println(s"[sp] distinct groups=$n")
    // strict-subset count: candidate pairs share >= 1 member
    val gm = groups.select(col("gkey"), explode(col("members")).as("id"))
    val cand = gm.as("a").join(gm.as("b"), col("a.id") === col("b.id") && col("a.gkey") =!= col("b.gkey"))
      .select(col("a.gkey").as("ga"), col("b.gkey").as("gb")).distinct()
    val withM = cand
      .join(groups.select(col("gkey").as("ga"), col("members").as("ma")), "ga")
      .join(groups.select(col("gkey").as("gb"), col("members").as("mb")), "gb")
    val subsets = withM.filter(
      (size(col("ma")) < size(col("mb")) ||
        (size(col("ma")) === size(col("mb")) && col("ga") < col("gb"))) &&
      size(array_except(col("ma"), col("mb"))) === 0)
      .select("ga").distinct().count()
    println(s"[sp] strict-subset groups=$subsets")
    // pair volume by group size
    groups.select(size(col("members")).as("sz")).groupBy("sz").count().orderBy("sz").show(50)
    spark.stop()
  }
}
