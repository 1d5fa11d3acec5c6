package graft.expressions

import graft.SparkSuite
import graft.config.GraftConfig
import graft.functions.TextSignatures
import org.apache.spark.sql.functions._

/** TextShingleJaccard must be BITWISE-identical to jaccardSorted over the
  * stored shingle arrays — it is the verify tier's replacement for them. */
class TextShingleJaccardSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = GraftConfig.default

  private def reference(a: String, b: String): Double = {
    val sa = TextSignatures.shingleSet(TextSignatures.normalize(a), cfg.shingleK)
    val sb = TextSignatures.shingleSet(TextSignatures.normalize(b), cfg.shingleK)
    graft.functions.Hashing.jaccardSorted(sa, sb)
  }

  test("equals stored-shingle jaccard on random texts (codegen path)") {
    val rnd = new scala.util.Random(7)
    def word() = ("a" + rnd.nextInt(40)) + (if (rnd.nextBoolean()) "x" else "")
    val texts = (0 until 60).map { i =>
      if (i % 7 == 0) "" // empty
      else if (i % 11 == 0) "ab" // shorter than k
      else (0 until 5 + rnd.nextInt(60)).map(_ => word()).mkString(" ") +
        (if (i % 5 == 0) "  Tabs\tand\nNEWLINES  " else "")
    }
    val pairs = for (a <- texts; b <- texts.take(8)) yield (a, b)
    val df = pairs.toDF("a", "b")
    val got = df.select(
      SimilarityExpressions.textShingleJaccard(col("a"), col("b"), cfg.shingleK))
      .collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) => reference(a, b) }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"pair $i: got $g want $w (${pairs(i)})")
    }
  }

  test("non-ASCII fallback path matches the String kernel") {
    val pairs = Seq(
      ("Füße größer ÉTÉ", "füße  größer été"),
      ("naïve café — déjà vu", "naïve café déjà vu"),
      ("日本語のテキストです、重複検出", "日本語のテキストです 重複検出"),
      ("mixed ascii and 中文 content here", "mixed ascii and 中文 content there"))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      SimilarityExpressions.textShingleJaccard(col("a"), col("b"), cfg.shingleK))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == reference(a, b), s"($a, $b)")
    }
  }

  test("interpreted eval matches codegen") {
    val df = Seq(("the quick brown fox", "the quick brown cat")).toDF("a", "b")
    val expr = SimilarityExpressions.textShingleJaccard(col("a"), col("b"), 5)
    val cg = df.select(expr).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(expr).head().getDouble(0)
      assert(cg == interp && cg == reference("the quick brown fox", "the quick brown cat"))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
