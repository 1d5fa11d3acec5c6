package graft.expressions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilarityExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("JaccardSorted native expression: exact values incl. empty semantics") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(2L, 3L, 4L)), // 2/4
      (Array(1L, 2L), Array(1L, 2L)), // 1
      (Array.empty[Long], Array.empty[Long]), // 0 (P13)
      (Array(1L), Array(2L))) // 0
      .toDF("a", "b")
    val got = df.select(SimilarityExpressions.jaccardSorted($"a", $"b")).collect()
      .map(_.getDouble(0)).toList
    assert(got == List(0.5, 1.0, 0.0, 0.0))
  }

  test("interpreted eval matches codegen (both paths)") {
    val df = Seq((Array(1L, 5L, 9L), Array(5L, 9L, 11L))).toDF("a", "b")
    val expected = 2.0 / 4.0
    // codegen path (wholestage on)
    assert(df.select(SimilarityExpressions.jaccardSorted($"a", $"b"))
      .head().getDouble(0) == expected)
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.select(SimilarityExpressions.jaccardSorted($"a", $"b"))
        .head().getDouble(0) == expected)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("DotProduct native expression: bitwise-identical to the HOF form, both eval paths") {
    import org.apache.spark.sql.functions._
    val df = Seq((Array(0.1, -2.5, 3.75, 0.0), Array(1.5, 0.25, -0.5, 9.0)))
      .toDF("a", "b")
    val hof = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
    assert(df.select(SimilarityExpressions.dotProduct($"a", $"b"))
      .head().getDouble(0) == hof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.select(SimilarityExpressions.dotProduct($"a", $"b"))
        .head().getDouble(0) == hof)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("MinHashAgreement native expression") {
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 7L))).toDF("a", "b")
    assert(df.select(SimilarityExpressions.minhashAgreement($"a", $"b"))
      .head().getDouble(0) == 0.5)
  }

  test("SQL registration works") {
    SimilarityExpressions.register(spark)
    Seq((Array(1L, 2L), Array(2L, 3L))).toDF("a", "b").createOrReplaceTempView("jt")
    val v = spark.sql("SELECT jaccard_sorted(a, b) FROM jt").head().getDouble(0)
    assert(v == 1.0 / 3.0)
  }

  test("null inputs yield null (dropped by threshold filters)") {
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]])).toDF("a", "b")
    val r = df.select(SimilarityExpressions.jaccardSorted($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("MinHashAgreementPacked: lane equality matches the full-value agreement") {
    val cfg = graft.config.GraftConfig.default
    val rnd = new scala.util.Random(3)
    def doc() = (0 until 30 + rnd.nextInt(60)).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
    val pairs = (0 until 40).map { i =>
      val a = doc()
      val b = if (i % 2 == 0) a.replace("w1", "w2") else doc()
      (graft.functions.TextSignatures.compute(a, cfg),
        graft.functions.TextSignatures.compute(b, cfg))
    }
    val df = pairs.map { case (sa, sb) =>
      (sa.minhash, sb.minhash, sa.minhash8, sb.minhash8)
    }.toDF("a", "b", "pa", "pb")
    val got = df.select(
      SimilarityExpressions.minhashAgreement($"a", $"b"),
      SimilarityExpressions.minhashAgreementPacked($"pa", $"pb", cfg.numPerm)).collect()
    got.foreach { r =>
      val full = r.getDouble(0); val packed = r.getDouble(1)
      // packed can only OVER-estimate (8-bit lane false-equals, p=1/256
      // per disagreeing lane) and by at most a few lanes
      assert(packed >= full && packed - full <= 4.0 / cfg.numPerm,
        s"full=$full packed=$packed")
    }
    // identical signatures agree exactly at 1.0
    val self = pairs.head._1
    val one = Seq((self.minhash8, self.minhash8)).toDF("pa", "pb")
      .select(SimilarityExpressions.minhashAgreementPacked($"pa", $"pb", cfg.numPerm))
      .head().getDouble(0)
    assert(one == 1.0)
    // numPerm NOT a multiple of 8: the padded tail lanes are excluded —
    // disjoint 100-perm signatures must score 0.0, not 4/104
    val cfg100 = cfg.copy(numPerm = 100, bands = 25, rowsPerBand = 4)
    val x = graft.functions.TextSignatures.compute("alpha beta gamma delta epsilon", cfg100)
    val y = graft.functions.TextSignatures.compute("zz qq ww ee rr tt yy uu", cfg100)
    val frac = Seq((x.minhash8, y.minhash8)).toDF("pa", "pb")
      .select(SimilarityExpressions.minhashAgreementPacked($"pa", $"pb", 100))
      .head().getDouble(0)
    val fullAgree = x.minhash.zip(y.minhash).count { case (p, q) => p == q }
    // packed-over-100-lanes can only exceed full agreement via real 8-bit
    // collisions, never via the 4 phantom padding lanes
    assert(frac * 100 >= fullAgree && frac * 100 <= fullAgree + 3,
      s"frac=$frac full=$fullAgree")
  }
}
