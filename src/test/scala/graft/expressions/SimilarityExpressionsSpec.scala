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
}
