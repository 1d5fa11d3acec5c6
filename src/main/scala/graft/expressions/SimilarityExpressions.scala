package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftSqlBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the pair-verification hot path.
 *
 * Why not Scala UDFs: a ScalaUDF over Array[Long] deserializes each
 * ArrayData into a fresh JVM array per call — at web scale the verify stage
 * evaluates one comparison per candidate pair (pair-entity ratio x corpus
 * size calls), so the two array copies per pair dominate. These expressions
 * read the unsafe ArrayData buffers directly and stay inside whole-stage
 * codegen via a static call (preference order per SURVEY.md §4: built-in <
 * custom Expression < UDF).
 */
object SimilarityExpressions {

  /** Exact Jaccard of two SORTED distinct long arrays (merge-intersect). */
  def jaccardSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Fraction of agreeing positions of two equal-length long arrays. */
  def minhashAgreement(a: Column, b: Column): Column =
    ExpressionUtils.column(MinHashAgreement(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register SQL names (optional convenience for spark.sql users). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", exprs => JaccardSorted(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agreement", exprs => MinHashAgreement(exprs(0), exprs(1)), "scala_udf")
  }
}

case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  // input typing enforced structurally: both children must be ARRAY<BIGINT>
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == LongType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaccardSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

object JaccardSorted {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0 // empty must not match empty (P13)
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

case class MinHashAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  // input typing enforced structurally: both children must be ARRAY<BIGINT>
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == LongType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_agreement"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashAgreement.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.MinHashAgreement.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAgreement =
    copy(left = newLeft, right = newRight)
}

object MinHashAgreement {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return 0.0
    var i = 0; var eq = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }
}
