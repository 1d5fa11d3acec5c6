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

  /** Agreement fraction over PACKED 8-bit minhash lanes (8 per long) —
    * the narrow tier-1 payload (TextSignatures.Sig.minhash8). `numPerm`
    * bounds the lane scan: the final long's unused lanes are zero-padded
    * on BOTH sides and would otherwise count as phantom agreements when
    * numPerm is not a multiple of 8. */
  def minhashAgreementPacked(a: Column, b: Column, numPerm: Int): Column =
    ExpressionUtils.column(MinHashAgreementPacked(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), numPerm))

  /** Exact k-shingle Jaccard recomputed from the two TEXTS (normalize →
    * shingle-hash, same kernel as TextSignatures) — bitwise-identical to
    * jaccardSorted over stored shingle arrays, without ever storing or
    * shuffling them (a shingle array is ~8 bytes/char of corpus; the text
    * itself is ~8x smaller). */
  def textShingleJaccard(a: Column, b: Column, k: Int): Column =
    ExpressionUtils.column(TextShingleJaccard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), k))

  /** Dot product of two ARRAY<DOUBLE> columns — the embedding-similarity
    * hot path. The `aggregate(zip_with(...))` higher-order-function form is
    * NOT codegen-fused and boxes per element (measured: the cosine LSH
    * rescore spent most of its wall in HOF eval); this is the same
    * left-to-right float summation order, bitwise-identical results. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
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

case class TextShingleJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && k >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments and k >= 1")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_shingle_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextShingleJaccard.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextShingleJaccard.compute($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextShingleJaccard =
    copy(left = newLeft, right = newRight)
}

object TextShingleJaccard {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.{Hashing, TextSignatures}

  /** Per-thread scratch: two normalize buffers + two shingle sets. Verify
    * runs once per candidate pair — per-pair allocation here is exactly the
    * write-bandwidth churn that breaks N→4N scaling (see TextSignatures
    * Scratch note). */
  private final class S {
    var bufA: Array[Char] = new Array[Char](8192)
    var bufB: Array[Char] = new Array[Char](8192)
    val setA = new Hashing.ScratchLongSet(4096)
    val setB = new Hashing.ScratchLongSet(4096)
  }
  private val tl: ThreadLocal[S] = ThreadLocal.withInitial(() => new S)

  /** Decode + normalize (identical semantics to TextSignatures.normalize:
    * lowercase, collapse whitespace runs, trim) into the chosen scratch
    * buffer; returns normalized length. ASCII fast path decodes bytes in
    * place; non-ASCII falls back to the String-based kernel (rare for web
    * text after extraction, still correct). */
  private def normalizeInto(u: UTF8String, sc: S, slotA: Boolean): Int = {
    val nb = u.numBytes
    var buf = if (slotA) sc.bufA else sc.bufB
    if (buf.length < nb) {
      buf = new Array[Char](Integer.highestOneBit(math.max(nb, 16) - 1) << 1)
      if (slotA) sc.bufA = buf else sc.bufB = buf
    }
    var ascii = true
    var i = 0
    while (i < nb) {
      if (u.getByte(i) < 0) { ascii = false; i = nb }
      i += 1
    }
    if (ascii) {
      var j = 0
      var pendingSpace = false
      i = 0
      while (i < nb) {
        val c = u.getByte(i).toChar
        if (Character.isWhitespace(c)) {
          if (j > 0) pendingSpace = true
        } else {
          if (pendingSpace) { buf(j) = ' '; j += 1; pendingSpace = false }
          buf(j) = Character.toLowerCase(c); j += 1
        }
        i += 1
      }
      j
    } else {
      val cs = TextSignatures.normalize(u.toString)
      if (buf.length < cs.length) {
        buf = new Array[Char](Integer.highestOneBit(cs.length - 1) << 1)
        if (slotA) sc.bufA = buf else sc.bufB = buf
      }
      System.arraycopy(cs, 0, buf, 0, cs.length)
      cs.length
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, k: Int): Double = {
    val sc = tl.get()
    val la = normalizeInto(a, sc, slotA = true)
    sc.setA.clear()
    if (la >= k) {
      var i = 0
      val last = la - k
      while (i <= last) {
        sc.setA.add(Hashing.hashChars(sc.bufA, i, i + k))
        i += 1
      }
    }
    val lb = normalizeInto(b, sc, slotA = false)
    sc.setB.clear()
    var inter = 0
    if (lb >= k) {
      var i = 0
      val last = lb - k
      while (i <= last) {
        val h = Hashing.hashChars(sc.bufB, i, i + k)
        if (sc.setB.add(h) && sc.setA.contains(h)) inter += 1
        i += 1
      }
    }
    val na = sc.setA.size
    val nb = sc.setB.size
    if (na == 0 && nb == 0) return 0.0 // empty must not match empty (P13)
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

case class MinHashAgreementPacked(left: Expression, right: Expression,
    numPerm: Int) extends BinaryExpression {
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
  override def prettyName: String = "minhash_agreement_packed"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashAgreementPacked.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.MinHashAgreementPacked.compute($a, $b, $numPerm)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAgreementPacked =
    copy(left = newLeft, right = newRight)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Left-to-right summation — the same FP order as
    * aggregate(zip_with(a, b, _*_), 0.0, _+_), so results are
    * bitwise-identical to the HOF form it replaces. Vectors are expected
    * equal-length (embedding columns); extra trailing elements on either
    * side are ignored. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

object MinHashAgreementPacked {
  /** Fraction of equal 8-bit lanes over the first numPerm lanes. */
  def compute(a: ArrayData, b: ArrayData, numPerm: Int): Double = {
    val n = a.numElements()
    if (n == 0 || n != b.numElements() || numPerm <= 0) return 0.0
    val lanes = math.min(numPerm, n * 8)
    var i = 0
    var eq = 0
    while (i < lanes) {
      val z = a.getLong(i >>> 3) ^ b.getLong(i >>> 3)
      if (((z >>> ((i & 7) * 8)) & 0xFFL) == 0L) eq += 1
      i += 1
    }
    eq.toDouble / lanes
  }
}
