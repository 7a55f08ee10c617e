package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Symmetric int8 scalar quantization of a float embedding (the ANN
  * memory/scan-cost leg): `code_i = floor(v_i / max|v| · 127 + 0.5f)` —
  * round-half-up via the explicit floor identity, every intermediate a
  * correctly-rounded float32 op, so plain SQL re-derives the codes
  * bit-identically (the q116 hash-exact contract; see the boundary-class
  * note in [[Sq8Math.encode]]). One byte per dimension — 4× fewer bytes
  * than float32 in the scan that dominates IVF search cost at 100 TB. The per-vector scale is deliberately NOT
  * stored: cosine is scale-invariant in each argument, so ranking against
  * the raw codes loses only the ~7-bit rounding of the DIRECTION, never
  * the magnitude (which is why this works for cosine search and would be
  * wrong for L2). NULL or NaN element → NULL codes (a vector with
  * unknown or poisoned slots has no faithful quantization — the
  * [[CosineSimilarity]] contract; NaN→0 would silently diverge the
  * quantized ranking from the float path on exactly the bad vectors);
  * empty array → empty codes; zero vector → all-zero codes (its cosine
  * is NULL/error downstream either way, matching the float path).
  */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode: input must be array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Sq8Math.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sq8Res")
      s"""
         |byte[] $r = graft.functions.Sq8Math.encode($a);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Cosine similarity between a float-array probe and [[Sq8Encode]] codes —
  * the ranking expression of the quantized IVF scan. Numerically this IS
  * [[CosineSimilarity]] over (probe, dequantized codes) because the
  * dropped per-vector scale cancels in cosine; same left-to-right double
  * accumulation, same length-mismatch throw, same zero-norm Divide
  * semantics (NULL under non-ANSI, DIVIDE_BY_ZERO under ANSI — NaN would
  * sort above every real similarity in a descending top-k).
  */
case class Sq8Cosine(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_cosine: inputs must be (array<float>, binary), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8Math.cosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Array[Byte]], failOnError)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sq8Cos")
      s"""
         |java.lang.Double $r =
         |  graft.functions.Sq8Math.cosine($a, $b, $failOnError);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Cosine =
    copy(left = newLeft, right = newRight)
}

/** Static loops for generated Java (the [[CosineSimilarityMath]] pattern). */
object Sq8Math {

  def encode(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0f
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val f = v.getFloat(i)
      // NaN has no faithful quantization either — abs(NaN) never updates
      // mx and round(NaN)==0, so without this guard a NaN dim would
      // silently quantize to code 0 while the float cosine path
      // propagates NaN/NULL: quantized and exact rankings would diverge
      // on exactly the poisoned vectors that should surface as bad input.
      if (java.lang.Float.isNaN(f)) return null
      val a = math.abs(f)
      if (a > mx) mx = a
      i += 1
    }
    if (mx == 0.0f) return out // zero vector → all-zero codes
    i = 0
    while (i < n) {
      // Deliberately floor(x + 0.5f), NOT Math.round: since JDK 9
      // (JDK-8010430) Math.round(0.49999997f) == 0 while the float sum
      // 0.49999997f + 0.5f rounds UP to 1.0f — so the two differ on the
      // largest-float-below-k+0.5 boundary class. floor(x + 0.5f) is the
      // spelling plain SQL reproduces exactly (FLOOR(x + CAST(0.5 AS
      // FLOAT)) — the q116 oracle), and the ≤2⁻²⁴-wide deviation from
      // round-half-up is immaterial to a 7-bit quantizer whose whole
      // rounding step loses ~2⁻⁸ of direction anyway.
      out(i) = math.floor(
        (v.getFloat(i) / mx * 127.0f + 0.5f).toDouble).toInt.toByte
      i += 1
    }
    out
  }

  def cosine(p: ArrayData, codes: Array[Byte], failOnError: Boolean)
      : java.lang.Double = {
    val n = p.numElements()
    if (codes.length != n) {
      throw new IllegalArgumentException(
        s"sq8_cosine: probe has $n dims but codes have ${codes.length} — " +
          "truncating would silently compare the wrong vectors; fix the " +
          "embedding dims (or the index).")
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (p.isNullAt(i)) return null
      val xi = p.getFloat(i).toDouble
      val yi = codes(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) {
      if (failOnError) {
        throw CosineSimilarityMath.raiseDivideByZero()
      }
      return null
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
