package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product quantization (the ANN memory leg BEYOND [[Sq8Encode]]): the
  * d-dim embedding splits into `m` contiguous subvectors, each snapped to
  * its nearest of `k` per-subspace k-means centroids — ONE byte per
  * subspace, so a 64-dim float32 vector becomes 8 bytes (32× smaller;
  * SQ8's 64 bytes is 4×). At 100 TB the quantized ranking scan reads
  * `m` bytes per vector through parquet column pruning while the
  * codebook (m·k·(d/m) floats — ~16 KB at the defaults) rides inside the
  * plan as a reference object, so scan cost is bounded by CODE bytes,
  * not embedding bytes.
  *
  * The codebook is a flat row-major float array: centroid (mi, ki) lives
  * at `[(mi·k + ki)·sub, +sub)` with `sub = d/m`. Codes index k ≤ 256.
  *
  * NULL/NaN element → NULL codes (the [[Sq8Encode]] contract: a vector
  * with unknown slots has no faithful quantization, and NaN→whatever
  * would silently diverge quantized and exact rankings on exactly the
  * bad vectors). Empty array → empty codes. `d % m != 0` throws — a
  * silent truncation would quantize a prefix and rank garbage.
  */
case class PqEncode(child: Expression, codebook: Array[Float], m: Int, k: Int)
    extends UnaryExpression {

  require(m >= 1, s"pq_encode: m must be >= 1, got $m")
  require(k >= 1 && k <= 256, s"pq_encode: k must be in [1,256], got $k")
  require(codebook.length % (m * k) == 0 && codebook.nonEmpty,
    s"pq_encode: codebook length ${codebook.length} is not a multiple of m*k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode: input must be array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqMath.encode(input.asInstanceOf[ArrayData], codebook, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("pqRes")
      s"""
         |byte[] $r = graft.functions.PqMath.encode($a, $cb, $m, $k);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Cosine similarity between a float-array probe and [[PqEncode]] codes —
  * numerically IDENTICAL to [[CosineSimilarity]] over (probe,
  * reconstructed vector): the same left-to-right double accumulation over
  * dims in order, the same `dot / (sqrt(na)·sqrt(nb))`, the same NULL on
  * zero norms (non-ANSI division semantics) — bit-identity is
  * spec-pinned. The scan-side win is I/O shape, not arithmetic: the
  * ranking pass reads m BYTES per vector (the codes column), never the
  * d·4-byte embedding.
  */
case class PqCosine(left: Expression, right: Expression,
                    codebook: Array[Float], m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_cosine: expected (array<float>, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(probe: Any, codes: Any): Any =
    PqMath.cosine(probe.asInstanceOf[ArrayData],
      codes.asInstanceOf[Array[Byte]], codebook, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, (p, c) => {
      val r = ctx.freshName("pqCos")
      s"""
         |Object $r = graft.functions.PqMath.cosine($p, $c, $cb, $m, $k);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCosine =
    copy(left = newLeft, right = newRight)
}

/** Orthonormal rotation of a float vector by a LITERAL d×d matrix (row-
  * major) — the learned-OPQ front end ([[PqEncode]] then runs in the
  * rotated space, where the per-subspace quantizer loses less). The
  * matrix rides the plan as a reference object like the codebook; the
  * multiply accumulates in doubles and narrows once per output element
  * (deterministic). Rotation preserves inner products and norms, so
  * cosine in the rotated space IS cosine in the original — the refine
  * step can re-score against unrotated float embeddings unchanged.
  * NULL/NaN element → NULL (the [[PqEncode]] contract); dimension
  * mismatch throws.
  */
case class VecRotate(child: Expression, r: Array[Float], d: Int)
    extends UnaryExpression {

  require(d >= 1 && r.length == d * d,
    s"vec_rotate: matrix has ${r.length} floats, expected d*d = ${d * d}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_rotate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_rotate: input must be array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqMath.rotate(input.asInstanceOf[ArrayData], r, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rm = ctx.addReferenceObj("rotMatrix", r, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("rotRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.PqMath.rotate($a, $rm, $d);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecRotate =
    copy(child = newChild)
}

object PqMath {

  /** R·v with double accumulation, one float narrowing per output dim.
    * NULL/NaN element → null; wrong dimension throws (a silent partial
    * rotation would quantize garbage).
    */
  def rotate(v: ArrayData, r: Array[Float], d: Int): ArrayData = {
    val n = v.numElements()
    if (n != d) {
      throw new IllegalArgumentException(
        s"vec_rotate: embedding has $n dims, matrix expects $d")
    }
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      val f = v.getFloat(i)
      if (java.lang.Float.isNaN(f)) return null
      x(i) = f.toDouble
      i += 1
    }
    val out = new Array[Float](d)
    i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val base = i * d
      while (j < d) { s += r(base + j) * x(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Nearest-centroid code per subspace, squared-L2, ties to the LOWEST
    * code (deterministic encode ⇒ deterministic downstream dedup keys).
    */
  def encode(v: ArrayData, codebook: Array[Float], m: Int, k: Int)
      : Array[Byte] = {
    val d = v.numElements()
    if (d == 0) return Array.emptyByteArray
    if (d % m != 0) {
      throw new IllegalArgumentException(
        s"pq_encode: embedding has $d dims, not divisible by m=$m — " +
          "a silent prefix quantization would rank garbage; fix m (or the data).")
    }
    val sub = d / m
    require(codebook.length == m * k * sub,
      s"pq_encode: codebook has ${codebook.length} floats, expected " +
        s"m*k*sub = ${m * k * sub} for $d-dim input")
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      if (java.lang.Float.isNaN(v.getFloat(i))) return null
      i += 1
    }
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * sub
        var dist = 0.0
        var si = 0
        while (si < sub) {
          val diff = v.getFloat(mi * sub + si).toDouble - codebook(base + si)
          dist += diff * diff
          si += 1
        }
        if (dist < bestDist) { bestDist = dist; best = ki }
        ki += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Cosine(probe, reconstructed codes) with CosineSimilarity's exact
    * accumulation order and zero-norm semantics (returns null).
    */
  def cosine(p: ArrayData, codes: Array[Byte], codebook: Array[Float],
             m: Int, k: Int): java.lang.Double = {
    val sub = codebook.length / (m * k)
    val d = p.numElements()
    if (codes.length != m || d != m * sub) {
      throw new IllegalArgumentException(
        s"pq_cosine: probe has $d dims, codes ${codes.length} subspaces — " +
          s"expected ${m * sub} dims and $m codes; a mismatch would rank " +
          "against the wrong centroids.")
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < d) {
      if (p.isNullAt(i)) return null
      val pi = p.getFloat(i).toDouble
      val mi = i / sub
      val base = ((mi * k) + (codes(mi) & 0xff)) * sub
      val ci = codebook(base + (i % sub)).toDouble
      dot += pi * ci
      na += pi * pi
      nb += ci * ci
      i += 1
    }
    if (na == 0.0 || nb == 0.0) return null
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
