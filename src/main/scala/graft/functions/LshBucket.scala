package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Integer-quantized random-hyperplane LSH bucket id over a float-array
  * column, as a codegen'd Catalyst expression.
  *
  * Replaces the interpreted nested-HOF form (`aggregate(sequence(...),
  * aggregate(sequence(...)))` ≈ bits×dims lambda evaluations per row —
  * the round-1 bench's slowest data path) with one fused JVM loop that
  * stays inside whole-stage codegen. The math is IDENTICAL to the HOF
  * form and to the DuckDB oracle, because every step is integer
  * arithmetic:
  *
  *   q_d      = floor(double(emb[d]) * 1000)                 (quantize)
  *   sign_i,d = ((i+off)*31 + d) * 1103515245 + 12345) % 97 < 48 ? +1 : -1
  *   dot_i    = Σ_{d=1..dims} q_d * sign_i,d                 (long sum)
  *   bucket   = Σ_{i=0..bits-1} (dot_i >= 0) << i
  *
  * Contract: the array must have EXACTLY `dims` non-null elements. A
  * shorter array under the HOF form silently NULLed every projection and
  * collapsed the whole corpus into one bucket — the O(n²) cross join LSH
  * exists to avoid. Here a mismatch throws (see [[LshBucketMath.compute]]).
  */
case class LshBucket(child: Expression, bits: Int, dims: Int, planeOffset: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  // Analysis-time type guard: the quantize loop reads 4-byte float slots
  // out of UnsafeArrayData — an array<double>/array<int> child would
  // "work" and produce garbage bucket ids. Same fail-loudly contract as
  // the dims check, but caught before any row is evaluated.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket: embedding must be array<float>, got ${other.simpleString} — " +
        "reading another element width at float offsets would silently " +
        "produce wrong bucket ids")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBucketMath.compute(input.asInstanceOf[ArrayData], bits, dims, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshBucketMath.compute($a, $bits, $dims, $planeOffset);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** The fused bucket loop, in a plain object so generated Java can call the
  * static forwarder directly (one invokestatic per row; the loop itself is
  * JIT-compiled Scala, not interpreted Catalyst lambdas).
  */
object LshBucketMath {

  def compute(arr: ArrayData, bits: Int, dims: Int, planeOffset: Int): Long = {
    val n = arr.numElements()
    if (n != dims) {
      throw new IllegalArgumentException(
        s"lsh_bucket: embedding has $n elements but dims=$dims was configured — " +
          "a silent mismatch would hash every vector into bucket 0 and turn the " +
          "bucketed join into an all-pairs cross join; fix dims (or the data).")
    }
    val q = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      if (arr.isNullAt(d)) {
        // getFloat on a null slot reads 0.0f — a null-containing embedding
        // would get a plausible bucket while the HOF baseline yields NULL.
        throw new IllegalArgumentException(
          s"lsh_bucket: embedding element $d is NULL — the contract requires " +
            s"exactly $dims non-null elements; a zero-filled read would " +
            "silently mis-bucket the vector.")
      }
      q(d) = math.floor(arr.getFloat(d).toDouble * 1000.0).toLong
      d += 1
    }
    var bucket = 0L
    var i = 0
    while (i < bits) {
      var dot = 0L
      var dd = 1
      while (dd <= dims) {
        dot += q(dd - 1) * sign(i, dd, planeOffset)
        dd += 1
      }
      if (dot >= 0L) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  /** The hyperplane-sign LCG, the single source of truth shared with
    * [[graft.OracleGen]] (which embeds these signs as +/- literals in the
    * generated DuckDB SQL — a second copy of the constants there could
    * silently drift the q42/q119 oracles out of bit-identity). `d` is
    * 1-based, matching [[compute]]'s inner loop; small static method, JIT
    * inlines it in the per-row path.
    */
  def sign(i: Int, d: Int, planeOffset: Int): Long =
    if ((((i.toLong + planeOffset) * 31L + d) * 1103515245L + 12345L) % 97L < 48L) 1L
    else -1L

  /** Column-API surface (companion to [[GraftFunctions.cosine_similarity]]). */
  def lshBucketCol(embedding: Column, bits: Int, dims: Int,
                   planeOffset: Int): Column =
    GraftFunctions.column(
      LshBucket(GraftFunctions.expr(embedding), bits, dims, planeOffset))
}
