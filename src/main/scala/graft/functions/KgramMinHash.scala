package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style char-k-gram min-hash of a string column, as a codegen'd
  * Catalyst expression: `min over i of xxhash64(substring(text, i, k))` for
  * every k-char window (one window of the whole text when it is shorter
  * than k — the SQL substring clamp).
  *
  * Replaces the interpreted HOF form
  * `array_min(transform(sequence(1, greatest(length(text)-k+1, 1)),
  * i -> xxhash64(substring(text, i, k))))` — ~chars-per-doc lambda
  * evaluations and a per-row array materialization (the q36 bench's
  * whole cost) — with one fused loop that hashes each window's BYTES in
  * place: char boundaries are walked once, and every window hash reads
  * the original UTF8String buffer through an offset, zero copies.
  * Bit-identical to the HOF form on every non-null text (same per-window
  * xxhash64, seed 42, over the same UTF-8 bytes — FunctionsSpec asserts
  * equality, ASCII and multi-byte). One deliberate difference: NULL text
  * yields NULL here, where the HOF chain collapses it to the bare seed
  * (greatest(null,1)=1, xxhash64(NULL)=42) — a NULL document should have
  * no fingerprint, not a constant one (spec-pinned).
  */
case class KgramMinHash(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = LongType
  override def prettyName: String = "kgram_min_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_min_hash: text must be STRING, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    KgramMinHashMath.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.KgramMinHashMath.compute($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): KgramMinHash =
    copy(child = newChild)
}

/** The fused window-hash loop (static forwarder for generated Java — the
  * [[LshBucketMath]] pattern).
  */
object KgramMinHashMath {

  private val Seed = 42L // Spark's xxhash64 default seed

  def compute(text: UTF8String, k: Int): Long = {
    val numChars = text.numChars()
    if (numChars <= k) {
      // the HOF form's single clamped window: hash the whole text
      return XXH64.hashUTF8String(text, Seed)
    }
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    // byte offset of each char boundary (numChars + 1 entries)
    val bounds = new Array[Int](numChars + 1)
    var c = 0
    var pos = 0
    while (pos < nBytes) {
      bounds(c) = pos
      pos += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + pos))
      c += 1
    }
    bounds(numChars) = nBytes
    var min = Long.MaxValue
    var w = 0
    val nWindows = numChars - k + 1
    while (w < nWindows) {
      val s = bounds(w)
      val h = XXH64.hashUnsafeBytes(base, off + s, bounds(w + k) - s, Seed)
      if (h < min) min = h
      w += 1
    }
    min
  }

  /** Column-API surface (companion to [[LshBucketMath.lshBucketCol]]). */
  def kgramMinHashCol(text: Column, k: Int): Column =
    GraftFunctions.column(KgramMinHash(GraftFunctions.expr(text), k))
}
