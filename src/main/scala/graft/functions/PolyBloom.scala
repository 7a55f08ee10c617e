package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic cross-engine Bloom filter over the 61-bit poly-hash
  * family — the fixed-memory decontamination state (A9/q87) with a bit
  * pattern that plain SQL can re-derive.
  *
  * Spark's own `BloomFilterAggregate` re-hashes its input internally
  * (xxhash64 rounds), so any query through it is rows-only checkable —
  * that was q87's standing no-oracle reason. This filter instead derives
  * its k probe positions from the ALREADY poly-hashed key with pure
  * integer arithmetic (classic Kirsch–Mitzenmacher double hashing,
  * power-of-two m):
  *
  *   h1 = h mod m,  h2 = ((h div m) mod m) | 1   (odd → full cycle on 2^s)
  *   posᵢ = (h1 + i·h2) mod m,  i = 0..k−1
  *
  * identical in DuckDB as `(h % m + i * (((h // m) % m) | 1)) % m` over
  * `range(k)` — so a membership decision (all k bits set) is the same
  * boolean on both engines, FALSE POSITIVES INCLUDED, and q87 graduates
  * from rows-only to hash-exact. Inputs must be non-negative (the poly
  * family is ≤ 2^61−1; a negative key fails loud rather than silently
  * diverging from the SQL `%`/`//` floor conventions).
  *
  * Standard Bloom contracts, spec-pinned in SketchSpec: no false
  * negatives ever; merge = bitwise OR (associative, commutative,
  * duplicate- and order-invariant — partial aggregation and any
  * partitioning produce the identical byte array); fp rate ≈
  * (1 − e^(−k·n/m))^k, engine-independent because the positions are.
  */
object PolyBloomMath {

  def checkParams(numBits: Int, k: Int): Unit = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"poly_bloom: numBits must be a power of 2 >= 64, got $numBits")
    require(k >= 1 && k <= 16, s"poly_bloom: k must be in [1,16], got $k")
  }

  /** Width guard shared by add/contains: probing (or folding into) a
    * filter at the WRONG numBits computes positions mod the wrong m —
    * silent false negatives, the one error class a Bloom filter must
    * never have — or indexes out of bounds. Fail loud instead; the SQL
    * surface takes caller-supplied numBits, so this is reachable.
    */
  private def checkWidth(bits: Array[Byte], numBits: Int): Unit =
    if (bits.length.toLong * 8 != numBits) {
      throw new IllegalArgumentException(
        s"poly_bloom: filter is ${bits.length * 8L} bits but numBits=" +
          s"$numBits — build and probe widths must match")
    }

  /** Set key `h`'s k bits in `bits` (len = numBits/8). */
  def add(bits: Array[Byte], h: Long, numBits: Int, k: Int): Unit = {
    checkWidth(bits, numBits)
    if (h < 0) throw new IllegalArgumentException(
      s"poly_bloom: negative key $h — keys must be the non-negative " +
        "poly-hash family")
    val m = numBits.toLong
    val h1 = h % m
    val h2 = ((h / m) % m) | 1L
    var i = 0
    while (i < k) {
      val p = ((h1 + i * h2) % m).toInt
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** True iff all k of key `h`'s bits are set (static for codegen). */
  def contains(bits: Array[Byte], h: Long, numBits: Int, k: Int): Boolean = {
    checkWidth(bits, numBits)
    if (h < 0) throw new IllegalArgumentException(
      s"poly_bloom: negative key $h — keys must be the non-negative " +
        "poly-hash family")
    val m = numBits.toLong
    val h1 = h % m
    val h2 = ((h / m) % m) | 1L
    var i = 0
    while (i < k) {
      val p = ((h1 + i * h2) % m).toInt
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Fold a non-negative BIGINT key column into one poly-Bloom BINARY value
  * (numBits/8 bytes). Buffer is the raw byte array, OR-merged — at a
  * grouped call site each group pays numBits/8 bytes of state; the
  * decontamination path uses ONE global group (a 1 MiB filter at the
  * default 2^23 bits).
  */
case class PolyBloomAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  PolyBloomMath.checkParams(numBits, k)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "poly_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_bloom_agg: key must be BIGINT, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numBits >>> 3)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      PolyBloomMath.add(buffer, v.asInstanceOf[Long], numBits, k)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) = (buffer(i) | other(i)).toByte
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PolyBloomAgg =
    copy(child = newChild)
}

/** Membership probe against a [[PolyBloomAgg]] value — codegen'd; the
  * filter side is normally a collected-bytes literal broadcast inside the
  * plan (the q87 shape). False positives possible (same ones on every
  * engine); false negatives never. NULL filter or key → NULL.
  */
case class PolyBloomContains(
    left: Expression, right: Expression, numBits: Int, k: Int)
  extends BinaryExpression {

  PolyBloomMath.checkParams(numBits, k)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "poly_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poly_bloom_contains: (filter BINARY, key BIGINT) expected, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(f: Any, h: Any): Any =
    PolyBloomMath.contains(
      f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], numBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.PolyBloomMath.contains($f, $h, $numBits, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyBloomContains =
    copy(left = newLeft, right = newRight)
}
