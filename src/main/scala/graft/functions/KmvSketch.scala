package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{element_at, lit, size, when}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (bottom-k / K-Minimum-Values) distinct-count sketch over the
  * poly-hash family — the DETERMINISTIC member of the engine's mergeable
  * sketch state (A4), beside the randomized Datasketches HLL/theta pair.
  *
  * State = the k smallest DISTINCT hash values seen (ascending
  * `array<bigint>`, shorter when fewer than k distincts exist). Estimate =
  * exact size below k, else `(k−1)·M / h₍ₖ₎` (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007 — RSE ≈ 1/√(k−2)). What the classic sketch
  * buys HERE, on top of a distinct estimate:
  *
  *  - **Bit-exact cross-engine**: the state is a pure order statistic of
  *    the key set — no internal re-hash, no randomness — so plain SQL
  *    re-derives state AND estimate exactly (`row_number() ≤ k` over the
  *    same affine-mixed poly hashes), and q219 is hash-checked where the
  *    HLL twin (q51/q84) is rows-only by nature.
  *  - **Lossless merge**: bottomₖ(A ∪ B) = bottomₖ(bottomₖ(A) ∪
  *    bottomₖ(B)) — an IDENTITY, not an error bound, so rollups from
  *    persisted daily state equal the direct computation byte-for-byte
  *    under any partitioning or merge tree (SketchSpec pins this; the
  *    HLL union is lossless only at fixed lgK, theta only in
  *    distribution).
  *
  * Keys must be affine-mixed first ([[PolyHashes]] member 0, SQL twin
  * `OracleGen.polyAffine`): the raw 61-bit poly hash of a SHORT string
  * never wraps mod M, so its values cluster near 0 and the kth order
  * statistic wildly over-estimates (measured 10⁴× off on decimal ids; the
  * affine mix restores ~1.3% at k=256 on the same data). Negative keys
  * fail loud — the poly domain is [0, 2^61), and silently folding a
  * foreign hash family in would corrupt the order statistic.
  */
object KmvSketch {

  def checkK(k: Int): Unit =
    require(k >= 2 && k <= 65536, s"kmv: k must be in [2, 65536], got $k")

  /** The estimate as a Column over a [[KmvSketchAgg]]/[[KmvUnionAgg]]
    * state array: exact below k, else `(k−1)·M / h₍ₖ₎` — one double
    * multiply (constant-folded) and one divide, the same op order the
    * oracle SQL writes, so the DOUBLE is bit-exact cross-engine.
    */
  def kmvEstimate(state: Column, k: Int): Column = {
    checkK(k)
    when(size(state) < k, size(state).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(PolyHashMath.M.toDouble) /
        element_at(state, k).cast("double"))
  }

  private[functions] def toBytes(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def fromBytes(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  private[functions] def addCapped(buf: java.util.TreeSet[java.lang.Long],
      h: Long, k: Int): Unit = {
    if (h < 0) throw new IllegalArgumentException(
      s"kmv_sketch_agg: negative key $h — keys must be the non-negative " +
        "affine-mixed poly-hash family")
    if (buf.size() < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  private[functions] def evalArray(buf: java.util.TreeSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }
}

/** Shared TreeSet-buffer plumbing for the fold and union sides — ONE
  * implementation of buffer lifecycle, merge, eval, and (de)serialization
  * so the two aggregates can never drift (review finding: the pair was
  * copy-pasted). Subclasses supply only their input handling.
  */
private[functions] trait KmvBufferOps
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  def k: Int

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.addCapped(buffer, it.next(), k)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.evalArray(buffer)

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.fromBytes(bytes)
}

/** Fold non-negative BIGINT keys into KMV state (`array<bigint>`, the ≤k
  * smallest distinct values ascending). Buffer is a live TreeSet —
  * duplicate keys occupy no slot, updates are O(log k) with an O(1)
  * reject of keys above the current kth minimum (the steady-state path:
  * once warm, almost every key short-circuits on one compare).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvBufferOps
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  KmvSketch.checkK(k)

  override def prettyName: String = "kmv_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch_agg: key must be BIGINT, got ${other.simpleString}")
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvSketch.addCapped(buffer, v.asInstanceOf[Long], k)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Union of persisted KMV state arrays — the consume side for daily state
  * rows. Because the merge identity is exact, union-from-state output is
  * byte-identical to a direct [[KmvSketchAgg]] over the raw keys. NULL
  * state rows (keys with no state) are skipped.
  *
  * SOUNDNESS DIRECTION: the identity holds only for union k ≤ sketch k —
  * a union at LARGER k silently under-estimates (values a state truncated
  * above its own kth minimum are unrecoverable), and the mismatch cannot
  * be detected from the arrays alone (short state is indistinguishable
  * from an exhaustive group). Carry k with the state and refuse
  * mismatches at the call site — [[graft.ops.Agg.kmvRollup]] does, with a
  * `raise_error` guard over its `kmv_k` column.
  */
case class KmvUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvBufferOps
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  KmvSketch.checkK(k)

  override def prettyName: String = "kmv_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_union_agg: state must be ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        // Fail loud on corrupt state: a NULL element would otherwise fold as
        // key 0 under UnsafeArrayData (or NPE under GenericArrayData).
        require(!arr.isNullAt(i),
          "kmv_union_agg: NULL element in KMV state array — corrupt state")
        KmvSketch.addCapped(buffer, arr.getLong(i), k)
        i += 1
      }
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
}
