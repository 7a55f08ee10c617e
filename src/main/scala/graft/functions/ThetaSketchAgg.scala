package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable theta sketch aggregate (A4 family) — the SET-ALGEBRA member
  * of the engine's sketch-state trio: HLL state answers union-only
  * distinct counts, the frequency sketch answers heavy hitters, and
  * theta state answers INTERSECTION and DIFFERENCE cardinalities at
  * rest. HLL can only approximate |A∩B| by inclusion–exclusion (three
  * estimates subtract — the error compounds, see
  * [[graft.ops.Agg.typeOverlapSketch]]); a theta sketch retains an
  * actual uniform sample of the key space, so ∩ and \\ are first-class
  * operations with their own bounds (Dasgupta et al., "Theta-Sketch
  * Framework" — the public algorithm the Datasketches library
  * implements).
  *
  * Buffer is a live [[Union]] object updated in place and compacted only
  * at shuffle/eval boundaries — the same [[TypedImperativeAggregate]]
  * posture as [[FreqSketchAgg]] / Spark's own `HllSketchAgg`. The
  * compact image is ordered, so equal key SETS yield byte-identical
  * state regardless of row order/partitioning (replay-stable; pinned in
  * SketchSpec).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg: key must be BIGINT, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union of serialized [[ThetaSketchAgg]] images — the consume side for
  * persisted per-day state rows, mirroring `hll_union_agg` /
  * [[FreqUnionAgg]]. NULL inputs (keys with no state) are skipped.
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg: sketch must be BINARY, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(false, null))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Shared eval plumbing for the scalar theta expressions: they run on
  * state rows (types² pairs, days-count rollups), never in a per-event
  * hot path — interpreted evaluation ([[CodegenFallback]]) is the same
  * deliberate trade as [[FreqSketchItems]].
  */
private[functions] object ThetaEval {
  def wrap(a: Any): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))

  def binaryCheck(name: String, left: Expression,
                  right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name: both sketches must be BINARY, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
}

/** Distinct-count estimate of a serialized theta sketch, as DOUBLE. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ThetaEval.wrap(input).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Confidence bound of a serialized theta sketch's estimate at
  * `numStdDev` ∈ {1, 2, 3} standard errors — `lower = true` gives the
  * value the true cardinality exceeds with the matching confidence,
  * `false` the value it stays under. Surfaced so state consumers can
  * report intervals, not point estimates (SketchSpec pins the exact
  * count inside [lb, ub] for every per-pair set operation).
  */
case class ThetaBound(child: Expression, numStdDev: Int, lower: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(numStdDev >= 1 && numStdDev <= 3,
    s"numStdDev must be 1, 2 or 3, got $numStdDev")

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (lower) "theta_lower_bound" else "theta_upper_bound"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sk = ThetaEval.wrap(input)
    if (lower) sk.getLowerBound(numStdDev) else sk.getUpperBound(numStdDev)
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaBound =
    copy(child = newChild)
}

/** A ∩ B of two serialized theta sketches, as a serialized COMPACT
  * sketch — the set algebra is CLOSED over the binary form, so
  * [[ThetaEstimate]] and [[ThetaBound]] compose over any expression
  * tree of intersections/differences (the result sketch carries its own
  * theta, so its bounds are first-class, not derived). This is the
  * operation HLL state cannot answer without compounding three
  * estimates.
  */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    ThetaEval.binaryCheck(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaEval.wrap(a), ThetaEval.wrap(b)).toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** A \ B of two serialized theta sketches, as a serialized COMPACT
  * sketch (see [[ThetaIntersect]] for why bytes, not an estimate).
  */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  override def checkInputDataTypes(): TypeCheckResult =
    ThetaEval.binaryCheck(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaEval.wrap(a), ThetaEval.wrap(b)).toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| estimate — sugar for theta_estimate(theta_intersect(a, b)). */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    ThetaEval.binaryCheck(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaEval.wrap(a), ThetaEval.wrap(b)).getEstimate

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** |A \ B| estimate — sugar for theta_estimate(theta_a_not_b(a, b)). */
case class ThetaANotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_a_not_b_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    ThetaEval.binaryCheck(prettyName, left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaEval.wrap(a), ThetaEval.wrap(b)).getEstimate

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotBEstimate =
    copy(left = newLeft, right = newRight)
}

/** Column surface for the theta sketch family. */
object ThetaSketch {

  /** Default lgK 12: 4096 nominal entries ≈ 1.6% rsd, ~32 KB max image —
    * the same accuracy class as Spark's HLL default at a size that still
    * broadcasts freely as per-(key, day) state.
    */
  val DefaultLgK = 12

  def theta_sketch_agg(key: Column, lgK: Int = DefaultLgK): Column =
    GraftFunctions.column(
      ThetaSketchAgg(GraftFunctions.expr(key), lgK).toAggregateExpression())

  def theta_union_agg(sketch: Column, lgK: Int = DefaultLgK): Column =
    GraftFunctions.column(
      ThetaUnionAgg(GraftFunctions.expr(sketch), lgK).toAggregateExpression())

  def theta_estimate(sketch: Column): Column =
    GraftFunctions.column(ThetaEstimate(GraftFunctions.expr(sketch)))

  def theta_intersect(a: Column, b: Column): Column =
    GraftFunctions.column(ThetaIntersect(
      GraftFunctions.expr(a), GraftFunctions.expr(b)))

  def theta_a_not_b(a: Column, b: Column): Column =
    GraftFunctions.column(ThetaANotB(
      GraftFunctions.expr(a), GraftFunctions.expr(b)))

  def theta_lower_bound(sketch: Column, numStdDev: Int = 2): Column =
    GraftFunctions.column(ThetaBound(GraftFunctions.expr(sketch),
      numStdDev, lower = true))

  def theta_upper_bound(sketch: Column, numStdDev: Int = 2): Column =
    GraftFunctions.column(ThetaBound(GraftFunctions.expr(sketch),
      numStdDev, lower = false))

  def theta_intersect_estimate(a: Column, b: Column): Column =
    GraftFunctions.column(ThetaIntersectEstimate(
      GraftFunctions.expr(a), GraftFunctions.expr(b)))

  def theta_a_not_b_estimate(a: Column, b: Column): Column =
    GraftFunctions.column(ThetaANotBEstimate(
      GraftFunctions.expr(a), GraftFunctions.expr(b)))
}
