package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch aggregate (the third rung of the A4
  * sketch-state family, beside HLL distinct counts and the
  * [[FreqSketchAgg]] heavy hitters): folds a DOUBLE column into a
  * Datasketches KLL sketch, evaluated to its serialized BINARY form.
  * This is what a latency/size percentile dashboard persists per day at
  * 100 TB — the engine's exact histogram state (q98) answers quantiles
  * from value-range bins it must choose up front; KLL needs no bins, no
  * value-range knowledge, and merges associatively with a PROVEN
  * normalized rank error (~1.65% at the default k = 200, independent of
  * n), so rollups answer from persisted daily state without rescanning
  * history.
  *
  * Same [[TypedImperativeAggregate]] design as [[FreqSketchAgg]] (live
  * sketch object per group, serialized only at shuffle boundaries).
  *
  * Determinism caveat, spec-acknowledged: KLL compaction draws random
  * offsets, so two aggregations of the same data may retain different
  * samples — the rank-error BOUND holds for every run, but exact output
  * equality across runs does not. The replay-stable streaming twin
  * therefore stays on the deterministic binned histogram
  * (EventsStream.histStateful); KLL is the batch/rollup state.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg: value must be DOUBLE, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch)
      : KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized [[KllSketchAgg]] sketches — the consume side for
  * persisted per-day state rows, mirroring [[FreqUnionAgg]]. NULL inputs
  * (keys with no state) are skipped.
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg: sketch must be BINARY, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch)
      : KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Quantile estimates out of a serialized [[KllSketchAgg]] sketch: BINARY
  * → `array<double>`, one estimate per requested rank (inclusive search
  * criterion, the library default). Empty sketch → NULL. Runs once per
  * output row on group-count-bounded state — interpreted evaluation
  * ([[CodegenFallback]]) is deliberate, like [[FreqSketchItems]].
  */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"kll_quantiles: ranks must be in [0,1], got $ranks")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else new GenericArrayData(
      ranks.map(r => sketch.getQuantile(r): Any).toArray): ArrayData
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

/** Empirical CDF of a serialized [[KllSketchAgg]] sketch at each value
  * of an `array<double>` column — the rank-direction read the quantile
  * family lacked ([[KllQuantiles]] maps rank→value; this maps
  * value→rank, inclusive criterion, so `cdf(v) = P[X ≤ v]`). Points are
  * sorted/deduped internally (the library demands strictly-increasing
  * split points) and answers return in INPUT order. Empty sketch or
  * NULL input → NULL. Like [[KllQuantiles]], runs on
  * group-count-bounded state — [[CodegenFallback]] is deliberate.
  */
case class KllCdf(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_cdf"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_cdf: (sketch BINARY, points ARRAY<DOUBLE>) expected, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(sketchBytes: Any, points: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) return null
    val pts = points.asInstanceOf[ArrayData].toDoubleArray()
    if (pts.isEmpty) return new GenericArrayData(Array.empty[Any])
    val sorted = pts.distinct.sorted
    val cdf = sketch.getCDF(sorted,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
    val byPoint = sorted.zip(cdf).toMap
    new GenericArrayData(pts.map(p => byPoint(p): Any)): ArrayData
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllCdf =
    copy(left = newLeft, right = newRight)
}

/** `getN` of a serialized [[KllSketchAgg]] sketch, as a LONG column —
  * the stream length the error bound scales against.
  */
case class KllSketchN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  // default nullability (child's): a NULL sketch row — keys with no
  // state, the shape KllUnionAgg explicitly tolerates — must yield NULL,
  // not an unboxing NPE from a falsely non-nullable slot.
  override def prettyName: String = "kll_sketch_n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_n: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(newChild: Expression): KllSketchN =
    copy(child = newChild)
}

/** Column surface for the KLL quantile-sketch family. */
object KllSketch {

  def kll_sketch_agg(value: Column, k: Int = 200): Column =
    GraftFunctions.column(
      KllSketchAgg(GraftFunctions.expr(value), k).toAggregateExpression())

  def kll_union_agg(sketch: Column, k: Int = 200): Column =
    GraftFunctions.column(
      KllUnionAgg(GraftFunctions.expr(sketch), k).toAggregateExpression())

  def kll_quantiles(sketch: Column, ranks: Seq[Double]): Column =
    GraftFunctions.column(
      KllQuantiles(GraftFunctions.expr(sketch), ranks))

  def kll_sketch_n(sketch: Column): Column =
    GraftFunctions.column(KllSketchN(GraftFunctions.expr(sketch)))

  def kll_cdf(sketch: Column, points: Column): Column =
    GraftFunctions.column(
      KllCdf(GraftFunctions.expr(sketch), GraftFunctions.expr(points)))
}
