package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable heavy-hitters sketch aggregate (SURVEY.md §2.11 / A4 family):
  * folds a LONG key column into a Datasketches frequent-items sketch
  * ([[LongsSketch]]), evaluated to its serialized BINARY form — the
  * frequency twin of Spark's `hll_sketch_agg` (distinct count) and the
  * engine's histogram state (quantiles).
  *
  * Why a [[TypedImperativeAggregate]] and not an `Aggregator`: the buffer
  * is the live sketch OBJECT, updated in place per row and serialized only
  * at shuffle boundaries — an `Aggregator` buffer would pay
  * serialize/deserialize per GROUP per row under codegen'd hash
  * aggregation. This is the same design Spark itself uses for
  * `HllSketchAgg`.
  *
  * Guarantees (spec-pinned in SketchSpec): with map size m, the sketch
  * holds at most ~0.75·m counters and `getMaximumError` ≤ 3.5·n/m over n
  * updates; every key with true count > maximumError is RETAINED (no
  * false negatives above the error line), and for every retained key
  * `lowerBound ≤ true count ≤ upperBound`. Merge is associative and
  * error-correct — a merge of per-day sketches carries the summed error
  * bound, so rollups answered from persisted daily state keep the same
  * contract without rescanning history.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg: key must be BIGINT, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** Union of serialized [[FreqSketchAgg]] sketches — the consume side for
  * persisted per-day state rows, mirroring `hll_union_agg`. NULL inputs
  * (keys with no state) are skipped.
  */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_union_agg: sketch must be BINARY, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(LongsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqUnionAgg =
    copy(child = newChild)
}

/** Read the retained items out of a serialized [[FreqSketchAgg]] sketch:
  * BINARY → `array<struct<item, est, lb, ub>>` under the given error
  * regime. `noFalseNegatives = true` returns every key that COULD exceed
  * the error line (the scrub/decontamination regime — misses nothing,
  * may over-report); `false` returns only keys PROVEN frequent
  * (`lowerBound > maximumError` — the reporting regime, no false
  * positives). Runs once per output row on types-count-bounded state, so
  * interpreted evaluation ([[CodegenFallback]]) is deliberate — this is
  * never in a per-event hot path.
  */
case class FreqSketchItems(child: Expression, noFalseNegatives: Boolean = true)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "freq_sketch_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_items: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val sketch = LongsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    val err =
      if (noFalseNegatives) ErrorType.NO_FALSE_NEGATIVES
      else ErrorType.NO_FALSE_POSITIVES
    val rows = sketch.getFrequentItems(err)
    val out: Array[Any] = rows.map { r =>
      InternalRow(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.toArray[Any]
    new GenericArrayData(out): ArrayData
  }

  override protected def withNewChildInternal(newChild: Expression): FreqSketchItems =
    copy(child = newChild)
}

/** Column surface for the frequent-items sketch family. */
object FreqSketch {

  private[functions] val freqSketchAggFromSql: Seq[Expression] => Expression =
    exprs => FreqSketchAgg(exprs(0),
      GraftFunctions.litInt(exprs(1), "freq_sketch_agg: maxMapSize"))

  private[functions] val freqUnionAggFromSql: Seq[Expression] => Expression =
    exprs => FreqUnionAgg(exprs(0),
      GraftFunctions.litInt(exprs(1), "freq_union_agg: maxMapSize"))

  private[functions] val freqSketchItemsFromSql: Seq[Expression] => Expression =
    exprs => FreqSketchItems(exprs.head)

  private[functions] val freqSketchMaxErrorFromSql: Seq[Expression] => Expression =
    exprs => FreqSketchMaxError(exprs.head)

  def freq_sketch_agg(key: Column, maxMapSize: Int): Column =
    GraftFunctions.column(
      FreqSketchAgg(GraftFunctions.expr(key), maxMapSize).toAggregateExpression())

  def freq_union_agg(sketch: Column, maxMapSize: Int): Column =
    GraftFunctions.column(
      FreqUnionAgg(GraftFunctions.expr(sketch), maxMapSize).toAggregateExpression())

  def freq_sketch_items(sketch: Column, noFalseNegatives: Boolean = true): Column =
    GraftFunctions.column(
      FreqSketchItems(GraftFunctions.expr(sketch), noFalseNegatives))

  /** The sketch's a-posteriori error bound: true counts of ABSENT keys are
    * ≤ this value, and `est − lb`/`ub − est` are ≤ it for retained keys.
    */
  def freq_sketch_max_error(sketch: Column): Column =
    GraftFunctions.column(FreqSketchMaxError(GraftFunctions.expr(sketch)))
}

/** `getMaximumError` of a serialized sketch, as a LONG column. */
case class FreqSketchMaxError(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "freq_sketch_max_error"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_max_error: sketch must be BINARY, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LongsSketch.getInstance(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getMaximumError

  override protected def withNewChildInternal(newChild: Expression): FreqSketchMaxError =
    copy(child = newChild)
}
