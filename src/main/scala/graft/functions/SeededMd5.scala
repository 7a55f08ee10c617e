package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numSeeds` seeded md5 prefixes of a string in one pass:
  * element i equals `substr(md5(s || '#' || i), 1, 16)` — BIT-IDENTICAL to
  * the composed built-in form (and to the DuckDB oracle SQL), which is the
  * whole point: the MinHash pipeline stays oracle-checkable while dropping
  * the composed form's per-seed costs. Evaluating the built-ins k times
  * per shingle pays k× (MessageDigest lookup + UTF8String concat
  * materialization + 32-char hex + substring copy); this expression reuses
  * one thread-local digest and hexes only the 8 prefix bytes per seed,
  * emitting all k values as a single array (project it ONCE per row, then
  * aggregate over `element_at`).
  */
case class SeededMd5(child: Expression, numSeeds: Int)
    extends UnaryExpression {

  require(numSeeds > 0 && numSeeds <= SeededMd5Math.MaxSeeds,
    s"seeded_md5: numSeeds must be in 1..${SeededMd5Math.MaxSeeds}, got $numSeeds")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "seeded_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"seeded_md5: input must be string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    SeededMd5Math.compute(s.asInstanceOf[UTF8String], numSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SeededMd5Math.compute($c, $numSeeds)")

  override protected def withNewChildInternal(newChild: Expression): SeededMd5 =
    copy(child = newChild)
}

/** Static digest loop, called from generated code (the [[LshBucketMath]]
  * pattern). MessageDigest is not thread-safe → one per task thread;
  * `reset` between seeds is cheap (md5 state is 4 ints + a block buffer).
  */
object SeededMd5Math {

  val MaxSeeds = 32

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  // "#0".."#31" as bytes — the seed suffixes the composed form concats.
  private val suffixes: Array[Array[Byte]] =
    Array.tabulate(MaxSeeds)(i => s"#$i".getBytes("UTF-8"))

  private val hexChars = "0123456789abcdef".toCharArray.map(_.toByte)

  def compute(s: UTF8String, numSeeds: Int): ArrayData = {
    val input = s.getBytes
    val md = digests.get()
    val out = new Array[AnyRef](numSeeds)
    var i = 0
    while (i < numSeeds) {
      md.reset()
      md.update(input)
      md.update(suffixes(i))
      val d = md.digest()
      // first 8 digest bytes -> 16 lowercase hex chars (ASCII == UTF-8)
      val hex = new Array[Byte](16)
      var j = 0
      while (j < 8) {
        hex(2 * j) = hexChars((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = hexChars(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }
}
