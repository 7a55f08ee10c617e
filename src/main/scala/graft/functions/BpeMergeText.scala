package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** One byte-pair-encoding merge applied to a document's token stream, as
  * a codegen'd Catalyst expression: every GREEDY LEFT-TO-RIGHT adjacent
  * occurrence of tokens `(a, b)` — under the engine's tokenizer
  * (`split(text, "\\s+")`, limit −1) — is replaced by the single token
  * `a + joiner + b`. Greedy means a consumed token cannot start the next
  * occurrence, which is only observable when `a == b`: "x x x" merging
  * (x, x) yields ["x⊕x", "x"], the standard BPE trainer rule. NULL text
  * → NULL.
  *
  * The output is the merged token stream re-joined with single spaces —
  * whitespace RUNS collapse, but the token sequence under re-splitting
  * is exactly the merged sequence (boundary empty tokens from leading/
  * trailing whitespace survive the round trip), so [[graft.text.Corpus
  * .bpeTrain]] can chain rounds: tokenize → merge → re-tokenize. One
  * fused byte walk per document ([[WordNgramHashesMath]] pattern): token
  * boundaries found in place, tokens compared to `a`/`b` by bytes, and
  * the output built in a single pre-sized buffer — no per-token string
  * allocation, no regex.
  *
  * `joiner` must not contain whitespace (it would re-split) — the
  * sentencepiece-style "▁" is the engine default.
  */
case class BpeMergeText(child: Expression, a: String, b: String,
                        joiner: String) extends UnaryExpression {

  require(!(a + b + joiner).exists(_.isWhitespace),
    "a, b, and joiner must not contain whitespace")
  require(a.nonEmpty && b.nonEmpty, "a and b must be non-empty tokens")

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_merge_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_text: text must be STRING, got ${other.simpleString}")
  }

  @transient private lazy val merged =
    UTF8String.fromString(a + joiner + b)
  @transient private lazy val aBytes = UTF8String.fromString(a)
  @transient private lazy val bBytes = UTF8String.fromString(b)

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeTextMath.compute(input.asInstanceOf[UTF8String],
      aBytes, bBytes, merged)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aBytes, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeB", bBytes, classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("bpeM", merged, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeMergeTextMath.compute($t, $aRef, $bRef, $mRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeText = copy(child = newChild)
}

/** The fused tokenize-compare-rebuild loop (static forwarder for generated
  * Java — the [[WordNgramHashesMath]] pattern).
  */
object BpeMergeTextMath {

  /** Java-regex `\s`: the 6 ASCII whitespace chars. */
  private def isWs(byte: Byte): Boolean =
    byte == 0x20 || (byte >= 0x09 && byte <= 0x0d)

  private def tokenEquals(base: Object, off: Long, len: Int,
                          t: UTF8String): Boolean =
    len == t.numBytes && ByteArrayMethods.arrayEquals(
      base, off, t.getBaseObject, t.getBaseOffset, len.toLong)

  def compute(text: UTF8String, a: UTF8String, b: UTF8String,
              merged: UTF8String): UTF8String = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    // Pass 1: token boundaries (runs + 1 tokens, limit −1 semantics).
    var runs = 0
    var i = 0
    while (i < nBytes) {
      if (isWs(Platform.getByte(base, off + i))) {
        runs += 1
        i += 1
        while (i < nBytes && isWs(Platform.getByte(base, off + i))) i += 1
      } else i += 1
    }
    val numToks = runs + 1
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var tok = 0
    var tokStart = 0
    i = 0
    while (i < nBytes) {
      if (isWs(Platform.getByte(base, off + i))) {
        starts(tok) = tokStart; ends(tok) = i; tok += 1
        i += 1
        while (i < nBytes && isWs(Platform.getByte(base, off + i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts(tok) = tokStart; ends(tok) = nBytes
    // Pass 2: greedy merge walk into a pre-sized buffer. Upper bound:
    // all token bytes + a single-space separator per boundary + one
    // merged replacement per floor(numToks / 2) occurrences.
    val mLen = merged.numBytes
    val out = new Array[Byte](nBytes + numToks + (numToks / 2 + 1) * mLen)
    var pos = 0
    var t = 0
    var first = true
    while (t < numToks) {
      if (!first) { out(pos) = ' '; pos += 1 }
      first = false
      val len = ends(t) - starts(t)
      if (t + 1 < numToks &&
          tokenEquals(base, off + starts(t), len, a) &&
          tokenEquals(base, off + starts(t + 1), ends(t + 1) - starts(t + 1), b)) {
        Platform.copyMemory(merged.getBaseObject, merged.getBaseOffset,
          out, Platform.BYTE_ARRAY_OFFSET + pos, mLen.toLong)
        pos += mLen
        t += 2
      } else {
        Platform.copyMemory(base, off + starts(t),
          out, Platform.BYTE_ARRAY_OFFSET + pos, len.toLong)
        pos += len
        t += 1
      }
    }
    UTF8String.fromBytes(out, 0, pos)
  }

  /** Column-API surface (companion to [[WordNgramHashesMath.wordNgramHashesCol]]). */
  def bpeMergeTextCol(text: Column, a: String, b: String,
                      joiner: String = "▁"): Column =
    GraftFunctions.column(BpeMergeText(GraftFunctions.expr(text), a, b, joiner))
}
