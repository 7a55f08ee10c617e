package graft

/** Generates the DuckDB-SQL twin of the integer pHash pipeline
  * ([[graft.multimodal.Multimodal.phashFromHex]] over
  * [[graft.functions.LshBucketMath]]): md5 hex pairs → byte-sum fold →
  * center at 255 → ×1000 quantize → 56 literal-sign dot products → bucket
  * bits. Every step is integer arithmetic on both engines, so the oracle
  * match is exact, not approximate — the hyperplane signs are evaluated
  * HERE (same LCG as LshBucketMath) and embedded as +/- literals in the
  * generated SQL, which keeps the oracle a pure-SQL artifact DuckDB can
  * run with no engine code in the loop.
  */
private[graft] object OracleGen {

  /** Signs come from [[graft.functions.LshBucketMath.sign]] itself — the
    * oracle evaluates the engine's own LCG at generation time and embeds
    * the RESULTS as literals, so there is no second copy of the constants
    * to drift.
    */
  private def sign(i: Int, d: Int, planeOffset: Int): Long =
    graft.functions.LshBucketMath.sign(i, d, planeOffset)

  /** SQL for byte i (0-based) of the 16-byte value whose lowercase hex is
    * `h`: two strpos lookups — portable, no hex-cast dialect games.
    */
  def hexpair(h: String, i: Int): String =
    s"((strpos('0123456789abcdef', substr($h, ${2 * i + 1}, 1))-1)*16" +
      s" + (strpos('0123456789abcdef', substr($h, ${2 * i + 2}, 1))-1))"

  /** The 8 quantized-centered dims of the fold of hex column `h`. */
  def qExprs(h: String): Seq[String] =
    (0 until 8).map(d =>
      s"(${hexpair(h, d)} + ${hexpair(h, d + 8)} - 255) * 1000")

  /** The 56-bit bucket over integer columns `qCols`, signs as literals. */
  def bucketExpr(qCols: Seq[String], planeOffset: Int): String = {
    val bits = (0 until 56).map { i =>
      val dot = qCols.zipWithIndex.map { case (c, d) =>
        if (sign(i, d + 1, planeOffset) == 1) s"+ $c" else s"- $c"
      }.mkString(" ")
      s"CASE WHEN (0 $dot) >= 0 THEN ${1L << i} ELSE 0 END"
    }
    "(" + bits.mkString("\n     + ") + ")"
  }

  /** `q AS (SELECT <keys>, q0..q7 FROM <from>)` projection list. */
  def qSelect(h: String): String =
    qExprs(h).zipWithIndex.map { case (e, d) => s"$e AS q$d" }.mkString(", ")

  /** The 60-bit simhash fold of per-token hash column `h` as an
    * aggregate SQL expression (one per-doc GROUP BY consumes it): bit i
    * is set iff strictly more tokens carry a 1 there than a 0 —
    * `2·ones > n`, the exact [[graft.functions.SimHashAgg]] `> 0`
    * counter semantics. Bits 60–63 are structurally 0 (the portable
    * md5-prefix hash is 60-bit), so the fold stops at 60.
    */
  def simhashExpr(h: String): String =
    (0 until 60).map(i =>
      s"CASE WHEN 2 * SUM(($h >> $i) & 1) > COUNT(*) " +
        s"THEN ${1L << i} ELSE 0 END")
      .mkString("(", "\n     + ", ")")
}
