package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, JaroWinklerMath}

/** Pins for [[graft.functions.JaroWinkler]]: the classic Winkler test
  * vectors as EXACT double literals read from the oracle engine
  * (DuckDB `jaro_winkler_similarity` — every literal is that engine's
  * repr-round-trip output, so equality here is bit equality), boost
  * gating, byte-orientation, empty/NULL semantics, and
  * codegen ≡ interpreted ≡ SQL-registry parity.
  */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerMath.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic Winkler vectors, bit-exact to the oracle engine") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)   // 1 transposition
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)    // prefix 1
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)  // prefix 2
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0) // zero matches
  }

  test("Winkler boost: gated on jaro > 0.7, prefix capped at 4") {
    // Shared 4-byte prefix but jaro 0.611 <= 0.7: boost must NOT fire.
    assert(jw("abcdxxxx", "abcdyyyyzzzz") == 0.611111111111111)
    // jaro 0.722 > 0.7, full 2-byte prefix boosts.
    assert(jw("ab", "abcdefghijkl") == 0.7777777777777779)
    // 5 shared leading bytes, but L caps at 4 (0.733 + 4*0.1*(1-0.733)).
    assert(jw("aaaaa", "aaaaabbbbbbbbbbbbbbbbbbbb") == 0.8400000000000001)
    // Zero common prefix: jw == jaro even above the threshold.
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("transpositions: half the out-of-sequence matched pairs") {
    // abcd/badc: 4 matches, 4 disagreeing positions -> t=2,
    // (1 + 1 + 2/4)/3; prefix 0.
    assert(jw("abcd", "badc") == 0.8333333333333334)
  }

  test("empty semantics: either side empty -> 0.0, including both-empty") {
    // The oracle engine's convention (textbook says 1.0 for ""≡"" — we
    // match the engine every query is hash-checked against).
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0)
  }

  test("byte-oriented like the oracle engine (multibyte UTF-8)") {
    // é is 2 UTF-8 bytes: byte-wise l1=6 vs codepoint-wise l1=5 — the
    // oracle engine compares bytes (0.84); codepoint-wise would be 0.88.
    assert(jw("héllo", "hello") == 0.8400000000000001)
  }

  test("codegen == interpreted == SQL registry; NULL propagates") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b")
    val viaColumn = df
      .select(GraftFunctions.jaro_winkler(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(viaColumn == Seq(0.9611111111111111, 0.8133333333333332))
    GraftFunctions.registerAll(spark)
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_pairs")
      .as[Double].collect().toSeq
    assert(viaSql == viaColumn)
    val withNull = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("y")), (Option("x"), Option("x")))
      .toDF("a", "b")
      .select(GraftFunctions.jaro_winkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(withNull.count(_.isNullAt(0)) == 2, "NULL input must yield NULL")
    assert(withNull.exists(r => !r.isNullAt(0) && r.getDouble(0) == 1.0))
  }

  test("analysis-time type guard: non-string inputs rejected") {
    val bad = Seq((1, 2)).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.jaro_winkler(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("jaro_winkler"),
      s"expected the string type guard, got: ${e.getMessage}")
  }

  test("property: expression matches a plain-Scala reference on random pairs") {
    // Independent reimplementation (the python-canonical form the 30k-pair
    // DuckDB ULP check validated) — guards the codegen'd loop against
    // drift in either the matching window or the double-op order.
    def ref(s1: Array[Byte], s2: Array[Byte]): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val win = math.max(math.max(l1, l2) / 2 - 1, 0)
      val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
      var m = 0
      for (i <- 0 until l1) {
        var j = math.max(0, i - win)
        var done = false
        while (j < math.min(l2, i + win + 1) && !done) {
          if (!m2(j) && s2(j) == s1(i)) {
            m1(i) = true; m2(j) = true; m += 1; done = true
          }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var t = 0; var k = 0
      for (i <- 0 until l1 if m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      t /= 2
      val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (j0 > 0.7) {
        var l = 0
        while (l < math.min(4, math.min(l1, l2)) && s1(l) == s2(l)) l += 1
        j0 + l * 0.1 * (1 - j0)
      } else j0
    }
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefg"
    for (_ <- 1 to 2000) {
      val a = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = jw(a, b)
      val want = ref(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw($a, $b): $got != $want")
    }
  }
}
