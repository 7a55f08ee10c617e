package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** Pins for [[graft.ops.Profile]]: exact stats on a hand-built frame
  * (nulls, duplicates, native-typed min/max), the approx form's distinct
  * estimates against the exact form, and the no-Expand plan claim of the
  * approx path.
  */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("en"), 10),
    (Some(2L), Some("en"), 9),
    (Some(10L), None, 10),
    (None, Some("de"), 2))
    .toDF("id", "lang", "n")

  test("profile: exact nulls, distincts, native-typed min/max") {
    val p = Profile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(p.toSeq === Seq(
      ("id", 4L, 1L, 3L, "1", "10"), // native long order: 10 is max, not "10" < "9"
      ("lang", 4L, 1L, 2L, "de", "en"),
      ("n", 4L, 0L, 3L, "2", "10")))
  }

  test("profile: approx keeps every non-distinct stat exact, estimates close") {
    val exact = Profile.profile(df).orderBy("col_name").collect()
    val approx = Profile.profile(df, exact = false).orderBy("col_name").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) === a.getString(0))
      assert(e.getLong(1) === a.getLong(1)) // n_rows
      assert(e.getLong(2) === a.getLong(2)) // n_null
      assert(e.getString(4) === a.getString(4))
      assert(e.getString(5) === a.getString(5))
      // HLL++ default rsd 5%; tiny cardinalities are exact in practice —
      // allow 10% slack so the pin is about sanity, not sketch internals.
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ed - ad) / ed <= 0.10)
    }
  }

  test("profile: approx plan has no Expand; exact plan has one") {
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(Profile.profile(df)))
    assert(!hasExpand(Profile.profile(df, exact = false)))
  }

  test("profileBy: per-group stats, group column excluded from profiling") {
    val g = Seq(
      ("s1", Some(1L)), ("s1", Some(5L)), ("s1", None),
      ("s2", Some(7L)))
      .toDF("src", "id")
    val p = Profile.profileBy(g, "src", Seq("id"))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))
    assert(p.toSeq === Seq(
      ("s1", "id", 3L, 1L, 2L, "1", "5"),
      ("s2", "id", 1L, 0L, 1L, "7", "7")))
    intercept[IllegalArgumentException] {
      Profile.profileBy(g, "src", Seq("src", "id"))
    }
  }

  test("driftBucketsMulti == per-column driftBuckets; guards fail loudly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars"))
    val cur = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("n_chars"))
    val multi = Profile.driftBucketsMulti(ref, cur,
        Seq("n_chars", "doc_id"), nBuckets = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    Seq("n_chars", "doc_id").foreach { c =>
      val single = Profile.driftBuckets(ref, cur, c, nBuckets = 10)
        .collect().map(r => (c, r.getInt(0)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(single.forall { case (k, v) => multi.get(k).contains(v) } &&
        multi.count(_._1._1 == c) == single.size,
        s"multi-column counts must equal the per-column form for $c")
    }
    intercept[IllegalArgumentException] {
      Profile.driftBucketsMulti(ref, cur, Seq())
    }
    intercept[IllegalArgumentException] {
      Profile.driftBucketsMulti(
        ref.withColumnRenamed("n_chars", "a'b"),
        cur.withColumnRenamed("n_chars", "a'b"), Seq("a'b"))
    }
    // the single-column edge path interpolates into expr() too — same
    // refusal for quoted/backticked/newline names (referenceEdges is
    // also the write path of the persisted drift reference sidecar)
    intercept[IllegalArgumentException] {
      Profile.referenceEdges(
        ref.withColumnRenamed("n_chars", "a`b"), "a`b", 10)
    }
    intercept[IllegalArgumentException] {
      Profile.referenceEdges(
        ref.withColumnRenamed("n_chars", "a\nb"), "a\nb", 10)
    }
  }

  test("profile: column subset and require on empty") {
    val p = Profile.profile(df, Seq("lang")).collect()
    assert(p.map(_.getString(0)).toSeq === Seq("lang"))
    intercept[IllegalArgumentException] {
      Profile.profile(df.select(), Seq())
    }
  }

  test("ksDrift: exact sup-distance vs a driver reference; bounds; guards") {
    def frame(vs: Seq[Long]) = vs.toDF("x")
    // driver reference: D = sup over union values of |F_a - F_b|, as the
    // exact integer numerator over na*nb
    def ksRef(a: Seq[Long], b: Seq[Long]): (BigInt, Double) = {
      val points = (a ++ b).distinct.sorted
      val num = points.map(v => (BigInt(a.count(_ <= v)) * b.size -
        BigInt(b.count(_ <= v)) * a.size).abs).max
      (num, num.toDouble / (a.size.toDouble * b.size.toDouble))
    }
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(400)(rnd.nextInt(50).toLong)
    val ys = Seq.fill(300)(rnd.nextInt(50).toLong + 10L)
    val ksOut = Profile.ksDrift(frame(xs), frame(ys), "x")
    // d_num publishes as BIGINT (driver-stable serialization), never a
    // DECIMAL128 cell — the r15 oracle-hash lesson
    assert(ksOut.schema("d_num").dataType ==
      org.apache.spark.sql.types.LongType)
    val got = ksOut.collect()(0)
    val (wantNum, wantStat) = ksRef(xs, ys)
    assert(BigInt(got.getLong(0)) == wantNum)
    assert(got.getDouble(1) == wantStat)
    assert(got.getLong(2) == 400L && got.getLong(3) == 300L)
    // identical distributions: D = 0; fully separated supports: D = 1
    val same = Profile.ksDrift(frame(xs), frame(xs), "x").collect()(0)
    assert(same.getLong(0) == 0L && same.getDouble(1) == 0.0)
    val apart = Profile.ksDrift(frame(Seq(1L, 2L, 3L)),
      frame(Seq(10L, 11L)), "x").collect()(0)
    assert(apart.getDouble(1) == 1.0)
    // an all-null or empty side carries no distribution — refused
    intercept[IllegalArgumentException] {
      Profile.ksDrift(frame(Seq.empty), frame(ys), "x")
    }
  }

  test("ksDriftMulti == per-column ksDrift; empty-side column refused") {
    val rnd = new scala.util.Random(11)
    val ref = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(9).toLong))
      .toDF("x", "y")
    val cur = Seq.fill(250)((rnd.nextInt(40).toLong + 5L,
      rnd.nextInt(9).toLong)).toDF("x", "y")
    val multi = Profile.ksDriftMulti(ref, cur, Seq("x", "y")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(multi.keySet == Set("x", "y"))
    Seq("x", "y").foreach { c =>
      val one = Profile.ksDrift(ref, cur, c).collect()(0)
      assert(multi(c) == ((one.getLong(0),
        one.getDouble(1), one.getLong(2), one.getLong(3))),
        s"column $c diverged from the single-column form")
    }
    // a column with no rows on one side is refused, naming the totals
    val curNull = cur.withColumn("y", lit(null).cast("long"))
    val e = intercept[IllegalArgumentException] {
      Profile.ksDriftMulti(ref, curNull, Seq("x", "y"))
    }
    assert(e.getMessage.contains("BOTH snapshots"))
    // a fractional column is refused, never silently truncated to LONG
    // (0.1 and 0.9 both become 0 — a full shift would read as d = 0)
    val curD = cur.withColumn("y", col("y") / 10.0)
    val e2 = intercept[IllegalArgumentException] {
      Profile.ksDriftMulti(ref.withColumn("y", col("y") / 10.0), curD,
        Seq("x", "y"))
    }
    assert(e2.getMessage.contains("integral") ||
      e2.getMessage.contains("LONG"))
  }

  test("ksDriftBy == per-stratum ksDrift; one-sided stratum refused") {
    val rnd = new scala.util.Random(17)
    def frame(n: Int, shift: Long) =
      Seq.fill(n)((if (rnd.nextBoolean()) "en" else "de",
        rnd.nextInt(30).toLong + shift)).toDF("lang", "x")
    val ref = frame(300, 0L)
    val cur = frame(250, 4L)
    val by = Profile.ksDriftBy(ref, cur, "x", "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(by.keySet == Set("en", "de"))
    Seq("en", "de").foreach { g =>
      val one = Profile.ksDrift(ref.filter(col("lang") === g),
        cur.filter(col("lang") === g), "x").collect()(0)
      assert(by(g) == ((one.getLong(0),
        one.getDouble(1), one.getLong(2), one.getLong(3))),
        s"stratum $g diverged from the filtered single-stratum form")
    }
    // a stratum present in only one snapshot is refused, named
    val e = intercept[IllegalArgumentException] {
      Profile.ksDriftBy(ref,
        cur.unionByName(Seq(("fr", 9L)).toDF("lang", "x")), "x", "lang")
    }
    assert(e.getMessage.contains("fr"))
    // NULL strata drop; all-null input refused
    intercept[IllegalArgumentException] {
      Profile.ksDriftBy(
        ref.withColumn("lang", lit(null).cast("string")),
        cur.withColumn("lang", lit(null).cast("string")), "x", "lang")
    }
  }

  test("BIGINT d_num overflow guard: snapshot pairs past 2^63 products " +
      "refuse loudly and name the sketch escape hatch") {
    // d_num <= na*nb, so the guard is exactly the product bound
    Profile.requireKsProductFits(3_000_000_000L, 3_000_000_000L - 1L) // fits
    Profile.requireKsProductFits(0L, Long.MaxValue)                   // degenerate
    val e = intercept[IllegalArgumentException] {
      Profile.requireKsProductFits(Long.MaxValue / 2, 3L)
    }
    assert(e.getMessage.contains("ksDriftSketch"),
      "the refusal must point at the O(k)-state path")
  }

  test("ksDriftSketch lands within its error bound of the exact KS") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(2000)(rnd.nextInt(500).toLong).toDF("x")
    val ys = Seq.fill(1500)(rnd.nextInt(500).toLong + 60L).toDF("x")
    val exact = Profile.ksDrift(xs, ys, "x").collect()(0).getDouble(1)
    // k = 2048 -> eps ~ 0.2%; grid 512 -> 0.2%; bound ~ 0.6%, assert 2%
    val est = Profile.ksDriftSketch(xs, ys, "x", k = 2048, grid = 512)
      .collect()(0)
    assert(est.getLong(1) == 2000L && est.getLong(2) == 1500L)
    val d = est.getDouble(0)
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - exact) <= 0.02,
      s"sketch estimate $d too far from exact $exact")
    // an empty side raises at materialization instead of yielding the
    // NULL d_est a threshold monitor would silently pass
    val err = intercept[Exception] {
      Profile.ksDriftSketch(xs, ys.filter(lit(false)), "x").collect()
    }
    assert(err.getMessage.contains("both snapshots"),
      s"unexpected: ${err.getMessage}")
  }
}
