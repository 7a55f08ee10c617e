package graft

import org.apache.spark.sql.functions._

import graft.functions.{AcAutomaton, GraftFunctions}
import graft.sources.Tables
import graft.text.TextAnalysis

/** Aho-Corasick blocklist counter (q217/q218's engine): both automaton
  * paths (dense DFA and failure-link walk) must agree with a naive
  * byte-scan reference under fuzz, the greedy non-overlap rule must match
  * the SQL `replace` idiom exactly (that equivalence IS the oracle), and
  * the expression must behave on the null/empty/multibyte edges.
  */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Naive greedy non-overlapping byte count — the replace-idiom rule. */
  private def naive(text: Array[Byte], term: Array[Byte]): Int = {
    var i = 0
    var c = 0
    while (i + term.length <= text.length) {
      var j = 0
      while (j < term.length && text(i + j) == term(j)) j += 1
      if (j == term.length) { c += 1; i += term.length } else i += 1
    }
    c
  }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("classic dictionary: nested suffixes and output chains") {
    val ac = AcAutomaton.build(Seq("he", "she", "his", "hers"))
    assert(ac.count(utf8("ushers")).toSeq == Seq(1, 1, 0, 1))
    assert(ac.count(utf8("shishershers")).toSeq == Seq(2, 2, 1, 2))
    assert(ac.count(utf8("")).toSeq == Seq(0, 0, 0, 0))
    assert(ac.count(utf8("xyz")).toSeq == Seq(0, 0, 0, 0))
  }

  test("greedy non-overlap matches the replace idiom on self-overlap") {
    // 'aa' in 'aaaa' = 2 (restart after match), 'a a' in 'a a a' = 1.
    val ac = AcAutomaton.build(Seq("aa", "a a"))
    assert(ac.count(utf8("aaaa")).toSeq == Seq(2, 0))
    assert(ac.count(utf8("a a a")).toSeq == Seq(0, 1))
    assert(ac.count(utf8("aaa aa")).toSeq == Seq(2, 1))
  }

  test("multibyte text counts bytes, never splits a term across chars") {
    // 'β' is 0xCE 0xB2; 'γβ' shares the 0xCE lead byte context.
    val ac = AcAutomaton.build(Seq("β", "βγ", "x"))
    assert(ac.count(utf8("αβγβγx")).toSeq == Seq(2, 2, 1))
  }

  test("fuzz: dense and sparse paths both equal the naive reference") {
    val rnd = new scala.util.Random(170817)
    val alphabet = "aab bc"
    for (round <- 0 until 400) {
      val text = utf8(Seq.fill(rnd.nextInt(120))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
      val terms = Iterator.continually(
        Seq.fill(1 + rnd.nextInt(4))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.take(1 + rnd.nextInt(7)).toSeq
      val dense = AcAutomaton.build(terms)
      val sparse = AcAutomaton.build(terms, allowDense = false)
      assert(dense.isDense && !sparse.isDense)
      val expect = terms.map(term => naive(text, utf8(term)))
      assert(dense.count(text).toSeq == expect, s"dense, round $round: " +
        s"terms=$terms text=${new String(text, "UTF-8")}")
      assert(sparse.count(text).toSeq == expect, s"sparse, round $round: " +
        s"terms=$terms text=${new String(text, "UTF-8")}")
    }
  }

  test("expression: null text -> null, empty -> zeros, codegen and SQL") {
    GraftFunctions.registerAll(spark)
    val df = Seq((1L, "the cat"), (2L, ""), (3L, null))
      .toDF("id", "text")
    val out = df.select(col("id"), GraftFunctions.multi_match_counts(
      col("text"), Seq("the", "he", "cat")).as("c"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1) == Seq(1, 1, 1))
    assert(out(1).getSeq[Int](1) == Seq(0, 0, 0))
    assert(out(2).isNullAt(1))
    df.createOrReplaceTempView("mm_docs")
    val sqlOut = spark.sql(
      "SELECT id, multi_match_counts(text, array('the', 'he', 'cat')) c " +
        "FROM mm_docs ORDER BY id").collect()
    assert(sqlOut(0).getSeq[Int](1) == Seq(1, 1, 1))
    assert(sqlOut(2).isNullAt(1))
  }

  test("expression rejects empty and duplicate terms") {
    intercept[IllegalArgumentException] {
      AcAutomaton.build(Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      GraftFunctions.multi_match_counts(col("x"), Seq("a", "a"))
    }
  }

  test("replace-idiom equivalence on the real corpus (the oracle rule)") {
    val docs = Tables.load(spark, sf, "documents")
    val terms = TextAnalysis.blocklistTerms
    // Spark-side replace idiom, same arithmetic as the DuckDB oracle.
    val idiom = terms.zipWithIndex.map { case (term, i) =>
      ((length(col("text")) - length(regexp_replace(col("text"),
        java.util.regex.Pattern.quote(term), ""))) / lit(term.length))
        .cast("int").as(s"k$i")
    }
    val both = docs.select(
      (col("doc_id") +: GraftFunctions.multi_match_counts(
        col("text"), terms).as("ac") +: idiom): _*)
    val bad = both.filter(not(col("ac") === array(
      terms.indices.map(i => col(s"k$i")): _*))).count()
    assert(bad == 0, "Aho-Corasick counts must equal the replace idiom")
  }

  test("streaming twin: the gate over a file stream equals the batch gate") {
    // The gate is a stateless projection+filter, so it runs unchanged on a
    // streaming frame — this leg pins that the codegen'd expression works
    // under MicroBatchExecution and that a checkpoint restart appends only
    // the new file's quarantines (exactly-once for the stateless class).
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    val src = s"$dir/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val isOld = pmod(col("doc_id"), lit(10)) < 8
    docs.filter(isOld).write.mode("overwrite").parquet(s"$src/batch1")
    def drain(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      val q = TextAnalysis.blocklistGate(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$dir/cp").option("path", s"$dir/out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    val firstRows = spark.read.parquet(s"$dir/out").count()
    val firstExpect = TextAnalysis.blocklistGate(docs.filter(isOld))
    assert(spark.read.parquet(s"$dir/out").except(firstExpect).isEmpty &&
      firstExpect.except(spark.read.parquet(s"$dir/out")).isEmpty,
      "streamed gate must equal the batch gate on the first drain")
    // Restart from the checkpoint with the remaining docs as a new file.
    docs.filter(!isOld).write.mode("overwrite").parquet(s"$src/batch2")
    drain()
    val out = spark.read.parquet(s"$dir/out")
    val expect = TextAnalysis.blocklistGate(docs)
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty,
      "after restart the union of drains must equal the full batch gate")
    assert(out.count() == expect.count() &&
      out.count() - firstRows ==
        TextAnalysis.blocklistGate(docs.filter(!isOld)).count(),
      "restart must append exactly the new file's quarantines")
  }

  test("q218 gate: integer compare equals the density definition") {
    val docs = Tables.load(spark, sf, "documents")
    val gate = TextAnalysis.blocklistGate(docs).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      val density = r.getDouble(2)
      assert(density > 11.0 - 1e-9, s"doc ${r.getLong(0)} density $density")
    }
    // Every quarantined doc really exceeds the integer form of the bound.
    val viaHits = TextAnalysis.blocklistHits(docs)
      .groupBy("doc_id").agg(sum("cnt").as("total"))
      .join(docs.select("doc_id", "n_chars"), "doc_id")
      .filter(col("total") * 100 > col("n_chars") * 11)
    assert(viaHits.count() == gate.length)
  }
}
