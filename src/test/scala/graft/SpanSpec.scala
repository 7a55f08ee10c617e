package graft

import org.apache.spark.sql.functions._

import graft.text.TextDedup

/** Passage-level (repeated-span) dedup: [[TextDedup.repeatedSpans]] /
  * [[TextDedup.scrubRepeatedSpans]]. The reference semantics are
  * re-derived HERE in plain Scala (tokenize → hot trigrams by distinct-doc
  * count → per-doc interval union of hot n-gram coverage), so the
  * distributed pipeline — hash keys, window chaining, HOF rebuild — is
  * checked against an independent implementation, not against itself.
  */
class SpanSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))

  /** Plain-Scala reference: spans per doc as (start, end) 1-based inclusive. */
  private def refSpans(corpus: Seq[(Long, String)], n: Int, minDocs: Int,
                       minSpanTokens: Int): Set[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).zipWithIndex
        .map { case (g, i) => (id, i + 1, g.mkString(" ")) }
    }
    val hot = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs)
      .keySet
    grams.filter(g => hot(g._3)).groupBy(_._1).flatMap { case (id, hs) =>
      val covered = hs.flatMap(h => h._2 until h._2 + n).toSet
      // maximal contiguous runs of covered token positions
      val sorted = covered.toSeq.sorted
      val spans = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      spans.collect { case (s, e) if e - s + 1 >= minSpanTokens =>
        (id, s.toLong, e.toLong, (e - s + 1).toLong)
      }
    }.toSet
  }

  private def gotSpans(d: org.apache.spark.sql.DataFrame, n: Int, minDocs: Int,
                       minSpan: Int): Set[(Long, Long, Long, Long)] =
    TextDedup.repeatedSpans(d, n, minDocs, minSpan)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("repeatedSpans finds the shared passage with exact 1-based boundaries") {
    val d = docs(
      (1L, "u1 u2 A B C D E u3 u4"),
      (2L, "v1 A B C D E v2"),
      (3L, "w1 w2 w3 w4 w5"))
    assert(gotSpans(d, 3, 2, 3) ==
      Set((1L, 3L, 7L, 5L), (2L, 2L, 6L, 5L)))
  }

  test("adjacent hot ranges merge into one span; disjoint ranges split") {
    // docs 4/5 share "A B C" and "D E F" but no bridging trigram: in doc 4
    // the two ranges touch ([1,3]+[4,6] -> one span), in doc 5 the filler
    // token keeps them apart ([1,3], [5,7])
    val d = docs(
      (4L, "A B C D E F"),
      (5L, "A B C q D E F"))
    assert(gotSpans(d, 3, 2, 3) ==
      Set((4L, 1L, 6L, 6L), (5L, 1L, 3L, 3L), (5L, 5L, 7L, 3L)))
    // the span-length floor drops the split doc's short spans only
    assert(gotSpans(d, 3, 2, 6) == Set((4L, 1L, 6L, 6L)))
  }

  test("a corpus with no cross-doc repeats yields no spans; scrub is identity") {
    val d = docs((1L, "a b c d e"), (2L, "f g h i j"), (3L, "k l"))
    assert(gotSpans(d, 3, 2, 3).isEmpty)
    val out = TextDedup.scrubRepeatedSpans(d).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 5L, 0L, "a b c d e"),
      (2L, 5L, 0L, "f g h i j"), (3L, 2L, 0L, "k l")))
  }

  test("scrub removes exactly the covered tokens and rebuilds the remainder") {
    val d = docs(
      (1L, "u1 u2 A B C D E u3 u4"),
      (2L, "v1 A B C D E v2"),
      (3L, "w1 w2 w3 w4 w5"))
    val out = TextDedup.scrubRepeatedSpans(d).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 9L, 5L, "u1 u2 u3 u4"),
      (2L, 7L, 5L, "v1 v2"),
      (3L, 5L, 0L, "w1 w2 w3 w4 w5")))
  }

  test("spans and scrub match the plain-Scala reference on a random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 12).map(i => s"t$i")
    val passage = "P1 P2 P3 P4 P5 P6"
    val corpus = (0 until 80).map { i =>
      val body = Seq.fill(8 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      val text =
        if (i % 7 == 0) (body.take(4) ++ Seq(passage) ++ body.drop(4)).mkString(" ")
        else body.mkString(" ")
      (i.toLong, text)
    }
    val d = docs(corpus: _*)
    for (minSpan <- Seq(3, 6)) {
      assert(gotSpans(d, 3, 2, minSpan) == refSpans(corpus, 3, 2, minSpan),
        s"span mismatch at minSpanTokens=$minSpan")
    }
    // scrub vs reference: n_removed = |covered positions|, text = survivors
    val ref = corpus.map { case (id, t) =>
      val ts = t.split("\\s+").toSeq
      val covered = refSpans(corpus, 3, 2, 3).filter(_._1 == id)
        .flatMap(s => s._2 to s._3).map(_.toInt).toSet
      val kept = ts.zipWithIndex.collect {
        case (tok, i) if !covered(i + 1) => tok
      }
      (id, ts.size.toLong, covered.size.toLong, kept.mkString(" "))
    }.toSet
    val got = TextDedup.scrubRepeatedSpans(d)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == ref)
  }

  test("repeatedSpans is invariant to input partitioning") {
    val d = docs(
      (1L, "u1 u2 A B C D E u3 u4"),
      (2L, "v1 A B C D E v2"),
      (3L, "A B C D E"))
    assert(gotSpans(d.repartition(7), 3, 2, 3) == gotSpans(d, 3, 2, 3))
  }

  test("hotlist state: delta probes flag exactly the state's hot passages") {
    import graft.text.Corpus
    val hotDir = java.nio.file.Files
      .createTempDirectory("graft-hotlist").toString + "/state"
    // the index corpus: two docs share A B C D E, so its trigrams are hot
    Corpus.writeHotlist(docs(
      (1L, "u1 u2 A B C D E u3"),
      (2L, "v1 A B C D E v2"),
      (3L, "w1 w2 w3 w4 w5")), hotDir, minDocs = 2)
    // the delta: doc 10 carries the passage (plus unique text), doc 11
    // does not — and doc 11's OWN repetition of "x y z" must NOT flag
    // (hotness is state-frozen, the q83 freshness trade)
    val delta = docs(
      (10L, "d1 A B C D E d2 d3"),
      (11L, "x y z q x y z"))
    val frac = Corpus.boilerplateAgainstHotlist(spark, hotDir, delta)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 10: 6 distinct trigrams, 3 hot (A B C / B C D / C D E)
    assert(frac(10L) == ((6L, 3L)))
    assert(frac(11L)._2 == 0L, "delta-local repeats must not flag")
    val spans = Corpus.spansAgainstHotlist(spark, hotDir, delta)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((10L, 2L, 6L, 5L)))
    // incremental scrub = detection against state + the shared rebuild
    val scrubbed = Corpus.scrubAgainstHotlist(spark, hotDir, delta)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(scrubbed == Seq(
      (10L, 8L, 5L, "d1 d2 d3"),
      (11L, 7L, 0L, "x y z q x y z")))
  }

  test("corpusDiff classifies added/removed/changed; unchanged emits nothing") {
    import graft.text.Corpus
    val v1 = docs((1L, "same text"), (2L, "old text"), (3L, "going away"))
    val v2 = docs((1L, "same text"), (2L, "new text"), (4L, "brand new"))
    val out = Corpus.corpusDiff(v1, v2)
      .as[(Long, String)].collect().toSet
    assert(out == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }
}
