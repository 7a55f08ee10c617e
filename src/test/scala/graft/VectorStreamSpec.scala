package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.streaming.VectorStream
import graft.vector.Similarity

/** Streaming vector ingestion (VectorStream): the index is the dedup
  * state — replayed ids, in-batch dups, and corpus near-dups all die
  * before the append, across micro-batches and across full replays.
  */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.map { case (id, e) => (id, e, 0) }.toDF("vec_id", "embedding", "label")

  test("ingest: replay guard, in-batch dedup, corpus precedence — and a full replay appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstream").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    // seed corpus: the four axis vectors; index bootstrapped from it
    Similarity.writeIvfIndex(
      vecs(100L -> Seq(1f, 0f, 0f, 0f), 101L -> Seq(0f, 1f, 0f, 0f),
        102L -> Seq(0f, 0f, 1f, 0f), 103L -> Seq(0f, 0f, 0f, 1f)),
      idx, nCentroids = 4)

    // one batch carrying all three dup modes plus one genuine survivor:
    //  - id 100: replayed id (already indexed)           -> replay guard
    //  - id 1:   cosine ~0.995 vs indexed v100           -> corpus precedence
    //  - ids 2,3: in-batch near-dup pair (cosine ~0.9997) -> min id 2 survives
    val batch = vecs(
      100L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.99f, 0.1f, 0f, 0f),
      2L -> Seq(0.7f, 0.7f, 0f, 0f),
      3L -> Seq(0.71f, 0.69f, 0f, 0f))
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema,
      threshold = 0.9, nProbe = 4).awaitTermination()

    def indexedIds() = spark.read.parquet(s"$idx/lists")
      .select($"vec_id").as[Long].collect().toSet
    assert(indexedIds() == Set(100L, 101L, 102L, 103L, 2L),
      "only the in-batch survivor may join the seed corpus")

    // full replay (same rows, new file, FRESH checkpoint — the harshest
    // at-least-once case): ids 100/2 die on the replay guard, 1 and 3
    // die on corpus precedence (3's survivor-twin 2 is now indexed)
    batch.coalesce(1).write.mode("overwrite").parquet(s"$src/b2")
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp2", schema,
      threshold = 0.9, nProbe = 4).awaitTermination()
    assert(indexedIds() == Set(100L, 101L, 102L, 103L, 2L),
      "a replayed batch must append nothing")

    // and the index stays searchable mid-stream: the survivor is
    // findable, its dropped twin is not
    val hit = Similarity.searchIvfIndex(spark, idx,
      vecs(999L -> Seq(0.7f, 0.7f, 0f, 0f)), k = 1, nProbe = 4)
    assert(hit.select($"neighbor_id").as[Long].head() == 2L)
  }

  test("a batch with no survivors and no pairs is a no-op (empty-graph path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstream2").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Similarity.writeIvfIndex(
      vecs(10L -> Seq(1f, 0f), 11L -> Seq(0f, 1f)), idx, nCentroids = 2)
    // pure replay batch: every id already indexed, no internal pairs
    vecs(10L -> Seq(1f, 0f), 11L -> Seq(0f, 1f))
      .coalesce(1).write.mode("overwrite").parquet(s"$src/b1")
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp", schema,
      threshold = 0.9, nProbe = 2).awaitTermination()
    assert(spark.read.parquet(s"$idx/lists").count() == 2,
      "an all-replay batch must leave the index untouched")
  }

  test("takedown vs replay: an erased id is re-admitted by a full replay (as-if-never semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstream3").toString
    val src = s"$dir/src"; val idx = s"$dir/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Similarity.writeIvfIndex(
      vecs(10L -> Seq(1f, 0f), 11L -> Seq(0f, 1f)), idx, nCentroids = 2)
    def ids() = spark.read.parquet(s"$idx/lists")
      .select($"vec_id").as[Long].collect().toSet
    // ingest two far-apart vectors, then ERASE one in place (the IVF
    // index deletes bounded — one list partition — so no ledger is
    // needed, unlike the text signature index; SCALE.md records the
    // contrast)
    vecs(20L -> Seq(0.7f, 0.7f), 21L -> Seq(-0.7f, 0.7f))
      .coalesce(1).write.parquet(s"$src/b1")
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema,
      threshold = 0.99, nProbe = 2).awaitTermination()
    assert(ids() == Set(10L, 11L, 20L, 21L))
    Similarity.deleteFromIvfIndex(spark, idx, Seq(20L).toDF("vec_id"))
    assert(ids() == Set(10L, 11L, 21L))
    // same-checkpoint re-run: nothing reprocesses, the erasure holds
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp1", schema,
      threshold = 0.99, nProbe = 2).awaitTermination()
    assert(ids() == Set(10L, 11L, 21L))
    // FULL replay (fresh checkpoint): the erased id is re-admitted — a
    // takedown means "as if never ingested", and a never-ingested id in
    // the source would be ingested; 21 is still replay-guarded
    VectorStream.ingestQuery(spark, s"$src/*", idx, s"$dir/cp2", schema,
      threshold = 0.99, nProbe = 2).awaitTermination()
    assert(ids() == Set(10L, 11L, 20L, 21L),
      "a full replay must re-admit erased ids and only erased ids")
  }

  test("drift monitor: rows match the q200 batch form, live reference stamped, replay converges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vdrift").toString
    val src = s"$dir/src"; val idx = s"$dir/idx"; val out = s"$dir/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    Similarity.writeIvfIndex(emb.filter($"vec_id" % 3 === 1), idx,
      nCentroids = 8)
    val w1 = emb.filter($"vec_id" % 3 === 0 && $"vec_id" % 2 === 0)
    val w2 = emb.filter($"vec_id" % 3 === 0 && $"vec_id" % 2 === 1)
    val mschema = emb.schema

    def psiOf(cur: org.apache.spark.sql.DataFrame): Double =
      graft.ops.Profile.psi(
        Similarity.assignmentDriftAgainstIndex(spark, idx, cur))
        .collect()(0).getDouble(0)
    def monRows() = spark.read.parquet(out)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_ref_total"),
          r.getAs[Double]("psi")))).toMap

    w1.coalesce(1).write.parquet(s"$src/w1")
    VectorStream.driftMonitorQuery(spark, s"$src/*", idx, out,
      s"$dir/cp", mschema).awaitTermination()
    val refTotal1 = emb.filter($"vec_id" % 3 === 1).count()
    // expected psi captured BEFORE the index moves
    val psi1 = psiOf(w1)
    assert(monRows() == Map(0L -> ((w1.count(), refTotal1, psi1))),
      s"batch-0 row must equal the q200 batch form: ${monRows()}")

    // the index grows between waves (live ingest): wave 2 is scored
    // against the GROWN corpus and the row says so via n_ref_total
    Similarity.appendIvfIndex(emb.filter($"vec_id" % 3 === 2), idx)
    w2.coalesce(1).write.parquet(s"$src/w2")
    VectorStream.driftMonitorQuery(spark, s"$src/*", idx, out,
      s"$dir/cp", mschema).awaitTermination()
    val refTotal2 = emb.filter($"vec_id" % 3 =!= 0).count()
    val rows = monRows()
    assert(rows(0L) == ((w1.count(), refTotal1, psi1)),
      "an already-emitted monitor row must not be rewritten")
    assert(rows(1L) == ((w2.count(), refTotal2, psiOf(w2))),
      s"batch-1 row must score against the grown reference: $rows")

    // replay from a fresh checkpoint over the now-quiescent index:
    // everything lands in batch 0, partition overwrite converges to
    // exactly one row with the combined-wave numbers
    VectorStream.driftMonitorQuery(spark, s"$src/*", idx, out,
      s"$dir/cp2", mschema).awaitTermination()
    val replayed = monRows()
    assert(replayed(0L) ==
      ((w1.count() + w2.count(), refTotal2, psiOf(w1.unionByName(w2)))),
      s"replay must converge to the combined-wave row: $replayed")
  }
}
