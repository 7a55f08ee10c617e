package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.vector.Similarity

/** J7 vector similarity: brute-force exactness, LSH bucket recall, norms. */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("cosine of identical vectors is 1.0; orthogonal is 0.0") {
    val d = vecs(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0), (3L, Seq(0f, 2f), 0))
    val out = Similarity.bruteForceTopK(d, d.filter($"vec_id" === 1), 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[Long]("neighbor_id") == 2L)
    assert(out(0).getAs[Double]("cosine") == 1.0)
    assert(out(1).getAs[Long]("neighbor_id") == 3L)
    assert(out(1).getAs[Double]("cosine") == 0.0)
  }

  test("bruteForceTopK returns exactly k neighbors per probe, self excluded") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), 5)
    assert(out.count() == 15)
    assert(out.filter($"probe_id" === $"neighbor_id").count() == 0)
    assert(out.groupBy("probe_id").count().select(max("count")).as[Long].head() == 5)
  }

  test("lshBucket is deterministic and within range") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val b1 = emb.select(Similarity.lshBucket("embedding", 8).as("b"))
      .agg(min("b"), max("b")).as[(Long, Long)].head()
    assert(b1._1 >= 0L && b1._2 <= 255L)
    val twice = emb.select(col("vec_id"), Similarity.lshBucket("embedding", 8).as("b"))
    assert(twice.groupBy("vec_id").agg(countDistinct("b").as("n"))
      .filter($"n" =!= 1).count() == 0)
  }

  test("identical vectors always share an LSH bucket (recall on exact dups)") {
    val base = (1 to 64).map(i => (i % 7 - 3).toFloat / 3f)
    val d = vecs((1L, base, 0), (2L, base, 0),
      (3L, base.map(x => -x), 1))
    val pairs = Similarity.lshCandidatePairs(d, bits = 8)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L))) // negated vector flips every sign bit
  }

  test("norms: unit-ish vectors from the testdata have l2_norm ~ 1") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val stats = Similarity.norms(emb).agg(min("l2_norm"), max("l2_norm"))
      .as[(Double, Double)].head()
    assert(stats._1 > 0.99 && stats._2 < 1.01)
  }
}
