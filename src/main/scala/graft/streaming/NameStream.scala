package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.FuzzyJoin

/** Streaming twin of the fuzzy-name (entity-resolution) pipeline — the
  * FIFTH instance of the "the index IS the dedup state" ingest shape
  * (text: [[CorpusStream]]; vectors: [[VectorStream]]; frames + audio:
  * [[AssetStream]]; here: names). Name batches land in `srcDir`; each
  * micro-batch is (1) replay-guarded against the persisted variant index
  * (bucket-pruned: the check reads only the batch's own `tb` partition
  * directories), (2) internally deduped (connected components over the
  * batch's own lev ≤ k pairs, lexicographic-min survivor — the
  * [[graft.text.TextDedup.dedupClusters]] machinery with
  * [[FuzzyJoin.fuzzySelfJoin]] as the pair generator), (3) deduped
  * against the indexed corpus with corpus precedence
  * ([[FuzzyJoin.fuzzyProbe]]), and the survivors' variant rows append
  * into the index through the OVERLAP-SAFE
  * [[FuzzyJoin.appendVariantIndex]].
  *
  * Exactly-once without a state store, the [[AssetStream]] argument
  * re-keyed from asset ids to terms: `foreachBatch` is at-least-once,
  * and every step is idempotent against replay — a re-delivered term
  * that SURVIVED last time dies on the replay guard; one that LOST loses
  * again to the same deterministic pipeline; and even if an append raced
  * ahead of a crash, [[FuzzyJoin.appendVariantIndex]]'s term-level
  * anti-join makes the re-append a structural no-op (the overlap-safe
  * append IS a second, independent replay guard — the belt the other
  * four streams wear as a bucket-pruned check here also holds the
  * index-consistency braces). State store rows: ZERO at any stream
  * length — the `tb`-bucket-partitioned index directories are the state,
  * bounded by the surviving name corpus.
  *
  * Bootstrap with [[FuzzyJoin.writeVariantIndex]] over the seed corpus
  * before starting the stream; the probe distance is the index's OWN
  * build depth (from the `_FUZZY_META` sidecar), so stream and index can
  * never disagree on completeness.
  */
object NameStream {

  /** One name micro-batch through the gauntlet; exposed for tests.
    * Returns the surviving terms as a one-column `t` frame. Order
    * matters exactly as in the other four streams: replay guard first
    * (a replayed batch must not pay the pair step), internal dedup
    * before the corpus probe (two in-batch near-dups cost one probe).
    */
  private[graft] def dedupBatch(spark: SparkSession, names: DataFrame,
                                nameCol: String, indexDir: String,
                                maxBucket: Int): DataFrame = {
    val (k, nBuckets) = FuzzyJoin.indexMeta(spark, indexDir)
    val terms = names.select(col(nameCol).cast("string").as("t"))
      .distinct().localCheckpoint()
    val newTerms = terms
      .join(FuzzyJoin.indexedTerms(spark, indexDir, terms, nBuckets),
        Seq("t"), "left_anti")
      .localCheckpoint()
    // in-batch entity resolution: lev <= k pairs -> components ->
    // lexicographic-min survivor (the transitive chain a~b~c must keep
    // ONE spelling, not drop b twice and keep both ends). dedupClusters'
    // convergence certificate is exact only for NUMERIC vertex ids, so
    // terms get deterministic dense ids first — row_number over the
    // sorted terms, which makes min-id survivor ≡ lexicographic-min term
    // AND keeps the whole batch pipeline a pure function of its input
    // (the replay-idempotence argument needs that). The unpartitioned
    // sort is a single task bounded by the batch's NEW-term count (post
    // replay guard — a daily name feed's genuinely new spellings), not
    // the corpus; a feed whose per-batch novelty outgrows one task
    // should chop its batches, not this id assignment.
    val withId = newTerms.select(col("t"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("t"))).cast("long").as("nid"))
      .localCheckpoint()
    val idPairs = FuzzyJoin.fuzzySelfJoin(newTerms, "t", k, maxBucket)
      .join(withId.select(col("t").as("name_a"), col("nid").as("doc_a")),
        Seq("name_a"))
      .join(withId.select(col("t").as("name_b"), col("nid").as("doc_b")),
        Seq("name_b"))
      .select(col("doc_a"), col("doc_b"))
    val losers = graft.text.TextDedup.dedupClusters(idPairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .join(withId.select(col("nid").as("doc_id"), col("t")), Seq("doc_id"))
      .select(col("t"))
    val internal = newTerms.join(losers, Seq("t"), "left_anti")
    // corpus precedence: a batch name within lev <= k of an indexed name
    // is dropped (the index never loses to an arrival)
    val matched = FuzzyJoin.fuzzyProbe(spark, indexDir, internal, "t", k,
        maxBucket)
      .select(col("name_b").as("t")).distinct()
    internal.join(matched, Seq("t"), "left_anti")
  }

  /** Start the ingestion stream: parquet name batches in `srcDir` →
    * deduped variant rows appended into `indexDir`.
    * `Trigger.AvailableNow` drains the backlog and stops (the
    * batch-incremental mode every other stream here uses); swap the
    * trigger for continuous ingestion.
    */
  def ingestQuery(spark: SparkSession, srcDir: String, indexDir: String,
                  checkpointDir: String, schema: StructType,
                  nameCol: String = "name",
                  maxBucket: Int = Int.MaxValue): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        FuzzyJoin.appendVariantIndex(
          dedupBatch(spark, batch.toDF(), nameCol, indexDir, maxBucket),
          "t", indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
