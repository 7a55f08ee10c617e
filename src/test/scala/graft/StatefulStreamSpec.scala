package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.sources.Tables

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.10 T8
  * extension surface): a per-user running event counter with cumulative
  * value, emitted per micro-batch — the KeyValueGroupedDataset state API the
  * engine exposes for semantics that windowed aggs can't express.
  */
case class UserEvent(user_id: Long, value: Double)
case class UserTotals(user_id: Long, n: Long, total: Double)

class StatefulStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState accumulates per-key state across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fmgws").toString
    val src = s"$dir/src"
    val cp = s"$dir/cp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("value"))
    // two input files -> maxFilesPerTrigger=1 forces multiple micro-batches
    // within one query, so the state crossing batches is observable.
    events.limit(200).coalesce(1).write.parquet(s"$src/b1")
    events.limit(700).exceptAll(events.limit(200)).coalesce(1)
      .write.parquet(s"$src/b2")

    def update(userId: Long, rows: Iterator[UserEvent],
               state: GroupState[UserTotals]): Iterator[UserTotals] = {
      val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotals(userId, n, total)
      state.update(next)
      Iterator(next)
    }

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
    val q = stream.writeStream.outputMode("update").format("memory")
      .queryName("totals").option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val emitted = spark.table("totals")
    assert(emitted.count() > spark.table("totals")
      .select("user_id").distinct().count(),
      "users spanning micro-batches must emit more than once")
    val latest = emitted.groupBy("user_id").agg(max("n").as("n"))
    val total = latest.agg(sum("n")).as[Long].head()
    assert(total == 700, s"state must accumulate 200 + 500 rows, got $total")
  }
}
