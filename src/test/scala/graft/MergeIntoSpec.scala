package graft

import graft.operators.MergeInto
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge semantics the c41 oracle cannot isolate: multi-version
  * batches, delete-then-reinsert ordering, keys only in changes (inserts),
  * and the broadcast-anti plan shape.
  */
class MergeIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base() = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
  }

  test("latest version wins within a batch; deletes drop; inserts appear") {
    import spark.implicits._
    val changes = Seq(
      // key 1: update v1 then DELETE v2 -> gone
      (1L, "a", 11.0, 1L, false),
      (1L, "a", 11.0, 2L, true),
      // key 2: delete v1 then REINSERT v2 -> new value survives
      (2L, "b", 0.0, 1L, true),
      (2L, "b2", 22.0, 2L, false),
      // key 9: pure insert (not in base)
      (9L, "i", 90.0, 1L, false))
      .toDF("k", "name", "v", "version", "deleted")
    val out = MergeInto.applyChanges(base(), changes, "k", "version", "deleted")
      .orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out === Seq((2L, "b2", 22.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("STREAMING CDC apply: foreachBatch folds micro-batches into parquet state") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // the lakehouse pattern end-to-end: a stream of keyed change rows,
    // each micro-batch MERGEd into a parquet state dir via foreachBatch —
    // exactly-once per batch (overwrite), latest-wins across batches.
    val stateDir = java.nio.file.Files.createTempDirectory("graft_cdc_state").toString
    val cdcDir = java.nio.file.Files.createTempDirectory("graft_cdc_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    base().write.mode("overwrite").parquet(stateDir)
    // two change files -> the AvailableNow run sees them as input batches
    Seq((1L, "a", 11.0, 1L, false), (4L, "d", 40.0, 2L, false))
      .toDF("k", "name", "v", "version", "del")
      .repartition(1).write.mode("overwrite").parquet(s"$cdcDir/f1")
    Seq((2L, "b", 0.0, 3L, true), (1L, "a", 12.0, 4L, false))
      .toDF("k", "name", "v", "version", "del")
      .repartition(1).write.mode("overwrite").parquet(s"$cdcDir/f2")
    // the file source processes oldest-mtime first: pin mtimes so f1 is
    // batch 0 and f2 batch 1, deterministically
    def setMtime(dir: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        java.nio.file.Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(t))
      }
    val now = 1700000000000L // fixed epoch: only the relative order matters
    setMtime(s"$cdcDir/f1", now - 60000)
    setMtime(s"$cdcDir/f2", now)
    val stream = spark.readStream
      .schema("k LONG, name STRING, v DOUBLE, version LONG, del BOOLEAN")
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches
      .parquet(s"$cdcDir/f*")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = MergeInto.applyChanges(
          spark.read.parquet(stateDir), batch, "k", "version", "del")
          .localCheckpoint() // materialize BEFORE overwriting the input dir
        merged.write.mode("overwrite").parquet(stateDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(120000)
    val finalState = spark.read.parquet(stateDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // k=1 updated (latest version across batches), k=2 deleted, k=3
    // untouched, k=4 inserted
    assert(finalState === Set((1L, "a", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("empty change batch is the identity") {
    import spark.implicits._
    val changes = Seq.empty[(Long, String, Double, Long, Boolean)]
      .toDF("k", "name", "v", "version", "deleted")
    val out = MergeInto.applyChanges(base(), changes, "k", "version", "deleted")
      .orderBy(col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("plan shape: small change batch broadcasts; base does not shuffle") {
    import spark.implicits._
    val changes = Seq((2L, "b2", 22.0, 1L, false)).toDF("k", "name", "v", "version", "deleted")
    val out = MergeInto.applyChanges(base(), changes, "k", "version", "deleted")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti side not broadcast:\n$plan")
  }
}
