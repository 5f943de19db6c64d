package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** D10: foreachBatch sink — per-microbatch batch-DataFrame handoff with
  * batch ids, the escape hatch for arbitrary sinks (upserts, JDBC, ...).
  */
class ForeachBatchSpec extends AnyFunSuite {

  test("foreachBatch receives each micro-batch as a batch DataFrame") {
    val spark = TestSpark.spark
    val seen = scala.collection.concurrent.TrieMap[Long, Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val q = EventStreams.events(spark, TestSpark.sfDir)
      .select(col("event_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        seen.put(id, batch.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    assert(seen.nonEmpty)
    assert(seen.values.sum === Tables(spark, TestSpark.sfDir, "events").count())
  }
}
