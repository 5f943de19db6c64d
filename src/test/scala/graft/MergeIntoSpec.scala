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
