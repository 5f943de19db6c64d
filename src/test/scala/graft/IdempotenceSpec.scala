package graft

import graft.operators.Canonicalize
import org.scalatest.funsuite.AnyFunSuite

/** Driver-behavior insurance: every declared query must be re-runnable in
  * one session with identical results — fixture-writing queries (CSV/blob
  * scratch), streaming queries (memory-sink name reuse, checkpoint temp
  * dirs) and geoparquet writers are the risky ones.
  */
class IdempotenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runTwice(name: String): Unit = {
    val q = SparkEntry.queries(name)
    val h1 = Canonicalize.hash(q(spark, TestSpark.sfDir))
    val h2 = Canonicalize.hash(q(spark, TestSpark.sfDir))
    assert(h1 === h2, s"$name not idempotent")
  }

  test("fixture-writing queries are idempotent") {
    runTwice("c02_csv_roundtrip")
    runTwice("e12_binary_ingest")
    runTwice("e12b_image_meta")
    runTwice("e12c_audio_meta")
    runTwice("a01_geoparquet_points")
  }

  test("iterative / driver-side-literal queries are idempotent") {
    runTwice("e18_dedup_clusters")
    runTwice("e_ann_ivf")
    runTwice("e03_cosine_topk")
  }

  test("streaming queries are idempotent (sink name + checkpoint reuse)") {
    runTwice("d01_stream_scan")
    runTwice("d09b_transform_with_state")
  }
}
