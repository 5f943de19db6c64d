package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` installation path: a
  * session built with ONLY the conf (no Graft.prepare call) must resolve
  * the native function surface and auto-route raw spatial joins — the way
  * a Thrift-gateway or Spark Connect deployment installs the library.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("conf-installed session resolves natives and routes spatial joins without prepare()") {
    val prior = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session over the SAME SparkContext. `spark.sql.extensions` is
      // a STATIC conf read from the SparkContext at session construction —
      // un-settable on the shared test context — so the spec drives the
      // identical code path through builder.withExtensions; the conf-string
      // class loading around it is stock Spark.
      val s = SparkSession.builder()
        .master(prior.sparkContext.master)
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s ne prior, "expected a fresh SparkSession instance")

      import s.implicits._
      // function surface (SQL path), no prepare(): point + predicate + json
      val one = s.sql(
        """SELECT st_intersects(st_point(1.0D, 1.0D), st_point(1.0D, 1.0D)) AS hit,
                  graft_json_get('{"k": 7}', 'k') AS k,
                  pack_ascii8('AB') AS p""").head()
      assert(one.getBoolean(0) === true)
      assert(one.getString(1) === "7")

      // optimizer rules injected: a raw st_intersects join routes to the
      // grid equi-join (no BNL) exactly as via Graft.prepare. Geometry
      // construction goes through the scalar UDF (registry-independent).
      val l = Seq((1L, 0.0, 0.0, 10.0, 10.0), (2L, 100.0, 100.0, 110.0, 110.0))
        .toDF("id", "x0", "y0", "x1", "y1")
        .select($"id", org.apache.spark.sql.functions.udf(GeoFunctions.stMakeBoxF)
          .apply($"x0", $"y0", $"x1", $"y1").as("ga"))
      val r = Seq((10L, 5.0, 5.0, 15.0, 15.0))
        .toDF("id", "x0", "y0", "x1", "y1")
        .select($"id".as("rid"), org.apache.spark.sql.functions.udf(GeoFunctions.stMakeBoxF)
          .apply($"x0", $"y0", $"x1", $"y1").as("gb"))
      val q = l.join(r, GeoFunctions.st_intersects($"ga", $"gb"))
        .select($"id", $"rid")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule not injected:\n$plan")
      assert(q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet === Set((1L, 10L)))
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
