package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Native spatial predicates vs the JTS UDF scalars: identical verdicts on
  * generated point/box pairs (including boundary touches), identical null
  * behavior, prepared-literal and column-column paths both exercised, and
  * the b09-style projection carries native nodes (no ScalaUDF).
  */
class WkbPredicatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  private val coord = Gen.chooseNum(-100.0, 100.0)

  test("PROP: native verdicts equal the JTS scalar implementations (literal box)") {
    import spark.implicits._
    val box = GeoFunctions.stMakeBoxF(-10.0, -10.0, 10.0, 10.0)
    val pts = samples(Gen.zip(coord, coord)) ++
      Seq((10.0, 10.0), (-10.0, 0.0), (10.0, -10.0), (0.0, 10.0)) // boundary
    val df = pts.map { case (x, y) => GeoFunctions.stPointF(x, y) }.toDF("g")
    val rows = df.select(
      GeoFunctions.st_intersects(col("g"), lit(box)).as("i"),
      GeoFunctions.st_within(col("g"), lit(box)).as("w"),
      GeoFunctions.st_contains(lit(box), col("g")).as("c"),
      GeoFunctions.st_disjoint(col("g"), lit(box)).as("d"),
      col("g")).collect()
    rows.foreach { r =>
      val g = r.getAs[Array[Byte]](4)
      assert(r.getBoolean(0) === GeoFunctions.stIntersectsF(g, box))
      assert(r.getBoolean(1) === GeoFunctions.stWithinF(g, box))
      assert(r.getBoolean(2) === GeoFunctions.stContainsF(box, g))
      assert(r.getBoolean(3) === GeoFunctions.stDisjointF(g, box))
    }
  }

  test("column-column path (no literal, no prepared geometry) agrees, both verdicts occur") {
    import spark.implicits._
    // shift the box so roughly half the pairs do NOT intersect — a
    // constant-true implementation must fail this test
    val pairs = samples(Gen.zip(coord, coord, Gen.chooseNum(-40.0, 40.0)), 40).map {
      case (x, y, shift) =>
        (GeoFunctions.stPointF(x, y),
          GeoFunctions.stMakeBoxF(x + shift, y + shift, x + shift + 10, y + shift + 10))
    }
    val rows = pairs.toDF("a", "b").select(
      GeoFunctions.st_intersects(col("a"), col("b")).as("i"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(0) ===
        GeoFunctions.stIntersectsF(r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2)))
    }
    val verdicts = rows.map(_.getBoolean(0)).toSet
    assert(verdicts === Set(true, false), s"need both verdicts, got $verdicts")
  }

  test("literal CONTAINER on the left uses the prepared path and agrees") {
    import spark.implicits._
    val box = GeoFunctions.stMakeBoxF(-20.0, -20.0, 20.0, 20.0)
    val pts = samples(Gen.zip(coord, coord), 40).map { case (x, y) => GeoFunctions.stPointF(x, y) }
    val rows = pts.toDF("g")
      .select(GeoFunctions.st_contains(lit(box), col("g")).as("c"), col("g")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(0) === GeoFunctions.stContainsF(box, r.getAs[Array[Byte]](1)))
    }
    assert(rows.map(_.getBoolean(0)).toSet === Set(true, false))
  }

  test("NULL literal argument analyzes and yields NULL (implicit cast from NullType)") {
    import spark.implicits._
    val rows = Seq(GeoFunctions.stPointF(1, 1)).toDF("g")
      .select(GeoFunctions.st_intersects(col("g"), lit(null)).as("i")).collect()
    assert(rows.head.isNullAt(0))
  }

  test("wrong SQL arity raises a clear error, not IndexOutOfBounds") {
    val e = intercept[Exception] {
      spark.sql("SELECT st_intersects(X'00')").collect()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("null in -> null out") {
    import spark.implicits._
    val box = GeoFunctions.stMakeBoxF(0, 0, 1, 1)
    val df = Seq(Option.empty[Array[Byte]], Some(GeoFunctions.stPointF(0.5, 0.5)))
      .toDF("g")
      .select(GeoFunctions.st_intersects(col("g"), lit(box)).as("i"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).getBoolean(0))
  }

  test("b09-style projection carries native predicate nodes, not ScalaUDF") {
    val df = spark.range(10).toDF("id")
      .select(GeoFunctions.st_point(col("id").cast("double"), lit(0.0)).as("g"))
      .select(GeoFunctions.st_within(col("g"),
        lit(GeoFunctions.stMakeBoxF(0, -1, 5, 1))).as("w"))
    val native = df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.StWithinExpr]))
    assert(native, df.queryExecution.optimizedPlan.toString)
  }

  test("SQL names route to native expressions") {
    import spark.implicits._
    val box = GeoFunctions.stMakeBoxF(0, 0, 2, 2)
    val df = Seq(GeoFunctions.stPointF(1, 1)).toDF("g")
    val r = df.selectExpr(s"st_intersects(g, unhex('${box.map("%02x".format(_)).mkString}')) AS i")
      .collect().head
    assert(r.getBoolean(0))
  }
}
