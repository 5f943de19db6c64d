package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** GOLDEN + PROP tier for the native graft_json_get Expression
  * (functions/JsonGet.scala): pinned edge semantics, and generated-input
  * parity with Spark's built-in get_json_object on flat objects.
  */
class JsonGetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jget(json: String, key: String = "k"): Option[String] = {
    import spark.implicits._
    val r = Seq(json).toDF("j")
      .selectExpr(s"graft_json_get(j, '$key') AS v").head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("GOLDEN: scalar extraction edge semantics") {
    assert(jget("""{"k": 76}""") === Some("76"))
    assert(jget("""{"k": "12"}""") === Some("12"))
    assert(jget("""{"k": -5, "x": 1}""") === Some("-5"))
    assert(jget("""{"x": 1, "k": 2.5e3}""") === Some("2.5e3"))
    assert(jget("""{"k": true}""") === Some("true"))
    assert(jget("""{  "k"  :  42  }""") === Some("42"), "whitespace tolerated")
    assert(jget("""{"k": null}""") === None, "JSON null is SQL NULL")
    assert(jget("""{}""") === None)
    assert(jget("""{"x": 1}""") === None, "missing key")
    assert(jget("""[1,2]""") === None, "top level must be an object")
    assert(jget("""not json""") === None)
    assert(jget("""""") === None)
    assert(jget("""{"k":1,"k":2}""") === Some("1"), "first occurrence wins")
  }

  test("GOLDEN: string tokenization — a \"k\": inside a VALUE cannot false-match") {
    // the case that kills regex-based extraction
    assert(jget("""{"x": "\"k\": 99", "k": 7}""") === Some("7"))
    assert(jget("""{"x": "{\"k\": 99}"}""") === None)
  }

  test("GOLDEN: nested containers are depth-skipped / returned as raw text") {
    assert(jget("""{"x": {"k": 9}, "k": 3}""") === Some("3"))
    assert(jget("""{"x": [{"k": 9}], "k": 4}""") === Some("4"))
    assert(jget("""{"k": {"a": 1}}""") === Some("""{"a": 1}"""), "object value → raw JSON text")
    assert(jget("""{"k": [1, 2]}""") === Some("[1, 2]"))
  }

  test("GOLDEN: escape handling in keys and values") {
    assert(jget("{\"\\u006b\": 5}") === Some("5"), "escaped key matches")
    assert(jget("""{"k": "a\nbA"}""") === Some("a\nbA"))
    assert(jget("""{"k": "q\"\\end"}""") === Some("q\"\\end"))
    assert(jget("""{"k": "café"}""") === Some("café"))
  }

  test("PROP: parity with get_json_object on generated flat objects") {
    import spark.implicits._
    val keyGen = Gen.oneOf("k", "key", "a", "zz")
    val nasty = Gen.oneOf("plain", "with space", "{", "}", "\"k\": 9", ":",
      "back\\slash", "line\nbreak", "café", "", "12")
    val valGen = Gen.oneOf(nasty, Gen.chooseNum(-1000000, 1000000).map(_.toString))
    val mapGen = Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(4))
    val maps = (0 until 200).flatMap(i =>
      mapGen.apply(Gen.Parameters.default, Seed(7L + i)))

    val df = maps.map(m => ("x", m)).toDF("tag", "m")
      .select(to_json(col("m")).as("j"))
      .selectExpr("j", "graft_json_get(j, 'k') AS ours",
        "get_json_object(j, '$.k') AS theirs")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.get(1) === r.get(2), s"mismatch on ${r.getString(0)}")
    }
  }

  test("PROP: parity with get_json_object on integer-valued objects") {
    import spark.implicits._
    val mapGen = Gen.mapOf(Gen.zip(Gen.oneOf("k", "n"), Gen.chooseNum(Int.MinValue, Int.MaxValue)))
    val maps = (0 until 100).flatMap(i =>
      mapGen.apply(Gen.Parameters.default, Seed(99L + i)))
    val rows = maps.map(m => ("x", m)).toDF("tag", "m")
      .select(to_json(col("m")).as("j"))
      .selectExpr("j", "graft_json_get(j, 'k') AS ours",
        "get_json_object(j, '$.k') AS theirs").collect()
    rows.foreach(r => assert(r.get(1) === r.get(2), s"mismatch on ${r.getString(0)}"))
  }
}
