package graft

import org.scalatest.funsuite.AnyFunSuite

/** E2 GOLDEN (SURVEY.md §5.2): the Scala sketch kernel must reproduce the
  * committed output of the independent Python implementation
  * (scripts/minhash_reference.py -> golden/minhash_golden.json). Provenance
  * in FIXTURES.md.
  */
class TextGoldenSpec extends AnyFunSuite {
  import TextFunctions._

  private val golden: Seq[Map[String, Any]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/minhash_golden.json"))
    val json = try src.mkString finally src.close()
    // minimal parse via Jackson (on the Spark classpath)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    (0 until root.size()).map { i =>
      val n = root.get(i)
      Map(
        "text" -> n.get("text").asText(),
        "fnv1a64" -> n.get("fnv1a64").asLong(),
        "minhash_first16" -> (0 until n.get("minhash_first16").size())
          .map(j => n.get("minhash_first16").get(j).asLong()).toSeq,
        "simhash64" -> n.get("simhash64").asLong(),
        "fingerprint64" -> n.get("fingerprint64").asLong())
    }
  }

  test("Scala sketches reproduce the independent Python reference exactly") {
    golden.foreach { g =>
      val text = g("text").asInstanceOf[String]
      assert(fnv1a64(text) === g("fnv1a64"), s"fnv1a64($text)")
      assert(minhash(text, 128, 5).take(16).toSeq === g("minhash_first16"),
        s"minhash($text)")
      assert(simhash64(text) === g("simhash64"), s"simhash64($text)")
      assert(fingerprint64(text) === g("fingerprint64"), s"fingerprint64($text)")
    }
  }
}
