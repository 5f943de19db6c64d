package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden vectors for the rule-based `split_sentences` segmenter: each
  * documented rule (terminator runs, abbreviation and single-initial
  * lone-period exceptions, trailing text, trimming) pinned in
  * isolation. Direct function tests, no Spark session.
  */
class SentenceSplitSpec extends AnyFunSuite {

  private def split(text: String): Seq[String] = {
    val a = graft.functions.SentenceSplit.split(UTF8String.fromString(text))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("terminator + whitespace splits; terminator stays with its sentence") {
    assert(split("One two. Three four! Five six?")
      === Seq("One two.", "Three four!", "Five six?"))
  }

  test("abbreviations do not split") {
    assert(split("Dr. Smith met Prof. Jones. They left.")
      === Seq("Dr. Smith met Prof. Jones.", "They left."))
    assert(split("Costs rose, etc. and more") === Seq("Costs rose, etc. and more"))
    assert(split("CASE-INSENSITIVE: MRS. X stays") === Seq("CASE-INSENSITIVE: MRS. X stays"))
  }

  test("single initials and spelled acronyms do not split") {
    assert(split("John F. Kennedy spoke. Then left.")
      === Seq("John F. Kennedy spoke.", "Then left."))
    assert(split("The U.S. Navy sailed.") === Seq("The U.S. Navy sailed."))
  }

  test("multi-terminator runs always split, even after abbreviations") {
    assert(split("Really?! Yes. Wait... done")
      === Seq("Really?!", "Yes.", "Wait...", "done"))
    assert(split("It was Dr.. Next") === Seq("It was Dr..", "Next"))
  }

  test("a period NOT followed by whitespace does not split") {
    assert(split("Version 2.5 shipped. See notes.")
      === Seq("Version 2.5 shipped.", "See notes."))
    assert(split("visit example.com now") === Seq("visit example.com now"))
  }

  test("trailing text, trimming, and degenerate inputs") {
    assert(split("First. trailing tail") === Seq("First.", "trailing tail"))
    assert(split("  padded.   next  ") === Seq("padded.", "next"))
    assert(split("") === Seq.empty)
    assert(split("   ") === Seq.empty)
    assert(split("...") === Seq("..."))
    assert(split("One sentence only") === Seq("One sentence only"))
  }
}
