package graft

import org.scalatest.funsuite.AnyFunSuite

/** GOLDEN + PROP tier for the owned text-sketch kernel (SURVEY.md §7
  * hard-part 2: determinism comes from owning the hash family, documented
  * here against public FNV-1a test vectors).
  */
class TextFunctionsSpec extends AnyFunSuite {
  import TextFunctions._

  test("FNV-1a 64 public test vectors") {
    assert(fnv1a64("") === 0xcbf29ce484222325L)
    assert(fnv1a64("a") === 0xaf63dc4c8601ec8cL)
    assert(fnv1a64("abc") === 0xe71fa2190541574bL)
  }

  test("splitmix64 is deterministic and spread") {
    assert(splitmix64(0) !== splitmix64(1))
    assert(splitmix64(42) === splitmix64(42))
  }

  test("shingles: normalization collapses whitespace, lowercases") {
    assert(shingles("A  b\tC", 3).toSeq === Seq("a b", " b ", "b c"))
    assert(shingles("ab", 5).toSeq === Seq("ab")) // shorter than k
  }

  test("PROP: minhash(x) == minhash(x) and estimated J(x,x) = 1") {
    val s = minhash("the quick brown fox jumps over the lazy dog", 128, 5)
    val s2 = minhash("the quick brown fox jumps over the lazy dog", 128, 5)
    assert(s.toSeq === s2.toSeq)
  }

  test("r18: optimized minhash ≡ the naive shingles().fold reference form") {
    // The optimized kernel (direct char-walk shingle hashing, single-pass
    // whitespace collapse, sorted-dedup before the perm loop) must be
    // BIT-IDENTICAL to the definitional form it replaced: min over every
    // shingle of h_i(fnv1a64(shingle)). Exercises repetition (the dedup
    // path), control chars at the ends (the \s-vs-trim distinction),
    // shorter-than-k inputs, and the empty string.
    def reference(text: String, numPerm: Int, k: Int): Array[Long] = {
      val params = hashParams(numPerm)
      val sig = Array.fill(numPerm)(Long.MaxValue)
      shingles(text, k).foreach { sh =>
        val x = fnv1a64(sh) & Long.MaxValue
        var i = 0
        while (i < numPerm) {
          val (a, b) = params(i)
          val hi = Math.multiplyHigh(a, x)
          val lo = a * x
          val prod = ((lo & MersennePrime) + ((lo >>> 61) | (hi << 3)))
          val folded = (prod & MersennePrime) + (prod >>> 61)
          val hx = (folded + b) % MersennePrime
          if (hx < sig(i)) sig(i) = hx
          i += 1
        }
      }
      sig
    }
    val cases = Seq(
      "the the the the the the the", // heavy shingle repetition
      "A  b\tC\nd\u000Be\ff\rg",     // every \s char, runs collapsed
      "\u0001 leading control\u0002", // non-\s control chars trimmed at ends
      "ab",                           // shorter than k
      "",                             // empty
      "spark makes distributed dataframes fast and reliable for analytics")
    cases.foreach { t =>
      assert(minhash(t, 128, 5).toSeq === reference(t, 128, 5).toSeq, s"input: ${t.take(30)}")
      assert(minhash(t, 16, 3).toSeq === reference(t, 16, 3).toSeq, s"input: ${t.take(30)}")
    }
  }

  test("PROP: minhash similarity tracks Jaccard of shingle sets") {
    val a = "spark makes distributed dataframes fast and reliable for analytics"
    val b = "spark makes distributed dataframes fast and reliable for analysis"
    val c = "completely different text about cooking pasta with tomato sauce"
    def est(x: String, y: String): Double = {
      val (sx, sy) = (minhash(x, 128, 5), minhash(y, 128, 5))
      sx.zip(sy).count { case (u, v) => u == v } / 128.0
    }
    def trueJ(x: String, y: String): Double = {
      val (sx, sy) = (shingles(x, 5).toSet, shingles(y, 5).toSet)
      sx.intersect(sy).size.toDouble / sx.union(sy).size
    }
    assert(math.abs(est(a, b) - trueJ(a, b)) < 0.15) // 128 perms ≈ ±0.09 sd
    assert(est(a, b) > 0.6)
    assert(est(a, c) < 0.2)
  }

  test("GOLDEN: BPE training reproduces the hand-derived merge sequence") {
    // the classic corpus (Sennrich et al. 2015's example shape); merges
    // derived BY HAND: pair counts round by round, ties broken by
    // lexicographically smallest pair
    val merges = bpeTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    assert(merges === Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val ranks = merges.zipWithIndex.toMap
    // the greedy encoder applies them lowest-rank-first
    assert(bpeEncode("lowest", ranks) === Vector("low", "est"))
    assert(bpeEncode("newest", ranks) === Vector("n", "e", "w", "est"))
    assert(bpeEncode("widest", ranks) === Vector("w", "i", "d", "est"))
    // unseen symbols degrade to characters, never fail
    assert(bpeEncode("xyz", ranks) === Vector("x", "y", "z"))
    assert(bpeEncode("", ranks) === Vector.empty)
    // asking for more merges than exist stops cleanly at exhaustion
    assert(bpeTrain(Map("ab" -> 1L), 100) === Vector(("a", "b")))
  }

  test("PROP: BPE encode concatenation is the identity; training is deterministic") {
    val corpus = Map("spark" -> 9L, "sparse" -> 4L, "parser" -> 6L,
      "partition" -> 8L, "part" -> 7L, "shuffle" -> 5L)
    val merges = bpeTrain(corpus, 12)
    assert(merges === bpeTrain(corpus, 12)) // deterministic
    val ranks = merges.zipWithIndex.toMap
    (corpus.keys ++ Seq("spartan", "paper", "zzz", "a")).foreach { w =>
      val toks = bpeEncode(w, ranks)
      assert(toks.mkString === w, s"'$w' lost content: $toks")
      assert(toks.forall(_.nonEmpty))
    }
    // frequent training words compress below character count
    assert(bpeEncode("partition", ranks).length < "partition".length)
  }

  test("GOLDEN: WordPiece training reproduces the hand-derived merge sequence") {
    // hand-derived round by round with the likelihood-gain score
    // c(ab)/(c(a)·c(b)): round 1 all four pairs tie at 0.05 → lexico
    // smallest (##g,##s); round 2 ties again → (##u,##g); round 3
    // (##u,##gs) wins outright at 0.2; round 4 ties → (h,##ugs)
    val vocab = wordpieceTrain(Map("hug" -> 10L, "pug" -> 5L, "hugs" -> 5L), 4)
    assert(vocab === Vector("##g", "##s", "##u", "h", "p",
      "##gs", "##ug", "##ugs", "hugs"))
    assert(vocab === wordpieceTrain(Map("hug" -> 10L, "pug" -> 5L, "hugs" -> 5L), 4))
  }

  test("GOLDEN: WordPiece greedy longest-match encode, [UNK] collapse, edges") {
    val vocab = wordpieceTrain(Map("hug" -> 10L, "pug" -> 5L, "hugs" -> 5L), 4).toSet
    assert(wordpieceEncode("hugs", vocab) === Vector("hugs")) // longest wins
    assert(wordpieceEncode("hug", vocab) === Vector("h", "##ug"))
    assert(wordpieceEncode("pugs", vocab) === Vector("p", "##ugs"))
    assert(wordpieceEncode("hux", vocab) === Vector("[UNK]")) // BERT rule: whole word
    assert(wordpieceEncode("", vocab) === Vector.empty)
    // continuation prefix is positional: bare 'u' (word-initial) is NOT
    // in this vocab even though ##u is
    assert(wordpieceEncode("u", vocab) === Vector("[UNK]"))
  }

  test("PROP: WordPiece encode concatenation is the identity on non-UNK words; maxPieceLen holds") {
    val corpus = Map("spark" -> 9L, "sparse" -> 4L, "parser" -> 6L,
      "partition" -> 8L, "part" -> 7L, "shuffle" -> 5L)
    val vocab = wordpieceTrain(corpus, 50, maxPieceLen = 4)
    def rawLen(p: String) = if (p.startsWith("##")) p.length - 2 else p.length
    assert(vocab.forall(rawLen(_) <= 4))
    val vset = vocab.toSet
    corpus.keys.foreach { w =>
      val toks = wordpieceEncode(w, vset, maxPieceLen = 4)
      assert(toks != Vector("[UNK]"), s"'$w' went UNK on its own training corpus")
      assert(toks.head + toks.tail.map(_.substring(2)).mkString === w,
        s"'$w' lost content: $toks")
    }
    assert(wordpieceEncode("zzz", vset, maxPieceLen = 4) === Vector("[UNK]"))
  }

  test("simhash: similar texts have small hamming distance") {
    val a = simhash64("spark distributed dataframe engine for large analytics")
    val b = simhash64("spark distributed dataframe engine for huge analytics")
    val c = simhash64("recipe for chocolate cake with vanilla frosting")
    assert(hamming64(a, b) < hamming64(a, c))
    assert(hamming64(a, a) === 0)
  }

  test("fingerprint64 deterministic, whitespace-normalized") {
    assert(fingerprint64("a  b") === fingerprint64("A B"))
    assert(fingerprint64("ab") !== fingerprint64("ba"))
  }

  test("langId heuristics") {
    assert(langId("the cat and the dog is in a house") === "en")
    assert(langId("le chat et la maison est une merveille") === "fr")
    assert(langId("el perro y la casa es una maravilla") === "es")
    assert(langId("der Hund und die Katze ist nicht zu Hause") === "de")
    assert(langId("中文文本") === "zh")
    assert(langId("") === "und")
  }

  test("GOLDEN: unigram Viterbi encode — min cost, then fewer pieces, then lex") {
    // cost tie between [xy] (one piece) and [x y] (two): fewer pieces wins
    val v1 = Map("x" -> 100, "y" -> 100, "xy" -> 200)
    assert(TextFunctions.unigramEncode("xy", v1) === Some(Vector("xy")))
    // strict cost minimum beats piece count
    val v2 = Map("x" -> 100, "y" -> 100, "xy" -> 150)
    assert(TextFunctions.unigramEncode("xy", v2) === Some(Vector("xy")))
    val v3 = Map("x" -> 50, "y" -> 50, "xy" -> 150)
    assert(TextFunctions.unigramEncode("xy", v3) === Some(Vector("x", "y")))
    // full tie on (cost, count): lexicographic piece sequence decides
    val v4 = Map("a" -> 100, "b" -> 100, "c" -> 100, "ab" -> 200, "bc" -> 200)
    assert(TextFunctions.unigramEncode("abc", v4) === Some(Vector("a", "bc")))
    // uncoverable position -> None (caller renders [UNK])
    assert(TextFunctions.unigramEncode("axb", v4) === None)
    assert(TextFunctions.unigramEncode("", v4) === Some(Vector.empty))
  }

  test("PROP: unigram encode concatenation is the identity; train is deterministic and total") {
    val freq = Map("the" -> 50L, "then" -> 20L, "them" -> 15L, "quick" -> 8L,
      "quickly" -> 5L, "fox" -> 12L, "foxes" -> 4L, "run" -> 9L, "running" -> 6L)
    val vocab = TextFunctions.unigramTrain(freq, vocabSize = 24)
    assert(vocab === TextFunctions.unigramTrain(freq, vocabSize = 24))
    assert(vocab.length <= 24)
    // every corpus character survives pruning -> total coverage
    val chars = freq.keys.flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(vocab.map(_._1).toSet))
    assert(vocab.forall(_._2 >= 0))
    val costs = vocab.toMap
    freq.keys.foreach { w =>
      val enc = TextFunctions.unigramEncode(w, costs)
      assert(enc.isDefined, w)
      assert(enc.get.mkString === w)
    }
    // a high-frequency whole word earns a cheaper cost than a rare one
    // it shares characters with, when both survive as pieces
    if (costs.contains("the") && costs.contains("quick"))
      assert(costs("the") < costs("quick"))
  }

  test("wordpieceTrain: corpus beyond the exact-Long scoring bound fails loudly") {
    // 3e6 symbol instances would let the cross-multiplied score wrap —
    // the API must refuse, not silently invert merge decisions
    val e = intercept[IllegalArgumentException](
      graft.TextFunctions.wordpieceTrain(Map("abc" -> 1000000L), nMerges = 1))
    assert(e.getMessage.contains("scoring bound"))
    // at the bound it still trains
    assert(graft.TextFunctions.wordpieceTrain(Map("ab" -> 1000000L), nMerges = 1)
      .contains("ab"))
  }
}
