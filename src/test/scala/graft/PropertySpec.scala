package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-based PROP tier (SURVEY.md §5.2): invariants over generated
  * inputs (ScalaCheck Gens, fixed seed for reproducible runs), not
  * hand-picked fixtures.
  */
class PropertySpec extends AnyFunSuite {
  import GeoFunctions._
  import TextFunctions._

  /** n deterministic samples from a Gen. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val coord = Gen.chooseNum(-1e6, 1e6)

  test("PROP: WKB point round-trip is exact for arbitrary coordinates") {
    samples(Gen.zip(coord, coord)).foreach { case (x, y) =>
      val g = fromWkb(stPointF(x, y))
      assert(g.getCoordinate.x === x && g.getCoordinate.y === y, s"($x,$y)")
    }
  }

  test("PROP: box area/envelope/containment for arbitrary corners") {
    samples(Gen.zip(coord, coord, Gen.chooseNum(0.001, 1e4), Gen.chooseNum(0.001, 1e4)))
      .foreach { case (x0, y0, w, h) =>
        val box = stMakeBoxF(x0, y0, x0 + w, y0 + h)
        // shoelace cancellation error scales with coordinate MAGNITUDE
        // (cross products of offset corners), not with the area itself
        val mx = math.max(math.abs(x0), math.abs(x0 + w))
        val my = math.max(math.abs(y0), math.abs(y0 + h))
        assert(math.abs(stAreaF(box) - w * h) <= math.ulp(mx * my) * 16,
          s"area($x0,$y0,$w,$h)")
        assert(stEnvelopeF(box) === ((x0, y0, x0 + w, y0 + h)))
        assert(stContainsF(box, stPointF(x0 + w / 2, y0 + h / 2)) === true)
      }
  }

  test("PROP: GeoJSON write∘parse is the WKB identity over generated geometries") {
    // arbitrary points, boxes, multipoints and collections thereof — the
    // parser must reproduce the exact input bytes from the writer's text
    // (doubles survive because Java's shortest-repr toString parses back
    // to the same double).
    val point = Gen.zip(coord, coord).map { case (x, y) => stPointF(x, y) }
    val box = Gen.zip(coord, coord, Gen.chooseNum(0.001, 1e4), Gen.chooseNum(0.001, 1e4))
      .map { case (x, y, w, h) => stMakeBoxF(x, y, x + w, y + h) }
    val multi = Gen.nonEmptyListOf(Gen.zip(coord, coord))
      .map(ps => stCollectF(ps.take(8).map { case (x, y) => stPointF(x, y) }))
    val collection = Gen.zip(point, box)
      .map { case (p, b) => stCollectF(Seq(p, b)) }
    Seq(point, box, multi, collection).foreach { g =>
      samples(g, 50).foreach { wkb =>
        val json = stAsGeoJsonF(wkb)
        assert(stGeomFromGeoJsonF(json).sameElements(wkb),
          s"round-trip failed for $json")
      }
    }
  }

  test("PROP: buffer contains original for arbitrary positive distance") {
    samples(Gen.zip(coord, coord, Gen.chooseNum(0.01, 100.0)), 40).foreach { case (x, y, d) =>
      val p = stPointF(x, y)
      assert(stContainsF(stBufferF(p, d), p) === true, s"buffer($x,$y,$d)")
    }
  }

  test("PROP: cents2 is exact for arbitrary 2-decimal values incl. negatives") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cents = samples(Gen.chooseNum(-100000000L, 100000000L))
    val got = cents.map(_ / 100.0).toDF("v")
      .select(graft.Graft.cents2(org.apache.spark.sql.functions.col("v")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === cents, "cents2 round-trip")
  }

  test("PROP: native point constructor and distance match the JTS path bit-for-bit") {
    samples(Gen.zip(coord, coord, coord, coord)).foreach { case (x1, y1, x2, y2) =>
      val a = graft.functions.StMakePoint.make(x1, y1)
      val b = graft.functions.StMakePoint.make(x2, y2)
      assert(a.toSeq === stPointF(x1, y1).toSeq, "WKB bytes must match the JTS writer")
      val d = graft.functions.WkbDistance.dist(a, b)
      // the fast path IS the oracle's formula, bit-for-bit
      val dx = x1 - x2; val dy = y1 - y2
      assert(d === math.sqrt(dx * dx + dy * dy), "fast path == sqrt formula")
      // JTS computes point distance with different rounding in the last
      // ulps (both engines round(,6) before any oracle compare)
      val jts = stDistanceF(a, b).doubleValue
      assert(math.abs(d - jts) <= math.max(1e-300, jts * 1e-12), "fast path ~ JTS")
      assert(graft.functions.WkbDistance.within(a, b, d * 1.0000001) === true)
      if (d > 0)
        assert(graft.functions.WkbDistance.within(a, b, d * 0.9999999) === false)
    }
  }

  test("PROP: packAsciiPrefix ordering and round-trip match the string prefix") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val asciiGen = for {
      n <- Gen.chooseNum(0, 20)
      cs <- Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar))
    } yield cs.mkString
    val strs = samples(asciiGen, 200).distinct
    val got = strs.toDF("s")
      .select(col("s"), Graft.packAsciiPrefix(col("s"), 8).as("p"))
      .select(col("s"), col("p"), Graft.unpackAsciiPrefix(col("p"), 8).as("u"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    got.foreach { case (s, _, u) => assert(u === s.take(8), s"round-trip of '$s'") }
    // order agreement: sorting by the packed long == sorting by the prefix,
    // so max(packed) selects the max prefix (the c27 rewrite's invariant)
    assert(got.sortBy(_._2).map(_._1.take(8)).toSeq ===
      got.map(_._1.take(8)).sorted.toSeq)
  }

  test("PROP: pack_upper_ascii8 is bit-identical to the composed chain on ASCII") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val asciiGen = for {
      n <- Gen.chooseNum(0, 20)
      cs <- Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar))
    } yield cs.mkString
    val strs = samples(asciiGen, 300).distinct
    val rows = strs.toDF("s")
      .select(col("s"),
        Graft.packUpperAsciiPrefix8(col("s")).as("fused"),
        Graft.packAsciiPrefix(upper(substring(col("s"), 1, 8)), 8).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"NULL on ASCII '${r.getString(0)}'")
      assert(r.getLong(1) === r.getLong(2), s"parity on '${r.getString(0)}'")
    }
    // the wider fail-loudly envelope: non-ASCII ANYWHERE in the 8-byte
    // prefix -> NULL from the fused form (the composed chain NULLs only on
    // a post-upper non-ASCII LEAD byte — e.g. the 'ab<e-acute>' case below
    // packs bytes there but refuses here, by design)
    val hostile = Seq("éabc", "abécd", "abcdefgé", "abcdefghé")
    val hv = hostile.toDF("s")
      .select(Graft.packUpperAsciiPrefix8(col("s")).as("p")).collect()
    assert(hv(0).isNullAt(0) && hv(1).isNullAt(0) && hv(2).isNullAt(0),
      "non-ASCII inside the prefix must NULL")
    assert(!hv(3).isNullAt(0), "non-ASCII past byte 8 is outside the pack")
  }

  test("PROP: hash sampling variants select ~the declared rate, deterministically") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = (1L to 20000L).toDF("id")
    // production path: xxhash64 → [0,1) threshold
    val keptXx = ids.filter(Graft.hashSampleFilter(col("id"), 0.1))
      .collect().map(_.getLong(0)).toSet
    // oracle-paired path (e16's shape): md5 hex prefix compare, '1a' ≈ 26/256
    val keptMd5 = ids
      .filter(md5(col("id").cast("string").cast("binary")) < "1a")
      .collect().map(_.getLong(0)).toSet
    // rate tolerance: binomial sd at n=20k, p≈0.1 is ~0.2pp; allow 5 sd
    assert(math.abs(keptXx.size / 20000.0 - 0.1) < 0.011, s"xx rate ${keptXx.size}")
    assert(math.abs(keptMd5.size / 20000.0 - 26.0 / 256) < 0.011, s"md5 rate ${keptMd5.size}")
    // determinism: same predicate over a reshuffled layout selects the SAME set
    val keptXx2 = ids.repartition(7, col("id"))
      .filter(Graft.hashSampleFilter(col("id"), 0.1))
      .collect().map(_.getLong(0)).toSet
    assert(keptXx2 === keptXx)
    // composability: sampling the sample at a higher threshold is a superset-
    // stable refinement (rate-0.05 sample ⊂ rate-0.1 sample)
    val keptNarrow = ids.filter(Graft.hashSampleFilter(col("id"), 0.05))
      .collect().map(_.getLong(0)).toSet
    assert(keptNarrow.subsetOf(keptXx))
  }

  test("PROP: minhash signatures valid, deterministic; simhash symmetric") {
    samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 60).foreach { s =>
      val sig = minhash(s, 128, 5)
      assert(sig.length === 128)
      assert(sig.forall(v => v >= 0 && v < MersennePrime), s"range for '$s'")
      assert(sig.toSeq === minhash(s, 128, 5).toSeq, s"determinism for '$s'")
    }
    samples(Gen.zip(Gen.alphaStr, Gen.alphaStr), 60).foreach { case (a, b) =>
      assert(hamming64(simhash64(a), simhash64(b)) ===
        hamming64(simhash64(b), simhash64(a)))
      assert(hamming64(simhash64(a), simhash64(a)) === 0)
    }
  }
}
