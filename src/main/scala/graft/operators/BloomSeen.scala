package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter URL-seen test — the frontier membership check a crawler
  * runs on every extracted link (Bloom 1970, CACM 13(7); the classic
  * crawl-frontier application is Broder & Mitzenmacher, "Network
  * Applications of Bloom Filters", Internet Mathematics 2004). The
  * filter answers "maybe seen" / "definitely new": false positives
  * (a new URL wrongly skipped) trade against memory; false negatives
  * never happen, so nothing is fetched twice.
  *
  * DETERMINISTIC by construction: bit positions are md5-hex substrings
  * of the URL — `k` chunks of `hexChars` hex digits each, an injective
  * map onto `m = 16^hexChars` bit addresses — so an independent engine
  * can re-derive every verdict from the same md5 arithmetic (the e16
  * engine-neutral-hash precedent), INCLUDING which URLs false-positive.
  * The bitmap is a plain OR-monoid: the build is one partial+final
  * aggregate with FIXED-SIZE state (m/8 bytes), independent of how many
  * URLs feed it — that is the whole point of the structure, and exactly
  * the c09-bitmap trade done right (state sized by CONFIG, not by a
  * data-dependent key domain).
  *
  * Two deployment shapes:
  *
  *  - [[globalFilter]]: ONE m-bit filter for the whole seen set, carried
  *    to the probe side as a 1-row broadcast (no driver collect, no
  *    size-estimation risk). Right when m sized for the corpus FP target
  *    still fits a broadcast — up to a few hundred MB.
  *  - [[perKeyFilter]]: one m-bit filter PER KEY (host/shard), built by
  *    the same aggregate grouped on the key and delivered to candidates
  *    by an equi-join on the key. This is the 10-billion-URL form: state
  *    is m bits × live hosts, sharded across the cluster by the join,
  *    never resident in one place; a candidate whose host has no filter
  *    is definitely new (NULL bitmap → false).
  *
  * Both emit the input columns plus `maybe_seen`. Verdict probing is
  * pure column algebra (array index + variable shiftright), codegen'd —
  * no UDF.
  */
object BloomSeen {

  /** OR-monoid bitmap aggregator: input = the k bit positions of one
    * URL, buffer = m bits as m/64 longs. Commutative, associative,
    * fixed-size state — and MUTATED IN PLACE: the buffer is a primitive
    * long array held as an object between rows (ObjectHashAggregate),
    * so each URL costs k bit-sets, not an O(m) buffer copy; only the
    * partial→final exchange serializes the m/8 bytes, once per task.
    */
  final class BloomAgg(words: Int) extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], ps: Seq[Int]): Array[Long] = {
      ps.foreach { p => b(p >> 6) |= 1L << (p & 63) }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Position i (0-based chunk of the md5 hex) as an int column in
    * [0, 16^hexChars).
    */
  private def position(url: Column, i: Int, hexChars: Int): Column =
    conv(substring(md5(url.cast("binary")), i * hexChars + 1, hexChars),
      16, 10).cast("int")

  /** All k positions as one array column (the aggregator's input row). */
  def positions(url: Column, k: Int, hexChars: Int): Column =
    array((0 until k).map(i => position(url, i, hexChars)): _*)

  /** `maybe_seen` verdict for `url` against bitmap column `bm`
    * (array<bigint>, m/64 longs). NULL bitmap → false (no filter for
    * this key = definitely new).
    */
  def maybeSeen(bm: Column, url: Column, k: Int, hexChars: Int): Column = {
    val tests = (0 until k).map { i =>
      val p = position(url, i, hexChars)
      call_function("shiftright",
        element_at(bm, (p / 64).cast("int") + 1), p % 64)
        .bitwiseAND(lit(1L)) === 1L
    }
    coalesce(tests.reduce(_ && _), lit(false))
  }

  private def agg(k: Int, hexChars: Int) = {
    val words = math.max(1, (1 << (4 * hexChars)) / 64)
    require(4 * hexChars <= 30, s"m=16^$hexChars exceeds Int addressing")
    udaf(new BloomAgg(words))
  }

  /** The global m-bit filter over `seen(urlCol)` as a 1-row DataFrame
    * (column `__bm`, array<bigint>) — the build side alone, for callers
    * that persist it as a static artifact (d19's streaming probe).
    */
  def bitmap(seen: DataFrame, urlCol: String,
      k: Int = 3, hexChars: Int = 3): DataFrame =
    seen.select(positions(col(urlCol), k, hexChars).as("__ps"))
      .agg(agg(k, hexChars)(col("__ps")).as("__bm"))

  /** One filter over all of `seen(urlCol)`; `candidates` gains
    * `maybe_seen`. The bitmap travels as a 1-row broadcast cross join.
    */
  def globalFilter(seen: DataFrame, candidates: DataFrame, urlCol: String,
      k: Int = 3, hexChars: Int = 3): DataFrame =
    candidates.crossJoin(broadcast(bitmap(seen, urlCol, k, hexChars)))
      .withColumn("maybe_seen", maybeSeen(col("__bm"), col(urlCol), k, hexChars))
      .drop("__bm")

  /** One filter per `keyCol` group (host sharding); candidates join on
    * the key — the distributed form whose total state scales with live
    * keys, not URLs seen.
    */
  def perKeyFilter(seen: DataFrame, candidates: DataFrame, keyCol: String,
      urlCol: String, k: Int = 3, hexChars: Int = 2): DataFrame = {
    val blooms = seen
      .select(col(keyCol), positions(col(urlCol), k, hexChars).as("__ps"))
      .groupBy(col(keyCol))
      .agg(agg(k, hexChars)(col("__ps")).as("__bm"))
    candidates.join(blooms, Seq(keyCol), "left")
      .withColumn("maybe_seen", maybeSeen(col("__bm"), col(urlCol), k, hexChars))
      .drop("__bm")
  }
}
