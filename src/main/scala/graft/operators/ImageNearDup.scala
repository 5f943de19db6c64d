package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over 64-bit perceptual image hashes
  * ([[Multimodal.imageAHash64]]) — the image twin of the SimHash text
  * near-dup: pairs within a small hamming distance are re-encodes,
  * thumbnails, light edits, or brightness-shifted copies of one image.
  *
  * Scale shape (the whole point): the hash is banded into `maxDist + 1`
  * contiguous bit ranges and candidates come from an equi-join on
  * (band, band value). By pigeonhole this is LOSSLESS — a pair differing
  * in ≤ maxDist bits cannot differ in all maxDist+1 bands, so it shares
  * at least one full band key. No all-pairs comparison exists anywhere;
  * shuffle volume is (maxDist+1) light rows per image (id + two longs),
  * and each band bucket only holds images agreeing on ~64/(maxDist+1)
  * exact bits. The one inherent hot spot is n byte-identical images
  * sharing every band — n(n−1)/2 pairs is the OUTPUT size there, not a
  * generation artifact (exact-dedup first if that is a concern).
  */
object ImageNearDup {

  /** All unordered pairs (id1 < id2) whose hashes differ in at most
    * `maxDist` of 64 bits, with the exact distance attached.
    *
    * @param hashes  one row per image; `idCol` orderable and unique,
    *                `hashCol` a 64-bit hash as LongType (null-free —
    *                filter undecodable images upstream)
    * @return columns (id1, id2, hamming), hamming ≤ maxDist
    */
  def pairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in 0..63")
    val nBands = maxDist + 1
    val base = 64 / nBands
    val rem = 64 % nBands
    val widths = (0 until nBands).map(i => base + (if (i < rem) 1 else 0))
    val offs = widths.scanLeft(0)(_ + _)
    val bandCols: Seq[Column] = (0 until nBands).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      shiftright(col(hashCol), offs(i)).bitwiseAND(lit(mask))
    }
    // The 8-byte hash rides through the banded join (unlike the minhash
    // join, whose 128-long signatures re-attach by id after pair
    // generation — here the "signature" is one long, cheaper to carry
    // than to re-join).
    val bands = hashes.select(col(idCol).as("__id"), col(hashCol).as("__h"),
      posexplode(array(bandCols: _*)).as(Seq("__band", "__bkey")))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bkey") === col("b.__bkey") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
        col("a.__h").as("__h1"), col("b.__h").as("__h2"))
      .distinct() // a close pair matches in several bands
      .select(col("id1"), col("id2"),
        expr("CAST(bit_count(__h1 ^ __h2) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
