package graft.operators

import graft.TextFunctions.{fnv1a64, splitmix64}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column processing (SURVEY.md §2 E12 / driver north star).
  *
  * Media travel as opaque `binary` columns with typed metadata. The
  * Spark-side plumbing — schemas, per-partition batch processing, column
  * wiring — is real and tested; the codec calls themselves are STUBS
  * (deterministic features derived from the content hash) because no
  * image/audio libraries ship in this environment. Swapping a stub for a
  * real decoder changes only the function body, not the pipeline shape.
  *
  * The batch API mirrors the `mapInPandas` pattern: `mapPartitions` walks
  * the iterator in bounded batches so a real decoder could amortize model
  * or codec initialization per batch instead of per row (the entire point
  * of batched UDFs at 100 TB).
  */
object Multimodal {

  val FeatureDim = 16

  /** STUB image decode: content bytes -> (width, height, channels,
    * features[16]). Deterministic in the content hash.
    */
  def decodeImageStub(content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = fnv1a64(new String(content.map(b => (b & 0x7f).toChar)))
    val w = 64 + (math.abs(h % 1024)).toInt
    val ht = 64 + (math.abs((h >> 10) % 1024)).toInt
    (w, ht, 3, featuresOf(h))
  }

  /** STUB audio decode: content bytes -> (sample_rate, n_samples,
    * mfcc-like features[16]). Deterministic in the content hash.
    */
  def decodeAudioStub(content: Array[Byte]): (Int, Long, Array[Float]) = {
    val h = fnv1a64(new String(content.map(b => (b & 0x7f).toChar)))
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    (rates(math.abs(h % rates.length).toInt),
      1000L + math.abs((h >> 8) % 1000000L), featuresOf(splitmix64(h)))
  }

  /** STUB frame sampler: n deterministic per-frame feature vectors. */
  def frameSampleStub(content: Array[Byte], n: Int): Array[Array[Float]] = {
    val h = fnv1a64(new String(content.map(b => (b & 0x7f).toChar)))
    Array.tabulate(n)(i => featuresOf(splitmix64(h + i)))
  }

  private def featuresOf(seed: Long): Array[Float] = {
    var s = seed
    Array.fill(FeatureDim) {
      s = splitmix64(s)
      ((s >>> 11).toDouble / (1L << 52).toDouble - 1.0).toFloat
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batched feature extraction over a binaryFile-shaped DataFrame
    * (`path`, `content`). One partition = a stream of bounded batches; the
    * per-batch hook is where a real pipeline would bind codec/model state.
    */
  def extractImageFeatures(binaryFiles: DataFrame, batchSize: Int = 64): DataFrame = {
    val input = binaryFiles.select(col("path"), col("content"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch init hook lives here (codec/model handle)
        batch.iterator.map { r =>
          val path = r.getString(0)
          val content = r.getAs[Array[Byte]](1)
          val (w, h, c, feats) = decodeImageStub(content)
          Row(path, content.length.toLong, w, h, c, feats.toSeq)
        }
      }
    }(RowEncoder.encoderFor(featureSchema))
  }
}
