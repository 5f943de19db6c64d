package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import scala.jdk.CollectionConverters._

/** operators.PointLookupWrite: the written files must actually carry the
  * two pruning structures the scaladoc claims — tight per-row-group
  * min/max intervals on the sort key, and parquet split-block Bloom
  * filters on the declared probe columns — verified at the parquet API
  * level (what any reader, not just Spark, sees in the footer), plus
  * row fidelity through a full read-back.
  */
class PointLookupWriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))

  test("range layout + blooms: footer stats tight, filters present and answering") {
    val out = "/tmp/graft_test/point_lookup"
    val df = spark.range(40000).toDF("id")
      .select(col("id"),
        sha2(col("id").cast("string").cast("binary"), 256).as("digest"),
        concat(lit("https://h"), pmod(col("id"), lit(97)),
          lit(".example.com/p/"), col("id")).as("url"))
    graft.operators.PointLookupWrite.write(df, out, sortCol = "url",
      bloomCols = Seq("digest"), files = 4, ndvPerGroup = 20000L)

    // read-back fidelity
    val back = spark.read.parquet(out)
    assert(back.count() === 40000)
    assert(back.agg(countDistinct(col("digest"))).collect()(0).getLong(0) === 40000)

    val conf = new Configuration()
    var groups = 0
    var bloomHits = 0
    var disjointOk = true
    var lastMax: String = null
    val presentDigest = df.filter(col("id") === 123)
      .select("digest").collect()(0).getString(0)
    var presentFound = false
    var absentHits = 0
    parquetFiles(out).sortBy(_.getName).foreach { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        r.getRowGroups.asScala.foreach { bd =>
          groups += 1
          val urlCol = bd.getColumns.asScala
            .find(_.getPath.toDotString == "url").get
          val st = urlCol.getStatistics
          // range layout: within a file, row-group url intervals must not
          // interleave (sorted write ⇒ monotone min/max chain)
          val mn = st.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8
          val mx = st.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8
          if (lastMax != null && mn < lastMax) disjointOk = false
          lastMax = mx
          val digCol = bd.getColumns.asScala
            .find(_.getPath.toDotString == "digest").get
          val bloom = r.getBloomFilterDataReader(bd).readBloomFilter(digCol)
          if (bloom != null) {
            bloomHits += 1
            if (bloom.findHash(bloom.hash(Binary.fromString(presentDigest))))
              presentFound = true
            if (bloom.findHash(bloom.hash(Binary.fromString(
                "0000000000000000000000000000000000000000000000000000000000000000"))))
              absentHits += 1
          }
        }
      } finally { r.close(); lastMax = null }
    }
    assert(groups >= 4, s"expected multiple row groups, got $groups")
    assert(bloomHits === groups, "every row group must carry a digest bloom filter")
    assert(presentFound, "a present digest must hit at least one row group's bloom")
    // an absent key may false-positive at the configured FPP, but filters
    // that hit in most groups are not discriminating
    assert(absentHits * 2 < groups,
      s"absent digest hit $absentHits of $groups blooms — filters not discriminating")
    assert(disjointOk, "url row-group intervals interleave — range layout broken")
  }
}
