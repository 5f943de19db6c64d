package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WET-style conversion export — the WRITE side of the WARC family (the
  * read sides are e44/e44b/e51). CommonCrawl's text derivative ships as
  * WARC `conversion` records (public formats: ISO 28500 WARC 1.0; the
  * CommonCrawl WET convention of one conversion record per page); a
  * curation pipeline that filters a crawl re-emits the survivors in the
  * same container so downstream consumers need no new reader. This
  * operator turns a DataFrame of finished record strings into bucketed
  * WARC files.
  *
  * Shape at 100 TB: identical to the TarShards writer — one shuffle to
  * co-locate a bucket's records, then each task STREAMS its sorted
  * partition to disk, rolling to a new file whenever the bucket key
  * changes (keys are contiguous after the sort). Memory is bounded by
  * one record; bucket assignment is a deterministic function of the
  * record key, so re-runs overwrite byte-identical files (no sampled
  * range boundaries, no wall-clock in the output). A production variant
  * rolls past a size budget and targets object storage — the framing is
  * unchanged by either.
  */
object WetExport {

  /** Write `recs` — (`bucket` LONG, `key` LONG, `rec` STRING, one
    * finished WARC record per row, CRLF framing included) — as
    * `<prefix><bucket>.warc` files under `outDir`, records in `key`
    * order within each file.
    */
  def writeRecords(recs: DataFrame, outDir: String, prefix: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val nBuckets = 8 // shuffle width; files roll per DISTINCT bucket key
    recs.select(col("bucket"), col("key"), col("rec"))
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("key"))
      .foreachPartition { (rows: Iterator[Row]) =>
        var cur = Long.MinValue
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val bucket = r.getLong(0)
            if (bucket != cur || out == null) {
              close()
              cur = bucket
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                s"$outDir/$prefix$bucket.warc"))
            }
            out.write(r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        } finally close()
      }
  }
}
