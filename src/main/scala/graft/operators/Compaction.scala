package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (lakehouse maintenance; the op every long-lived
  * 100 TB dataset needs after streaming/incremental ingestion): rewrite a
  * parquet directory into ~`targetBytes` files.
  *
  * At scale small files are a double tax — file-listing/footer overhead per
  * query, and scan tasks capped at one-per-file starve executor
  * parallelism planning. Compaction is a full rewrite of the affected
  * directory (by design: parquet files are immutable), sized from the
  * OBSERVED byte volume, not row counts — the repartition count is
  * `ceil(bytes / targetBytes)`.
  *
  * Swap protocol (same as GeoParquet's footer retrofit): write to a temp
  * sibling, VERIFY the row count matches, then backup-rename-swap — a crash
  * at any step leaves either the original or a consistent new copy, never a
  * half-written directory in place. Content equality beyond the count is
  * the caller's spec-level concern (CompactionSpec pins the canonical
  * dataset hash across the rewrite).
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)

    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(dir, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }

    val before = dataFiles(p)
    val bytes = before.map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    val src = spark.read.parquet(path)
    val expectedRows = src.count()
    val tmp = new Path(p.getParent, p.getName + "__compact_tmp")
    fs.delete(tmp, true)
    // repartition (round-robin) balances bytes across output files; a
    // sort-preserving compaction would use repartitionByRange + the
    // cluster key instead (Z-order variants live in GeoParquet.write)
    src.repartition(nFiles).write.parquet(tmp.toString)

    val gotRows = spark.read.parquet(tmp.toString).count()
    if (gotRows != expectedRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction row-count mismatch for $path: $expectedRows -> $gotRows; original left untouched")
    }

    val bak = new Path(p.getParent, p.getName + "__compact_bak")
    fs.delete(bak, true)
    if (!fs.rename(p, bak))
      throw new java.io.IOException(s"compaction: rename $p -> $bak failed")
    if (!fs.rename(tmp, p)) {
      // restore the original before failing
      fs.rename(bak, p)
      throw new java.io.IOException(s"compaction: rename $tmp -> $p failed; original restored")
    }
    fs.delete(bak, true)

    Report(before.length, dataFiles(p).length, bytes, expectedRows)
  }
}
