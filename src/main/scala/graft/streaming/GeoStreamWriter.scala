package graft.streaming

import graft.geo.GeoParquet
import org.apache.spark.sql.DataFrame

/** Streaming GeoParquet ingest (cross-block: D10 foreachBatch sink × A2
  * write-time footers): each micro-batch lands as a self-contained
  * GeoParquet dataset under `root/batch=<id>/` — every part file carries
  * the `geo` footer from its first write, batch directories are atomic
  * units for downstream readers, and re-running a batch id (checkpoint
  * replay after failure) overwrites idempotently rather than duplicating.
  *
  * Scale note: one directory per micro-batch is the standard streaming
  * lakehouse layout (compaction happens downstream); stats are computed
  * per batch over the batch only — bounded work per trigger.
  */
object GeoStreamWriter {

  /** foreachBatch hook: `.writeStream.foreachBatch(GeoStreamWriter.sink(root, "geometry"))`. */
  def sink(root: String, geometryColumn: String,
      crs: String = graft.geo.GeoParquetMetadata.DefaultCrs): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        GeoParquet.write(batch, s"$root/batch=$batchId", Seq(geometryColumn), crs = crs)

  /** Read the union of all written batches (plain read keeps pushdown). */
  def readAll(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/batch=*")
}
