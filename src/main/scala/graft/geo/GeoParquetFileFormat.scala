package graft.geo

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.io.api.RecordConsumer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType

/** Write-time GeoParquet footer injection (SURVEY.md §2 A2, §7 hard-part 1).
  *
  * A thin FileFormat over Spark's stock ParquetFileFormat whose only change
  * is the task-side WriteSupport: every part file's footer carries the `geo`
  * key from the FIRST write — no second byte-level rewrite pass. At 100 TB
  * the round-1 rewrite path (write, then re-read + re-write every part file
  * to append one footer key) doubles write I/O; this makes the footer free.
  *
  * The read path is inherited untouched: vectorized reader, pushdown,
  * pruning — a `geo`-keyed footer is ordinary parquet metadata.
  *
  * Usage (what GeoParquet.write does):
  * {{{
  *   df.write.format("geoparquet").option(GeoParquetFileFormat.FooterOption, geoJson).save(path)
  * }}}
  */
class GeoParquetFileFormat extends ParquetFileFormat with DataSourceRegister {

  override def shortName(): String = "geoparquet"

  override def toString: String = "GeoParquet"

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    val conf = job.getConfiguration
    options.get(GeoParquetFileFormat.FooterOption).foreach { geoJson =>
      conf.set(GeoParquetFileFormat.FooterConfKey, geoJson)
      // swap Spark's WriteSupport for the delegating one below; it is
      // instantiated task-side by ParquetOutputFormat from this conf key
      conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
        classOf[GeoParquetWriteSupport].getName)
    }
    factory
  }
}

object GeoParquetFileFormat {
  /** Writer option carrying the ready-made `geo` JSON document. */
  val FooterOption = "graft.geo.footer"
  /** Hadoop-conf relay of the option to task-side WriteSupport instances. */
  val FooterConfKey = "graft.geo.footer"
}

/** Spark's ParquetWriteSupport plus one extra footer key: delegates row
  * writing wholesale and only widens the file-level extra metadata that
  * `init` contributes (parquet-java merges it into the footer at close).
  */
class GeoParquetWriteSupport extends WriteSupport[InternalRow] {
  private val delegate = new ParquetWriteSupport

  override def init(configuration: Configuration): WriteSupport.WriteContext = {
    val ctx = delegate.init(configuration)
    val extra = new java.util.HashMap[String, String](ctx.getExtraMetaData)
    Option(configuration.get(GeoParquetFileFormat.FooterConfKey)).foreach {
      extra.put(GeoParquetMetadata.FooterKey, _)
    }
    new WriteSupport.WriteContext(ctx.getSchema, extra)
  }

  override def prepareForWrite(recordConsumer: RecordConsumer): Unit =
    delegate.prepareForWrite(recordConsumer)

  override def write(record: InternalRow): Unit = delegate.write(record)
}
