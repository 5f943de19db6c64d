package graft.geo

import graft.GeoFunctions
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import scala.jdk.CollectionConverters._

/** GeoParquet I/O (SURVEY.md §2 A1/A2): parquet files whose footer carries
  * the `geo` JSON metadata and whose geometry columns are WKB bytes.
  *
  * Write path: one column-pruned aggregate over the input computes
  * per-column geometry types + bbox, then a single parallel write through
  * `GeoParquetFileFormat` puts the `geo` key in every part-file footer AS
  * IT IS WRITTEN (SURVEY §7 hard-part 1) — no second I/O pass. For
  * expensive or nondeterministic input plans, `statsFromWritten = true`
  * writes first, computes stats from the materialized files (so metadata
  * always describes the bytes on disk), and retrofits the footer via the
  * distributed byte-level rewrite (`injectFooterInto` — row-group copy,
  * no decode/re-encode).
  *
  * Read path: ordinary `spark.read.parquet` (vectorized reader, pushdown,
  * pruning all intact) + footer `geo` decode from the first part file,
  * re-attached as Spark column `Metadata` so downstream code can discover
  * geometry columns and CRS without re-reading footers.
  */
object GeoParquet {

  private val MetaKeyEncoding = "geo.encoding"
  private val MetaKeyCrs = "geo.crs"

  /** Column-metadata key surfacing the footer-declared 1.1 covering-column
    * name on the read DataFrame's schema (introspection parity with
    * encoding/CRS). Pruning itself does NOT depend on this key:
    * [[graft.plans.SpatialFilterRule]] resolves declarations from the
    * footer via [[cachedMetadata]], because predicate pushdown strips
    * column metadata off filter attributes before the rule runs.
    */
  private[graft] val MetaKeyCovering = "geo.covering"

  /** Footer metadata by dataset path, cached for the optimizer: the
    * spatial rule consults this on every plan with a spatial predicate
    * over a file scan, so the footer read must cost one I/O per DATASET,
    * not per query. Bounded by distinct dataset paths per JVM;
    * invalidated by the writers ([[write]], [[injectFooterInto]]).
    */
  private val metadataCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[GeoParquetMetadata]]()

  private[graft] def cachedMetadata(spark: SparkSession,
      path: String): Option[GeoParquetMetadata] =
    metadataCache.computeIfAbsent(path, p =>
      try readMetadata(spark, p)
      catch { case scala.util.control.NonFatal(_) => None })

  private def invalidateMetadata(path: String): Unit = {
    metadataCache.remove(path)
    // normalize trailing-slash and scheme-variant keys conservatively:
    // a different spelling of the same dataset path may sit in the cache
    val it = metadataCache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k.stripSuffix("/") == path.stripSuffix("/") ||
          k.endsWith(path.stripSuffix("/"))) it.remove()
    }
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val legacyBboxWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** @param statsFromWritten compute stats by re-reading the WRITTEN files
    *   instead of re-executing the input plan. Default false: the pre-write
    *   aggregate is a column-pruned pass over the input, the right trade
    *   when the input is a table scan (pruned re-read < full-output
    *   rewrite). Set true when the input plan is expensive (stats would
    *   re-run it) or nondeterministic (pre-write stats could describe a
    *   different execution than the written bytes — stale-metadata hazard);
    *   the footer then arrives via the byte-level retrofit pass.
    */
  /** @param spatialClusterFiles when set, rows are range-partitioned into
    *   this many files by the Z-order (Morton) value of their envelope
    *   midpoint before writing — spatially close rows land in the same
    *   file/row group, so each file's `__bbox_<col>` min/max statistics cover a
    *   TIGHT region and SpatialFilterRule's range predicates skip most row
    *   groups. Requires pre-write stats (the global envelope quantizes the
    *   curve).
    */
  def write(
      df: DataFrame,
      path: String,
      geometryColumns: Seq[String],
      crs: String = GeoParquetMetadata.DefaultCrs,
      computeStats: Boolean = true,
      addBboxColumn: Boolean = false,
      partitionBy: Seq[String] = Nil,
      statsFromWritten: Boolean = false,
      spatialClusterFiles: Option[Int] = None): Unit = {
    require(geometryColumns.nonEmpty, "at least one geometry column")
    require(spatialClusterFiles.isEmpty || (computeStats && !statsFromWritten),
      "spatial clustering needs pre-write stats (computeStats=true, statsFromWritten=false)")
    require(spatialClusterFiles.isEmpty || partitionBy.isEmpty,
      "spatial clustering and partitionBy together multiply to files-per-" +
        "partition-value × cluster files; choose one layout")
    require(spatialClusterFiles.isEmpty || !df.columns.contains("__z"),
      "input already has a __z column — spatial clustering reserves that name")
    // GeoParquet 1.1 covering-column pattern: a per-row envelope struct
    // whose parquet min/max stats let spatial filters skip row groups
    // (rewritten into range predicates by plans.SpatialFilterRule).
    // One covering column PER geometry column, name-bound as __bbox_<col>,
    // so multi-geometry datasets prune on whichever column a filter
    // references (the rule matches covering to predicate by name — a
    // single shared __bbox would wrongly constrain filters on the others).
    val out =
      if (addBboxColumn)
        geometryColumns.foldLeft(df)((d, c) =>
          d.withColumn(s"__bbox_$c", GeoFunctions.stEnvelopeStruct(col(c))))
      else df

    def statsOf(src: DataFrame): Map[String, GeoColumnMeta] = {
      val aggs = geometryColumns.flatMap { c =>
        val env = GeoFunctions.stEnvelopeStruct(col(c))
        Seq(
          sort_array(collect_set(GeoFunctions.st_geometrytype(col(c)))).as(s"${c}__types"),
          min(env.getField("xmin")).as(s"${c}__xmin"),
          min(env.getField("ymin")).as(s"${c}__ymin"),
          max(env.getField("xmax")).as(s"${c}__xmax"),
          max(env.getField("ymax")).as(s"${c}__ymax"))
      }
      // column-pruned: only the geometry columns reach the aggregate scan
      val row = src.select(geometryColumns.map(col): _*)
        .agg(aggs.head, aggs.tail: _*).collect()(0)
      geometryColumns.map { c =>
        // empty / all-null geometry column: min/max are null — omit the
        // bbox rather than fabricate [0,0,0,0] (getAs[Double] unboxes
        // null to 0.0)
        val bbox =
          if (row.isNullAt(row.fieldIndex(s"${c}__xmin"))) None
          else Some((row.getAs[Double](s"${c}__xmin"), row.getAs[Double](s"${c}__ymin"),
            row.getAs[Double](s"${c}__xmax"), row.getAs[Double](s"${c}__ymax")))
        c -> GeoColumnMeta(
          geometryTypes = row.getAs[scala.collection.Seq[String]](s"${c}__types").toSeq,
          crs = crs,
          bbox = bbox,
          // GeoParquet 1.1: declare the covering column we just added, so
          // readers (ours included) need not rely on the naming convention
          covering = if (addBboxColumn) Some(s"__bbox_$c") else None)
      }.toMap
    }
    def toJson(colMeta: Map[String, GeoColumnMeta]): String =
      GeoParquetMetadata(primaryColumn = geometryColumns.head, columns = colMeta).toJson

    def save(writer: org.apache.spark.sql.DataFrameWriter[Row]): Unit =
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .save(path)

    if (computeStats && statsFromWritten) {
      // write plain, then stats from the materialized bytes + retrofit
      save(out.write.mode("overwrite").format("parquet"))
      val written = df.sparkSession.read.parquet(path)
      injectFooterInto(df.sparkSession, path, toJson(statsOf(written)))
    } else if (spatialClusterFiles.isDefined) {
      // Clustered path: the input plan would otherwise execute three times
      // (stats aggregate, range-partitioner sampling, final write) — and a
      // nondeterministic plan could then write rows the footer bbox does
      // not cover. Persist pins ONE materialization for all three.
      val n = spatialClusterFiles.get
      val mat = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val colMeta = statsOf(mat)
        val bbox = colMeta(geometryColumns.head).bbox.getOrElse(
          throw new IllegalArgumentException(
            "spatial clustering: geometry column has no bbox (empty/all-null)"))
        val env = GeoFunctions.stEnvelopeStruct(col(geometryColumns.head))
        val cx = (env.getField("xmin") + env.getField("xmax")) / 2
        val cy = (env.getField("ymin") + env.getField("ymax")) / 2
        save(mat.withColumn("__z",
            graft.functions.ZOrder.zorder(cx, cy, bbox._1, bbox._2, bbox._3, bbox._4))
          .repartitionByRange(n, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode("overwrite").format("geoparquet")
          .option(GeoParquetFileFormat.FooterOption, toJson(colMeta)))
      } finally mat.unpersist()
    } else {
      val colMeta =
        if (!computeStats) geometryColumns.map(c => c -> GeoColumnMeta(crs = crs,
          covering = if (addBboxColumn) Some(s"__bbox_$c") else None)).toMap
        else statsOf(out)
      // Write-time footer injection: GeoParquetFileFormat's WriteSupport
      // adds the `geo` key as each part file closes — one parallel write,
      // no second I/O pass.
      save(out.write.mode("overwrite").format("geoparquet")
        .option(GeoParquetFileFormat.FooterOption, toJson(colMeta)))
    }
    invalidateMetadata(path)
  }

  /** Retrofit a `geo` footer onto an EXISTING parquet dataset without
    * rewriting data pages: distributed byte-level row-group copy per part
    * file (`ParquetFileWriter.appendFile` — no decode/re-encode).
    */
  def injectFooterInto(spark: SparkSession, path: String, geoJson: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = listParquetFiles(new Path(path), conf)
    spark.sparkContext.parallelize(parts, parts.length.max(1))
      .foreach(injectFooter(_, geoJson))
    invalidateMetadata(path)
  }

  /** Recursive listing — partitioned writes nest part files under
    * partition directories.
    */
  private def listParquetFiles(root: Path, conf: Configuration): Seq[String] = {
    val fs = root.getFileSystem(conf)
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath.toString
    }
    out.result()
  }

  /** Rewrite one parquet file with the `geo` footer key added (runs on an
    * executor; local Configuration suffices for file/hdfs URIs it carries).
    */
  private def injectFooter(file: String, geoJson: String): Unit = {
    val conf = new Configuration()
    val src = new Path(file)
    val tmp = new Path(file + ".geo.tmp")
    val bak = new Path(file + ".geo.bak")
    val fs = src.getFileSystem(conf)

    // Crash recovery for a task retry: tmp is only ever complete once src
    // has been renamed away (writer.end precedes the rename chain), so a
    // missing src with a tmp present means the previous attempt died between
    // its renames — finish the swap instead of re-reading the gone src.
    if (!fs.exists(src)) {
      if (fs.exists(tmp) && !fs.rename(tmp, src))
        throw new java.io.IOException(s"geoparquet footer rewrite: recovery rename $tmp -> $src failed")
      if (!fs.exists(src))
        throw new java.io.IOException(s"geoparquet footer rewrite: $src missing and no recoverable tmp")
      fs.delete(bak, false)
      return
    }

    val in = HadoopInputFile.fromPath(src, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, kv) = try {
      val fmd = reader.getFooter.getFileMetaData
      (fmd.getSchema, new java.util.HashMap[String, String](fmd.getKeyValueMetaData))
    } finally reader.close()
    // idempotence: a retry after a completed rewrite must not rewrite again
    if (geoJson == kv.get(GeoParquetMetadata.FooterKey)) {
      fs.delete(bak, false); fs.delete(tmp, false)
      return
    }
    kv.put(GeoParquetMetadata.FooterKey, geoJson)

    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024, 8 * 1024 * 1024)
    writer.start()
    writer.appendFile(in)
    writer.end(kv)

    // tmp is fully written before src is touched; the src copy survives as
    // .geo.bak until the swap completes (rename is atomic on HDFS/posix),
    // so no crash point loses the only copy of the part file.
    fs.delete(bak, false)
    if (!fs.rename(src, bak))
      throw new java.io.IOException(s"geoparquet footer rewrite: rename $src -> $bak failed")
    if (!fs.rename(tmp, src))
      throw new java.io.IOException(s"geoparquet footer rewrite: rename $tmp -> $src failed")
    fs.delete(bak, false)
  }

  /** Read a GeoParquet dataset; geometry columns keep their WKB binary form
    * and gain Spark column Metadata with encoding + CRS.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    readMetadata(spark, path) match {
      case None => df
      case Some(geo) =>
        val withMeta = geo.columns.foldLeft(df) { case (d, (name, cm)) =>
          if (!d.columns.contains(name)) d
          else {
            val mb = new MetadataBuilder()
              .putString(MetaKeyEncoding, cm.encoding)
              .putString(MetaKeyCrs, cm.crs)
            // only a covering column that actually exists may prune
            cm.covering.filter(d.columns.contains)
              .foreach(mb.putString(MetaKeyCovering, _))
            d.withMetadata(name, mb.build())
          }
        }
        // NOTE: covering columns are per-geometry-column (`__bbox_<col>`,
        // written by `write(addBboxColumn = true)`); SpatialFilterRule
        // resolves them by name against the attribute a predicate tests. A
        // pre-multi-covering dataset carrying a bare `__bbox` column gets
        // no automatic pruning (an alias-rename here would sit in a Project
        // the optimizer prunes away before the rule runs) — rewrite such
        // datasets once with the current writer. Silent pruning loss is a
        // scale surprise, so surface it once per JVM at read time.
        if (df.columns.contains("__bbox") && legacyBboxWarned.compareAndSet(false, true))
          log.warn(s"GeoParquet dataset at $path carries a legacy bare '__bbox' covering " +
            "column; spatial row-group pruning now binds per-column '__bbox_<col>' names " +
            "and will NOT use it. Rewrite the dataset once with GeoParquet.write(..., " +
            "addBboxColumn = true) to restore pruning.")
        withMeta
    }
  }

  /** Decode the `geo` footer metadata of a dataset (first part file). */
  def readMetadata(spark: SparkSession, path: String): Option[GeoParquetMetadata] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val first = (if (fs.getFileStatus(p).isDirectory)
      listParquetFiles(p, conf).sorted.headOption.map(new Path(_))
    else Some(p))
    first.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        Option(reader.getFooter.getFileMetaData.getKeyValueMetaData
          .get(GeoParquetMetadata.FooterKey))
          .map(GeoParquetMetadata.fromJson)
      } finally reader.close()
    }
  }

  /** `df.writeGeoParquet(path, "geometry")` / `GeoParquet.read` sugar. */
  implicit class GeoDataFrameOps(private val df: DataFrame) extends AnyVal {
    def writeGeoParquet(path: String, geometryColumn: String = "geometry",
        crs: String = GeoParquetMetadata.DefaultCrs): Unit =
      GeoParquet.write(df, path, Seq(geometryColumn), crs)
  }
}
