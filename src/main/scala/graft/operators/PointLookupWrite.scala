package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Point-lookup-optimized parquet layout: the at-rest form of a
  * petabyte-scale lookup index (a CDX archive index probed by URL, a
  * dedup digest index probed by hash). Two pruning mechanisms compose,
  * both read back by ANY stock parquet reader — this is layout, not a
  * private format:
  *
  *  1. RANGE LAYOUT on the lookup key: `repartitionByRange` +
  *     `sortWithinPartitions` makes every row group's min/max statistics
  *     a tight key interval, so a point predicate prunes to ~one row
  *     group by footer statistics alone;
  *  2. PARQUET COLUMN BLOOM FILTERS (parquet-format §BloomFilter,
  *     split-block; `parquet.bloom.filter.enabled#<col>`): inside the
  *     surviving row group — or for ADDITIONAL probe columns that do not
  *     share the sort order (the CDX digest column while the layout is
  *     keyed by SURT url) — a per-row-group filter answers "key absent"
  *     without decoding the page data. A miss costs one bitset probe
  *     instead of a column scan; false positives only cost the scan that
  *     a filterless layout would always pay.
  *
  * At 100 TB the composition is the difference between a point lookup
  * touching ~one row group and touching every file: min/max prunes the
  * key dimension, blooms prune the non-key probes — and both live in the
  * standard footer, so the 1000-executor reader needs no side index.
  *
  * `ndv` sizes the filters (bits ∝ distinct values per row group at the
  * default 1% FPP); `rowGroupBytes` bounds row-group size so pruning
  * granularity tracks the cluster's task granularity.
  */
object PointLookupWrite {

  def write(df: DataFrame, path: String, sortCol: String,
      bloomCols: Seq[String], files: Int = 4,
      ndvPerGroup: Long = 100000L, rowGroupBytes: Long = 8L * 1024 * 1024): Unit = {
    val w0 = df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes.toString)
    val withBlooms = bloomCols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndvPerGroup.toString)
    }
    withBlooms.parquet(path)
  }
}
