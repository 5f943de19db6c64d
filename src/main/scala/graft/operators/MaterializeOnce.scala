package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-PRESERVING single-execution materialization for corpus-scale
  * intermediates (r19, VERDICT r18 item 3).
  *
  * `localCheckpoint` kills recompute but TRUNCATES lineage: on a real
  * cluster an executor loss makes the checkpoint blocks unrecoverable and
  * fails the query, and at 100 TB memory pressure forces the whole
  * materialized corpus onto executor-local disk with no way back. A
  * `persist(MEMORY_AND_DISK)` gives the same single-computation reuse while
  * keeping the plan recomputable (lost blocks rebuild from the parquet
  * scan) and letting the storage layer evict under pressure.
  *
  * Two disciplines make the swap honest and deterministic:
  *
  *  - **unpersist-first**: CacheManager keys entries by analyzed PLAN, so a
  *    re-execution of the same query (bench min-of-3, a sweep running the
  *    batch query and its streaming twin over the same fixture) would
  *    silently reuse the previous execution's buffers — result caching
  *    across runs, which the round rules forbid. Dropping any
  *    identical-plan entry at construction time guarantees every execution
  *    recomputes from its inputs.
  *  - **eager build**: the blocks materialize here, in one pass, exactly
  *    like the localCheckpoint they replace — not lazily inside whichever
  *    consumer happens to run first (two concurrent consumers would race
  *    and compute twice).
  *
  * Dimension/model-scale checkpoints (HITS score levels, n-gram model
  * tables, the PQ index) stay on `localCheckpoint` — tiny blocks, and the
  * truncation is what keeps their iterative plans from growing.
  *
  * WHERE THIS IS USED (r19 A/Bs, interleaved same-window pairs, tables in
  * OPTIMIZATION_r19.md): the IncrementalDedup signature tables
  * (fixed-width long-array payloads) measured equal-or-better under
  * persist and use this, gaining the recoverable lineage. The corpus-TEXT
  * materializations (e47 stripped/ld/survivors, d17
  * batchStripped/dfTable/index) measured 20-40% SLOWER under persist —
  * the InMemoryRelation columnar encode of long string columns is the
  * cost — and e02's signature table re-measured slower in full-session
  * context; those stay on localCheckpoint per the verdict's own decision
  * rule ("keep whichever is not slower").
  */
object MaterializeOnce {
  def apply(df: DataFrame): DataFrame = {
    df.unpersist(blocking = false)
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.queryExecution.toRdd.foreach(_ => ())
    df
  }
}
