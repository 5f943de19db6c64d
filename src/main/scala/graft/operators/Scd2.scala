package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 build: fold a keyed change log
  * (upserts + deletes, one `version` per change) into full history rows —
  * each attribute state carries [valid_from, valid_to) and an is_current
  * flag. This is the other half of MergeInto: MERGE keeps only the latest
  * state; SCD2 keeps every state with its validity interval, which is what
  * a warehouse dimension (or a training-data snapshot audit) actually
  * stores.
  *
  * Shape chosen for scale:
  *  - ONE window over (key ORDER BY version) computes each row's closing
  *    version via `lead` — per-key state is the key's change count
  *    (dimension keys see a handful of changes, never corpus-scale
  *    groups), and the shuffle is the same key-hash shuffle any
  *    per-key fold needs;
  *  - delete changes CLOSE the preceding interval but emit no row of
  *    their own (filtered after the window — they must participate in
  *    `lead` first, which is why the filter sits above the window);
  *  - is_current = interval never closed (valid_to IS NULL).
  *
  * Precondition (shared with MergeInto): `version` strictly monotonic per
  * key.
  */
object Scd2 {

  /** @param changes    key + payload columns + `version` + `deleteFlag`
    * @param key        equality key column name
    * @param version    per-key ordering column
    * @param deleteFlag boolean column: true = the key is deleted at this
    *                   version (closes history; no new interval opens)
    * @return one row per non-delete change: key, payload...,
    *         valid_from (= its version), valid_to (= next change's
    *         version, null if none), is_current
    */
  def build(changes: DataFrame, key: String, version: String,
      deleteFlag: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(version))
    changes
      .withColumn("valid_to", lead(col(version), 1).over(w))
      // NULL deleteFlag = upsert (a change row without an explicit delete
      // marker must open an interval, not vanish through three-valued
      // logic — ADVICE r7)
      .filter(!coalesce(col(deleteFlag), lit(false)))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(version, "valid_from")
      .drop(deleteFlag)
  }
}
