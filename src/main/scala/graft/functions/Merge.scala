package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — apply a changeset (upserts + deletes) to a keyed
  * snapshot, producing the next snapshot: the Delta-style `MERGE INTO`
  * semantics as a plain dataflow operator over parquet-shaped tables.
  * The companion of the diff engine: diff detects divergence,
  * [[Merge.applyChangeset]] (like `DiffEngine`'s repair path) closes it.
  */
object Merge {

  /** Apply `changes` to `snapshot` keyed by `keyCols`. The changeset
    * carries the same payload columns as the snapshot plus `opCol` ∈
    * {"upsert", "delete"}, at most one row per key:
    *
    *  - `upsert`, key present  → payload REPLACED by the change row
    *    (standard MERGE SET semantics — change values win even when
    *    NULL, so a null-out is expressible)
    *  - `upsert`, key absent   → row inserted
    *  - `delete`, key present  → row dropped
    *  - `delete`, key absent   → no-op
    *
    * Scale shape: ONE full-outer shuffle join on the key — identical to
    * the diff engine's O4 merge join; both sides partial-shuffle on the
    * same key, no broadcast of the (corpus-sized) changeset, and the
    * op CASE folds into the join's projection. Snapshot columns absent
    * from the changeset pass through untouched.
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(changes.columns.contains(opCol), s"changes must carry '$opCol'")
    val payload = snapshot.columns.filterNot(keyCols.contains)
    val chCols = changes.columns.toSet
    // RENAME the changeset side up front instead of relying on dataset
    // aliases: a changeset routinely derives from the snapshot itself
    // (e.g. the diff-repair loop), and alias resolution on shared
    // lineage silently mis-binds the join condition (every row
    // unmatched → duplicated output). Unique names are robust.
    val c = changes.select(changes.columns.map(n => col(n).as(s"__c_$n")): _*)
    val cond = keyCols.map(k => col(k) <=> col(s"__c_$k")).reduce(_ && _)
    val cOp = col(s"__c_$opCol")
    val applied = keyCols.map(k => coalesce(col(k), col(s"__c_$k")).as(k)) ++
      payload.map { p =>
        if (chCols.contains(p))
          when(cOp === "upsert", col(s"__c_$p")).otherwise(col(p)).as(p)
        else col(p)
      }
    snapshot.join(c, cond, "full_outer")
      .filter(!(cOp <=> lit("delete")))
      .select(applied: _*)
  }
}
