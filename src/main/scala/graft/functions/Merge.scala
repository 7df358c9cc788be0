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
    val s = snapshot.as("s")
    val c = changes.as("c")
    val cond = keyCols.map(k => col(s"s.$k") <=> col(s"c.$k")).reduce(_ && _)
    val applied = keyCols.map(k =>
      coalesce(col(s"s.$k"), col(s"c.$k")).as(k)) ++
      payload.map { p =>
        if (chCols.contains(p))
          when(col(s"c.$opCol") === "upsert", col(s"c.$p"))
            .otherwise(col(s"s.$p")).as(p)
        else col(s"s.$p").as(p)
      }
    s.join(c, cond, "full_outer")
      .filter(!(col(s"c.$opCol") <=> lit("delete")))
      .select(applied: _*)
  }
}
