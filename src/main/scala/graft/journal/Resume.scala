package graft.journal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O12: checkpoint/resume. The reference journals `last_token` per
  * (split, table) and, on re-run, skips finished splits
  * (`lastToken == split.end`) and restarts in-progress ones from
  * `last_token` (Differ.java:153-171, 262-285; JobMetadataDb.java:182-217).
  *
  * Our granularity is the journal bucket: `task_status` holds one row per
  * (table_name, bucket) with `status` ∈ {done, in_progress} and the
  * highest completed token (`last_token`). Resume is an anti-join of the
  * work-set against completed buckets plus a watermark filter inside
  * in-progress buckets — no driver-side loops, prunes at the scan when
  * the work-set is bucket-partitioned.
  */
object Resume {

  val StatusDone = "done"
  val StatusInProgress = "in_progress"

  /** Filter a keyed frame (must carry `token` and `bucket` columns) down
    * to the partitions still needing comparison given a journal state.
    *
    * @param journal rows (bucket, status, last_token)
    * @param rerun   the reference's `isRerun`: when true, done buckets are
    *                re-compared too (error re-runs, Differ.java:166-171)
    */
  def pending(work: DataFrame, journal: DataFrame, rerun: Boolean = false,
      tokenCol: String = "token", bucketCol: String = "bucket"): DataFrame = {
    if (rerun) return work
    val j = journal.select(
      col("bucket").as("__j_bucket"),
      col("status").as("__j_status"),
      col("last_token").as("__j_last_token"))
    work
      .join(j, work(bucketCol) === col("__j_bucket"), "left_outer")
      .filter(
        col("__j_status").isNull ||                       // untouched bucket
        (col("__j_status") === StatusInProgress &&        // mid-bucket watermark
          (col("__j_last_token").isNull || col(tokenCol) > col("__j_last_token"))))
      .drop("__j_bucket", "__j_status", "__j_last_token")
  }
}
