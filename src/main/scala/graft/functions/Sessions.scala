package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of event streams — part of the LLM-pipeline
  * operator set (grouping interaction logs into conversations/visits
  * before per-session curation). The reference engine has no
  * sessionization; both shapes here are pure Catalyst plans.
  *
  * Scale notes (100 TB): each shape shuffles ONCE on the user key and
  * reuses that exchange for everything downstream — the running sum in
  * [[sessionize]] rides the same window, and the rollup in
  * [[sessionStats]] hash-aggregates on (user, window) which
  * HashPartitioning(user) already clusters, so EnsureRequirements
  * inserts no second exchange. Per-user event counts bound window-state
  * memory; a pathological single-user firehose would need a pre-split
  * (e.g. salting by day) layered on top.
  */
object Sessions {

  /** Per-event session assignment: `session_seq` starts at 1 for each
    * user's first event and increments whenever the gap since the
    * previous event EXCEEDS `gapMicros` — the same boundary rule as
    * Spark's built-in `session_window`, where a gap exactly equal to the
    * duration still merges (verified in SessionsSpec). `tieBreak`
    * columns make the within-user order total when timestamps collide,
    * keeping the numbering deterministic.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMicros: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapMicros > 0, "session gap must be positive")
    val order: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(w)
    val boundary = when(prev.isNull || micros - prev > gapMicros, 1L)
      .otherwise(0L)
    events.withColumn("session_seq",
      sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-level rollup via the built-in `session_window` grouping
    * (merge-on-overlap semantics; window end = last event + gap). The
    * same declarative shape runs under Structured Streaming with a
    * watermark — see [[graft.streaming.StreamingSessions]].
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gap: String, valueCol: String): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col(userCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
