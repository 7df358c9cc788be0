package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.Sessions

/** Streaming sessionization — the continuous form of
  * [[graft.functions.Sessions.sessionStats]]. The batch shape is already
  * a `session_window` grouping, so the streaming form IS the same plan
  * with an event-time watermark in front: Spark keeps per-(user, open
  * session) state, merges windows as events arrive, and in Append mode
  * emits a session exactly once — when the watermark passes its end
  * (last event + gap), i.e. the session can no longer grow.
  *
  * State discipline: state is one row per OPEN session per user, bounded
  * by the watermark horizon — not by stream length. Events later than
  * the watermark are dropped (standard contract); pick the watermark as
  * the max tolerated out-of-orderness, independent of the session gap.
  */
object StreamingSessions {

  /** Session-level rollup over a stream. Same output schema as the batch
    * [[Sessions.sessionStats]]; run with `OutputMode.Append`.
    */
  def sessionStats(stream: DataFrame, userCol: String, tsCol: String,
      gap: String, valueCol: String,
      watermark: String = "1 hour"): DataFrame =
    Sessions.sessionStats(
      stream.withWatermark(tsCol, watermark),
      userCol, tsCol, gap, valueCol)
}
