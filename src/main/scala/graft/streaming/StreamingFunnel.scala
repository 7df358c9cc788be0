package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the continuous form of
  * [[graft.functions.Sessions.funnel]], for live "how far did each user
  * get" dashboards over an event stream. Per-user custom state via
  * `flatMapGroupsWithState` (the one streaming shape the built-in
  * operators cannot express: the stage chain is an order-dependent fold,
  * not a windowed aggregation).
  *
  * Semantics match the batch operator under late data: every retained
  * candidate instant can still refine the chain (stage minima only move
  * earlier as stragglers arrive), so a user emits a NEW snapshot
  * whenever fresh events change what is known — including a late view
  * retroactively completing a click/purchase chain.
  *
  * State discipline (bounded by the watermark horizon, not stream
  * length): a stage instant older than the watermark is FINAL — no
  * event that could move it can arrive anymore — so its candidate list
  * drops entirely; for live stages, candidates at or before the
  * watermark can never exceed a future previous-stage instant (which is
  * necessarily >= the watermark) and candidates above the stage's
  * current instant can never become its minimum, so both are dropped.
  * What remains per stage is inside the out-of-orderness horizon.
  */
object StreamingFunnel {

  /** One per-user emission: `stage_micros` holds the confirmed chain
    * instants (epoch micros), length == `stages_completed`.
    */
  case class FunnelSnapshot(user_id: Long, stages_completed: Long,
      stage_micros: Seq[Long])

  /** finalized: immutable chain prefix; pending: candidate instants per
    * stage index (empty for finalized stages).
    */
  private[streaming] case class FunnelState(finalized: Seq[Long],
      pending: Seq[Seq[Long]])

  def funnelUpdates(stream: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      watermark: String = "10 minutes"): Dataset[FunnelSnapshot] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val spark = stream.sparkSession
    import spark.implicits._
    val n = stages.size
    val stageIdx = stages.zipWithIndex.toMap
    // the watermarked event-time column must flow INTO the stateful
    // operator unchanged (projecting it to a long would discard the
    // event-time metadata and getCurrentWatermarkMs would throw)
    val typed = stream
      .withWatermark(tsCol, watermark)
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).cast("long").as("_1"),
        col(typeCol).as("_2"), col(tsCol).as("_3"))
      .as[(Long, String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          val prev = state.getOption
            .getOrElse(FunnelState(Nil, Seq.fill(n)(Nil)))
          val pending = Array.tabulate(n)(i => prev.pending(i).toBuffer)
          events.foreach { case (_, t, ts) =>
            // epoch micros, same instant unix_micros computes
            val us = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
            val i = stageIdx(t)
            // events for already-final stages can no longer change them
            if (i >= prev.finalized.size) pending(i) += us
          }
          // recompute the live chain greedily above the finalized prefix
          val k0 = prev.finalized.size
          var prevT = prev.finalized.lastOption.getOrElse(Long.MinValue)
          val instants = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = k0
          var stop = false
          while (i < n && !stop) {
            val cand = pending(i).filter(_ > prevT)
            if (cand.isEmpty) stop = true
            else { prevT = cand.min; instants += prevT }
            i += 1
          }
          // finalize every leading instant the watermark has passed
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val nFinal = instants.takeWhile(_ < wmMicros).size
          val finalized = prev.finalized ++ instants.take(nFinal)
          val live = instants.drop(nFinal)
          // trim candidate lists to what can still matter (see scaladoc)
          val k = finalized.size
          val trimmed = Seq.tabulate(n) { j =>
            if (j < k) Seq.empty[Long]
            else {
              val lower =
                if (j == k) finalized.lastOption.getOrElse(Long.MinValue)
                else wmMicros max finalized.lastOption.getOrElse(Long.MinValue)
              val rel = j - k
              val upper =
                if (rel < live.size) live(rel) else Long.MaxValue
              pending(j).filter(t => t > lower && t <= upper)
                .distinct.sorted.toSeq
            }
          }
          state.update(FunnelState(finalized, trimmed))
          val chain = finalized ++ live
          Iterator.single(
            FunnelSnapshot(user, chain.size.toLong, chain.toSeq))
      }
  }
}
