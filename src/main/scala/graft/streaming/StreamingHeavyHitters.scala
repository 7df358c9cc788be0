package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via the Space-Saving sketch (Metwally,
  * Agrawal, El Abbadi, "Efficient computation of frequent and top-k
  * elements in data streams"): a bounded table of `capacity` counters
  * that answers "what are the hottest keys right now" over an unbounded
  * stream — the live skew monitor of an ingest pipeline (hot documents,
  * hot shingles, hot user ids) and the trigger for the salting paths the
  * batch operators already expose.
  *
  * Guarantees (classic Space-Saving): every key with true frequency
  * > N/capacity is IN the table, and each entry's true count lies in
  * [count − err, count] — both observable in the emitted snapshot.
  *
  * Scale shape: state is `capacity` entries per group regardless of
  * stream length, and each batch's events collapse to per-key counts
  * before touching the sketch (one fold pass, no per-event evictions).
  * The stream shuffles on the GROUP key — a single global group is a
  * serial point by construction, so at cluster scale shard the sketch
  * (`groupCol` = a hash-mod stratum or a natural stratum) exactly like
  * any keyed aggregation and merge the per-shard tables downstream:
  * Space-Saving tables merge by entry-wise summation with the same
  * bounds.
  */
object StreamingHeavyHitters {

  /** One emitted table snapshot row: `count` is the sketch's (over-)
    * estimate, `err` its maximum overestimation — true frequency lies in
    * [count − err, count].
    */
  case class HeavyHitter(group: String, key: String, count: Long,
      err: Long, rank: Long)

  private[graft] case class SsEntry(key: String, count: Long, err: Long)

  /** Space-Saving merge of one batch's pre-aggregated (key, cnt) rows
    * into the bounded table; deterministic: batch rows fold in
    * (cnt desc, key) order, evictions always take the (count, key)-min
    * entry.
    */
  private[graft] def merge(table: Vector[SsEntry],
      batch: Seq[(String, Long)], capacity: Int): Vector[SsEntry] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    table.foreach(e => m(e.key) = (e.count, e.err))
    batch.sortBy { case (k, c) => (-c, k) }.foreach { case (k, c) =>
      m.get(k) match {
        case Some((cnt, err)) => m(k) = (cnt + c, err)
        case None if m.size < capacity => m(k) = (c, 0L)
        case None =>
          val (mk, (mc, _)) = m.minBy { case (kk, (cc, _)) => (cc, kk) }
          m.remove(mk)
          m(k) = (mc + c, mc)
      }
    }
    m.iterator.map { case (k, (c, e)) => SsEntry(k, c, e) }.toVector
  }

  /** Continuous top-`k` over `keyCol`, one Space-Saving table per
    * `groupCol` value (pass a literal column for one global table).
    * Emits the full ranked table per group per batch (Update mode).
    */
  def topK(stream: DataFrame, groupCol: org.apache.spark.sql.Column,
      keyCol: String, capacity: Int, k: Int): Dataset[HeavyHitter] = {
    require(capacity >= 1 && k >= 1 && k <= capacity,
      "need 1 <= k <= capacity")
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .select(groupCol.cast("string").as("_1"),
        col(keyCol).cast("string").as("_2"))
      .as[(String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Vector[SsEntry], HeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, String)],
            state: GroupState[Vector[SsEntry]]) =>
          // per-batch pre-aggregation: the sketch folds distinct keys,
          // not raw events
          val counts = scala.collection.mutable.HashMap.empty[String, Long]
          rows.foreach { case (_, key) =>
            counts(key) = counts.getOrElse(key, 0L) + 1L
          }
          val next = merge(state.getOption.getOrElse(Vector.empty),
            counts.toSeq, capacity)
          state.update(next)
          next.sortBy(e => (-e.count, e.key)).take(k).zipWithIndex
            .iterator.map { case (e, i) =>
              HeavyHitter(group, e.key, e.count, e.err, i + 1L)
            }
      }
  }
}
