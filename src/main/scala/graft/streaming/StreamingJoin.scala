package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time join — the continuous form of the batch
  * range join (`Joins.rangeJoin` / the range_join query): right-side
  * events that land within a horizon after their left-side anchor, both
  * sides unbounded streams. This is the built-in stream-stream inner
  * join surface: Spark buffers each side in state keyed by the join key
  * and the TIME-RANGE condition plus both watermarks bound that state —
  * a left row can be evicted once the right watermark passes
  * `left_ts + horizon`, a right row once the left watermark passes its
  * timestamp. Without the range condition state grows with the stream;
  * with it, state is (arrival rate × horizon) — the documented shape.
  *
  * Scale: the join shuffles both streams on the key column, exactly like
  * the batch equi-join; skewed keys salt upstream the same way.
  */
object StreamingJoin {

  /** Inner-join `right` rows onto `left` rows of the same `keyCol`
    * whose `rtsCol` lies in [ltsCol, ltsCol + horizon]. Column names of
    * the two sides must be disjoint apart from `keyCol`; both sides are
    * watermarked with `watermark` (the out-of-orderness allowance, also
    * the state-retention knob).
    */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
      ltsCol: String, rtsCol: String, horizon: String,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark)
    val r = right.withWatermark(rtsCol, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col(rtsCol) >= col(ltsCol) &&
        col(rtsCol) <= col(ltsCol) + expr(s"INTERVAL $horizon"))
      .drop(r(keyCol))
  }
}
