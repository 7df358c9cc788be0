package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count via the same pinned HyperLogLog as the
  * batch side ([[graft.functions.Cardinality]]): per group, state is a
  * fixed 2^p-byte register array, each batch folds its values in with
  * elementwise max, and the emitted estimate is IDENTICAL to running
  * the batch sketch over everything seen so far — the mergeability law
  * as a streaming invariant, spec-asserted against `Cardinality.hllNdv`
  * bit for bit.
  *
  * This is the live "how many distinct users/documents has this
  * source produced" monitor: exact distinct over an unbounded stream
  * needs unbounded state; the sketch needs 2^p bytes per group,
  * forever, with the standard 1.04/√m error.
  *
  * Scale shape: state per group is constant-size; each batch's rows
  * collapse to register maxima BEFORE touching state (one fold pass).
  * The stream shuffles on the group key — shard a hot group with a
  * hash-mod stratum column and max-merge the per-shard registers
  * downstream, exactly like the batch union estimate.
  */
object StreamingCardinality {

  /** One emitted snapshot row per group per batch: `n_regs` occupied
    * registers, `hll_ndv` the running estimate over everything seen.
    */
  case class NdvSnapshot(group: String, n_regs: Int, hll_ndv: Double)

  /** The batch-identical hash/rho register update: md5-60-bit of the
    * value string (the engine-portable [[graft.functions.Sampling
    * .keyHash60]] convention), low p bits index the register, rho =
    * leading zeros of the remaining 60−p bits + 1.
    *
    * NULL values mirror the batch sketch's PHANTOM REGISTER exactly:
    * batch-side, `md5(CAST(NULL AS STRING))` yields a null bucket row
    * that [[graft.functions.Cardinality.hllEstimate]] COUNTS as occupied
    * (`count(lit(1))`) while contributing nothing to the harmonic sum
    * (`sum` skips the null shift) — i.e. one empty register's 2^s term
    * drops. Streaming state reserves byte m for that flag, so snapshots
    * stay bit-identical to the batch sketch on null-bearing corpora
    * instead of NPE-ing the query.
    */
  private[graft] def foldInto(regs: Array[Byte], value: String,
      p: Int): Unit = {
    if (value == null) { regs(1 << p) = 1; return }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(value.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16) // 60-bit nonnegative
    val m = 1 << p
    val bits = 60 - p
    val b = (h % m).toInt
    val w = h >>> p
    val rho =
      if (w == 0L) bits + 1
      else bits - (63 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(b)) regs(b) = rho.toByte
  }

  private[graft] def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val s = 60 - p + 1
    // exact long harmonic sum (max 2^p · 2^s < 2^63), then ONE double
    // division — the identical dag the batch estimator runs, so the
    // streaming snapshot equals Cardinality.hllNdv bit for bit
    var z = 0L
    var i = 0
    while (i < m) {
      z += 1L << (s - regs(i)) // empty register: rho 0 → 2^s
      i += 1
    }
    // the null phantom register (batch: occupied, zero harmonic term):
    // remove exactly one empty register's 2^s contribution
    if (regs.length > m && regs(m) != 0) z -= 1L << s
    graft.functions.Cardinality.estimatorConst(p) / z.toDouble
  }

  /** Continuous distinct-`valueCol` estimate per `groupCol` (Update
    * mode, one snapshot per group per batch).
    */
  def distinctByKey(stream: DataFrame, groupCol: String, valueCol: String,
      p: Int = 8): Dataset[NdvSnapshot] = {
    require(p >= 4 && p <= 16, "need 4 <= p <= 16")
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .select(col(groupCol).cast("string").as("_1"),
        col(valueCol).cast("string").as("_2"))
      .as[(String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], NdvSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, String)],
            state: GroupState[Array[Byte]]) =>
          // byte m is the null phantom-register flag (see foldInto). A
          // checkpoint written before the flag existed holds a 1<<p-length
          // array; pad it so foldInto's regs(1<<p) write stays in bounds
          // (the extra byte starts 0 = flag unset, so estimates carry over
          // unchanged).
          val regs0 = state.getOption.getOrElse(new Array[Byte]((1 << p) + 1))
          val regs =
            if (regs0.length <= (1 << p))
              java.util.Arrays.copyOf(regs0, (1 << p) + 1)
            else regs0
          rows.foreach { case (_, v) => foldInto(regs, v, p) }
          state.update(regs)
          // n_regs counts the phantom as occupied — exactly what the
          // batch estimate's count(lit(1)) sees on a null-bucket row
          Iterator.single(NdvSnapshot(group, regs.count(_ > 0),
            estimate(regs, p)))
      }
  }
}
