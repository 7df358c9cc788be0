package graft.sources

/** Token-ring split planning for the CQL connector seam — the
  * reference's `DiffJob.calculateSplits` (DiffJob.java:246-267) and
  * `getSplitsForTokens` (DiffJob.java:270-273) re-expressed. Each split
  * binds into [[CqlStatements.keyScan]]'s `token(pk) > ? AND
  * token(pk) <= ?` markers, so a split's effective coverage is the
  * half-open interval `(start, end]`.
  *
  * Deliberate divergence, documented: the reference adds ONE to every
  * middle split's start "to avoid split overlap" (DiffJob.java:262) —
  * but its own scan predicate is already strict on the lower bound, so
  * the +1 doesn't prevent overlap, it EXCLUDES every token equal to
  * `end_i + 1` from the scan (one potentially-owned token skipped per
  * interior boundary). Here each split's start IS the previous end:
  * with `(start, end]` semantics the ring is covered exactly once and
  * nothing is skipped. A ScalaTest pins both properties.
  *
  * Spark mapping: one split = one input partition of the connector
  * scan; `bucket = splitNumber % numBuckets` shards journal writes
  * exactly like the engine's `pmod(token, buckets)` (Bucketing).
  */
object CqlSplits {

  /** Partitioner token domains (TokenHelper.java:26-57). */
  sealed abstract class Ring(val min: BigInt, val max: BigInt)
  case object Murmur3Ring extends Ring(BigInt(Long.MinValue), BigInt(Long.MaxValue))
  case object RandomRing extends Ring(BigInt(-1), (BigInt(2) pow 127) - 1)

  /** One unit of scan parallelism; coverage is `(start, end]`. */
  final case class Split(splitNumber: Int, bucket: Int,
      start: BigInt, end: BigInt) {
    /** Reference `Split.containsAny` uses CLOSED bounds
      * (DiffJob.java:297-303) — kept verbatim for the specific-token
      * filter so behavior matches when both bounds coincide.
      */
    def containsAny(tokens: Set[BigInt]): Boolean =
      tokens.exists(t => t >= start && t <= end)
  }

  /** Equal-width slices of `ring` — `numSplits` splits whose `(start,
    * end]` intervals tile `(ring.min, ring.max]` exactly (the remainder
    * of the integer division widens the last split, as in the
    * reference).
    */
  def calculate(numSplits: Int, numBuckets: Int, ring: Ring): Seq[Split] = {
    require(numSplits >= 1, "numSplits must be >= 1")
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val segment = (ring.max - ring.min) / numSplits
    require(segment > 0, s"numSplits=$numSplits exceeds ring width")
    (0 until numSplits).map { i =>
      val start = ring.min + segment * i
      val end = if (i == numSplits - 1) ring.max else start + segment
      Split(i, i % numBuckets, start, end)
    }
  }

  /** Restrict a plan to splits owning any of `tokens` — the
    * "specific tokens" mode (O9, DiffJob.java:270-273).
    */
  def forTokens(tokens: Set[BigInt], splits: Seq[Split]): Seq[Split] =
    splits.filter(_.containsAny(tokens))
}
