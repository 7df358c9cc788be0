package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One per-partition stats row (the output shape of
  * DiffEngine.partitionStats) as a typed record.
  */
final case class PartitionStatsRow(
    in_src: Boolean,
    in_tgt: Boolean,
    matched_rows: Long,
    rows_only_in_source: Long,
    rows_only_in_target: Long,
    matched_values: Long,
    mismatched_values: Long,
    classification: String)

/** Typed monoid aggregator: partition stats → RangeStats — the Dataset
  * analog of the reference's `RangeStats.accumulate` chain
  * (PartitionStats → RangeStats at RangeStats.java:157-165, RangeStats →
  * RangeStats merge at :167-178 driven by DiffJob.java:184). Spark runs
  * it as partial/final ObjectHashAggregate; the buffer is the same
  * nine-counter monoid.
  */
object RangeStatsAggregator extends Aggregator[PartitionStatsRow, RangeStats, RangeStats] {

  def fromPartition(p: PartitionStatsRow): RangeStats = {
    val both = p.in_src && p.in_tgt
    RangeStats(
      matchedPartitions = if (p.classification == Classification.Matched) 1 else 0,
      mismatchedPartitions = if (p.classification == Classification.PartitionMismatch) 1 else 0,
      onlyInSource = if (p.classification == Classification.OnlyInSource) 1 else 0,
      onlyInTarget = if (p.classification == Classification.OnlyInTarget) 1 else 0,
      matchedRows = if (both) p.matched_rows else 0,
      matchedValues = if (both) p.matched_values else 0,
      mismatchedValues = if (both) p.mismatched_values else 0)
  }

  override def zero: RangeStats = RangeStats()
  override def reduce(b: RangeStats, p: PartitionStatsRow): RangeStats =
    b.merge(fromPartition(p))
  override def merge(a: RangeStats, b: RangeStats): RangeStats = a.merge(b)
  override def finish(r: RangeStats): RangeStats = r
  override def bufferEncoder: Encoder[RangeStats] = Encoders.product[RangeStats]
  override def outputEncoder: Encoder[RangeStats] = Encoders.product[RangeStats]
}
