package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

import graft.core.RangeStats

/** Metrics parity with the reference's per-table dropwizard counters
  * (`Differ.updateMetrics`, Differ.java:316-336): the same nine
  * `<prefix>.<table>.<name>` series as named Spark LongAccumulators —
  * visible in the Spark UI, queryable programmatically, and summed across
  * a job's runs exactly like the reference's process-lifetime counters.
  *
  * The reference marks these per executor task; here the driver updates
  * them once per table from the final RangeStats — same totals, one
  * update (per-task granularity adds nothing when the counters are
  * already distributed-aggregated by the stats query itself).
  */
object DiffMetrics {

  val CounterNames: Seq[String] = Seq(
    "partitions_read", "matched_partitions", "mismatched_partitions",
    "partitions_only_in_source", "partitions_only_in_target",
    "skipped_partitions", "matched_rows", "matched_values",
    "mismatched_values")

  private val registry = TrieMap.empty[String, LongAccumulator]

  /** Get-or-register the accumulator for one fully-qualified series. */
  def accumulator(spark: SparkSession, qualified: String): LongAccumulator =
    registry.getOrElseUpdate(qualified, spark.sparkContext.longAccumulator(qualified))

  /** Publish one table's final stats (Differ.java:324-335 line for line;
    * the `partitions_read` meter becomes a counter of the same total).
    */
  def update(spark: SparkSession, prefix: String, table: String,
      s: RangeStats): Unit = {
    def a(name: String) = accumulator(spark, s"$prefix.$table.$name")
    a("partitions_read").add(
      s.matchedPartitions + s.onlyInSource + s.onlyInTarget + s.mismatchedPartitions)
    a("matched_partitions").add(s.matchedPartitions)
    a("mismatched_partitions").add(s.mismatchedPartitions)
    a("partitions_only_in_source").add(s.onlyInSource)
    a("partitions_only_in_target").add(s.onlyInTarget)
    a("skipped_partitions").add(s.skippedPartitions)
    a("matched_rows").add(s.matchedRows)
    a("matched_values").add(s.matchedValues)
    a("mismatched_values").add(s.mismatchedValues)
  }
}
