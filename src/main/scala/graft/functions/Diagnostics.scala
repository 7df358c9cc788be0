package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-diagnosis primitives: the profiling operators an engine team
  * runs BEFORE tuning a 100 TB job — key-skew measurement (is this join
  * salt-worthy, and by how much) and zone-map pruning (which storage
  * buckets can a range predicate skip). Both are plain aggregations, so
  * they cost one pass and are oracle-exact.
  */
object Diagnostics {

  /** Join-key skew profile: the `topK` heaviest keys with their share
    * of rows, skew ratio (count / mean per-key count), and the salt
    * factor that would level each onto the mean — the measurement that
    * decides between a plain shuffle join, AQE skew handling, or
    * explicit salting ([[graft.queries.AnalyticsQueries]]'
    * `q_salted_join` consumes exactly this number).
    *
    * Exactness: `suggested_salt = ⌈cnt · n_keys / total⌉` in integer
    * arithmetic; shares/ratios divide exact longs as doubles.
    *
    * Scale shape: one partial-aggregating groupBy on the key (the same
    * exchange the join itself would pay), materialized once (it feeds
    * the totals row AND the top-k); the totals frame is 1 row
    * (broadcast); top-k is a per-partition heap
    * (TakeOrderedAndProject).
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(tot))
      .withColumn("share", col("cnt").cast("double") / col("total").cast("double"))
      .withColumn("skew_ratio", col("cnt").cast("double") *
        col("n_keys").cast("double") / col("total").cast("double"))
      .withColumn("suggested_salt",
        expr("CAST((cnt * n_keys + total - 1) DIV total AS BIGINT)"))
      .select("key", "cnt", "share", "skew_ratio", "suggested_salt")
  }

  /** Zone maps: per-bucket min/max/count of `value` — the skip-index
    * every columnar store keeps per file/row-group, here as a first-
    * class table an engine can persist next to the data. One partial-
    * aggregating pass.
    */
  def zoneMaps(df: DataFrame, bucket: Column, value: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(min(value).as("min_v"), max(value).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Prune decision per zone: `scan = NOT (max_v < lo OR min_v > hi)`
    * for the closed range [lo, hi] — the planner-side step that turns
    * zone maps into skipped I/O. Pure projection over the (tiny) zone
    * table; the skip RATIO it reveals is the measure of how well the
    * bucket key clusters the value (high skip = the layout works).
    */
  def zonePrune(zones: DataFrame, lo: Column, hi: Column): DataFrame =
    zones.withColumn("scan", !(col("max_v") < lo || col("min_v") > hi))

  /** Shard-rebalancing move plan: given a shard key, compute the exact
    * minimal-volume set of (from, to, n_moved) transfers that levels
    * every shard onto its integer target — the compaction/rebalance
    * planner a 100 TB table layout runs after skewed growth.
    *
    * Targets: `total DIV n` rows each, +1 for the first `total MOD n`
    * shards in shard order — Σ excess = Σ deficit exactly. The pairing
    * is the classic cumulative-interval match: donors' excess units and
    * receivers' deficit units each line up on one axis (cumsum in shard
    * order); every overlap of a donor interval with a receiver interval
    * is one move of the overlap's width. That greedy plan is optimal in
    * total volume (every unit moves once) and deterministic.
    *
    * Scale shape: the per-shard size table is one partial-aggregating
    * groupBy (the only data-sized exchange); everything after runs on
    * the #shards-row frame — the cumsum windows and the interval join
    * see one row per shard, and the 1-row totals frame broadcasts. For
    * layouts with millions of shards the interval join would bin on
    * `unit DIV binSize` ([[Joins]]' interval pattern); at any plausible
    * shard count the plain range join on the tiny frame is the right
    * plan.
    *
    * Output: (from_shard, to_shard, n_moved), n_moved > 0.
    */
  def shardRebalance(df: DataFrame, shard: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = df.groupBy(shard.as("shard")).agg(count(lit(1)).as("sz"))
    val tot = sizes.agg(sum(col("sz")).as("__tot"),
      count(lit(1)).as("__n"))
    val wOrd = Window.orderBy(col("shard")) // #shards rows only
    val planned = sizes.crossJoin(broadcast(tot))
      .withColumn("__rnk", row_number().over(wOrd).cast("long"))
      .withColumn("target", expr("__tot DIV __n") +
        when(col("__rnk") <= expr("__tot % __n"), 1L).otherwise(0L))
      .withColumn("excess", greatest(col("sz") - col("target"), lit(0L)))
      .withColumn("deficit", greatest(col("target") - col("sz"), lit(0L)))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val donors = planned.filter(col("excess") > 0)
      .withColumn("d_hi", sum(col("excess")).over(wCum))
      .select(col("shard").as("from_shard"),
        (col("d_hi") - col("excess")).as("d_lo"), col("d_hi"))
    val receivers = planned.filter(col("deficit") > 0)
      .withColumn("r_hi", sum(col("deficit")).over(wCum))
      .select(col("shard").as("to_shard"),
        (col("r_hi") - col("deficit")).as("r_lo"), col("r_hi"))
    donors.join(receivers,
        col("d_lo") < col("r_hi") && col("r_lo") < col("d_hi"))
      .select(col("from_shard"), col("to_shard"),
        (least(col("d_hi"), col("r_hi")) -
          greatest(col("d_lo"), col("r_lo"))).as("n_moved"))
      .filter(col("n_moved") > 0)
  }
}
