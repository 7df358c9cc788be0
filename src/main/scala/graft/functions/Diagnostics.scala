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
  /** Range-partition balance audit — Spark's RangePartitioner story as
    * a queryable diagnostic: estimate `nRanges` sort boundaries from a
    * deterministic `1/sampleDen` key sample (the boundary-sampling
    * every engine's global sort performs), then measure how balanced
    * the FULL table's rows land across those estimated ranges. A
    * max/mean ratio near 1 says the sampled boundaries would give an
    * even sort shuffle; a hot range flags skew the sampler missed —
    * the audit run before committing a 100 TB global sort or a
    * range-bucketed layout.
    *
    * Determinism: the sample is the engine-portable md5 filter; the
    * sample's global ranks come from the two-phase bucketed pattern
    * (value-monotone range buckets + a ≤256-row carry broadcast — no
    * single-partition window; ties share a value, so boundary VALUES
    * are tie-order-independent); the ≤`nRanges`−1 boundary values are
    * a BOUNDED driver collect (exactly what RangePartitioner does) and
    * return to the plan as a codegen'd literal comparison ladder.
    *
    * Output: (range_idx, n_rows, share), `nRanges` rows (empty ranges
    * absent).
    */
  def rangeBalance(df: DataFrame, keyCol: String, nRanges: Int = 32,
      sampleDen: Int = 100, indexBuckets: Int = 256): DataFrame = {
    require(nRanges >= 2 && nRanges <= 1024, "need 2 <= nRanges <= 1024")
    require(sampleDen >= 1, "sampleDen must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(keyCol).cast("long").as("v"))
    val sample = Sampling.deterministicSample(v, "v", 1, sampleDen)
    // two-phase global rank over the sample (monotone value buckets)
    val bounds0 = sample.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val span = (col("__hi") - col("__lo")).cast("double")
    val bucketed = sample.crossJoin(broadcast(bounds0))
      .withColumn("__b",
        when(span > 0.0, least(lit(indexBuckets - 1L),
          floor((col("v") - col("__lo")).cast("double") * indexBuckets / span)))
          .otherwise(lit(0L)))
    val wLoc = Window.partitionBy(col("__b")).orderBy(col("v"))
    val local = bucketed
      .withColumn("__r", row_number().over(wLoc).cast("long"))
    val wBase = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .select(col("__b"), col("__base"))
    val ranked = local.join(broadcast(bases), Seq("__b"))
      .select(col("v"), (col("__base") + col("__r")).as("__rank"))
    // boundary i sits at rank ceil(i·n/nRanges) = (i·n + nR − 1) div nR
    // (exact integer ceil, same form the oracle uses). n and the
    // boundary VALUES are bounded driver-side reads — the two actions
    // RangePartitioner itself performs
    val n = sample.count()
    val targetRanks = (1 until nRanges)
      .map(i => (i.toLong * n + nRanges - 1) / nRanges)
      .filter(r => r >= 1 && r <= n).distinct
    val boundaries =
      if (targetRanks.isEmpty) Array.empty[Long]
      else ranked.filter(col("__rank").isin(targetRanks: _*))
        .select(col("v"))
        .collect().map(_.getLong(0)).distinct.sorted // bounded: < nRanges
    val ladder = boundaries.zipWithIndex.foldLeft(
      when(lit(false), 0L)) { case (acc, (b, i)) =>
      acc.when(col("v") <= b, i.toLong)
    }.otherwise(lit(boundaries.length.toLong))
    val counts = v.select(ladder.as("range_idx"))
      .groupBy(col("range_idx")).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col("range_idx"), col("n_rows"),
        (col("n_rows").cast("double") / col("__t").cast("double"))
          .as("share"))
  }

  /** DuckDB mirror of [[rangeBalance]]: same md5 sample, same
    * integer-ceil target ranks (a global ROW_NUMBER stands in for the
    * engine's two-phase rank — tie rows share a value, so boundary
    * VALUES agree), same strictly-less range assignment. `srcSql`
    * selects one BIGINT column `v`.
    */
  def rangeBalanceSql(srcSql: String, nRanges: Int = 32,
      sampleDen: Int = 100): String =
    s"""WITH v AS (SELECT v FROM ($srcSql)),
       |s AS (SELECT v FROM v WHERE ${Sampling.keyHash60Sql("v")}
       |        % $sampleDen < 1),
       |r AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT)
       |        AS rnk FROM s),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
       |t AS (SELECT DISTINCT (i * n.n + $nRanges - 1) // $nRanges AS tr
       |      FROM (SELECT UNNEST(range(1, $nRanges)) AS i)
       |      CROSS JOIN n
       |      WHERE (i * n.n + $nRanges - 1) // $nRanges
       |        BETWEEN 1 AND n.n),
       |b AS (SELECT DISTINCT r.v AS bv FROM r JOIN t ON r.rnk = t.tr),
       |dv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY v),
       |asg AS (
       |  SELECT dv.v, dv.c,
       |    CAST(COALESCE(SUM(CASE WHEN b.bv < dv.v THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS range_idx
       |  FROM dv LEFT JOIN b ON TRUE
       |  GROUP BY dv.v, dv.c),
       |cnt AS (SELECT range_idx, CAST(SUM(c) AS BIGINT) AS n_rows
       |        FROM asg GROUP BY range_idx),
       |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM cnt)
       |SELECT range_idx, n_rows,
       |  CAST(n_rows AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share
       |FROM cnt CROSS JOIN tot""".stripMargin

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
