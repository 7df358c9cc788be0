package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for — the two
  * canonical "custom operator" cases (as-of join, range join), expressed
  * as compositions of existing operators so Catalyst keeps owning the
  * physical plan. Neither creates a non-equi join: the naive formulations
  * (`l.ts >= r.ts` / `BETWEEN`) plan BroadcastNestedLoopJoins that are
  * O(n·m) at scale.
  */
object Joins {

  /** Backward as-of join: each left row picks the LATEST right row (per
    * key) with `right.ts <= left.ts`; left rows with no prior right row
    * keep nulls (left-outer semantics). DuckDB's `ASOF LEFT JOIN` is the
    * oracle mirror.
    *
    * Union-window formulation — the scale-correct shape: tag sides,
    * union, and carry the matched right row forward as ONE struct with
    * `last(ignoreNulls)` over (key, ts) — ONE shuffle on the key, a
    * within-partition sort, no point lookups, no range explosion. Right
    * rows sort before left rows at equal ts, so `ts` ties are inclusive
    * (matching `l.ts >= r.ts`); duplicate right rows at the same (key,
    * ts) are broken deterministically by the greatest first payload
    * column.
    *
    * Output: every left column, plus each `rightCols` column suffixed
    * with `suffix`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String], suffix: String = "_r",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right payload column")
    import org.apache.spark.sql.expressions.Window
    val leftOnly = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    val shared = keyCols.map(col) :+ col(tsCol)
    val rts = "__rts"
    val l = left.select(shared ++ leftOnly.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c + suffix))
        :+ lit(null).cast("long").as(rts) :+ lit(1).as("__side"): _*)
    val r = right.select(shared ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(c + suffix))
        :+ unix_micros(col(tsCol)).as(rts) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        rightCols.map(c => col(c + suffix).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fill ONE struct of (payloads, ts) so every output column comes
    // atomically from the SAME matched right row — filling each payload
    // column independently with last(ignoreNulls) would let a NULL payload
    // on the matched row silently inherit a value from an older right row
    // (and different columns from different rows), diverging from
    // DuckDB ASOF / merge_asof semantics
    val rpay = "__rpay"
    val matched = when(col("__side") === 0,
      struct(rightCols.map(c => col(c + suffix)) :+ col(rts): _*))
    val filled = rightCols.foldLeft(
        l.unionByName(r)
          .withColumn(rpay, last(matched, ignoreNulls = true).over(w))
          .withColumn(rts, col(rpay)(rts))) { (df, c) =>
        df.withColumn(c + suffix, col(rpay)(c + suffix))
      }.drop(rpay)
    // tolerance (merge_asof semantics): the latest prior match is also the
    // NEAREST, so a match older than the lookback simply becomes no-match
    val bounded = toleranceMicros match {
      case None => filled
      case Some(tol) =>
        val within = col(rts).isNotNull &&
          unix_micros(col(tsCol)) - col(rts) <= tol
        rightCols.foldLeft(filled) { (df, c) =>
          df.withColumn(c + suffix, when(within, col(c + suffix)))
        }
    }
    bounded.filter(col("__side") === 1).drop("__side", rts)
  }

  /** Range (interval-containment) join: pairs each point row with every
    * interval row of the same key whose `[startCol, endCol]` contains
    * `pointCol` — all matches, inner semantics. The plain-SQL BETWEEN
    * join is the oracle mirror.
    *
    * Binned formulation — the scale-correct shape: intervals explode
    * over the fixed-width bins they span, points key into their single
    * bin, and the join is EQUI on (key..., bin) with the containment
    * test as a residual filter. Each (point, interval) pair meets exactly
    * once (a point has one bin), so no distinct pass is needed.
    * `binMicros` should approximate the typical interval width: wider
    * bins = fewer replicas per interval, narrower = fewer false
    * candidates per bin.
    *
    * The replica count per interval is clamped at `maxBinsPerInterval`: a
    * degenerate interval (a multi-year validity range at the default
    * 1-hour bin) would otherwise explode into 10⁴–10⁵ copies of one row
    * and own the shuffle. Intervals wider than the clamp are routed down
    * a separate un-fanned path instead — such outliers are few by the
    * same assumption that makes binning work (binMicros ≈ typical width),
    * so AQE broadcasts that side at runtime (falling back to a
    * key-shuffled join if the assumption breaks) while the equi-join
    * plan of the normal population is preserved. The union of the two
    * paths is
    * exactly the unclamped result: the two interval populations are
    * disjoint, and each (point, interval) pair still meets once.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      binMicros: Long = 3600000000L,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val bin = "__bin"
    val nb = "__nbins"
    val contains =
      col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)
    val startBin = floor(unix_micros(col(startCol)) / binMicros)
    val endBin = floor(unix_micros(col(endCol)) / binMicros)
    val binned = intervals.withColumn(nb, endBin - startBin + 1L)
    val p = points.withColumn(bin, floor(unix_micros(col(pointCol)) / binMicros))
    val narrow = p
      .join(binned.filter(col(nb) <= maxBinsPerInterval)
        .withColumn(bin, explode(sequence(startBin, endBin))).drop(nb),
        keyCols :+ bin)
      .filter(contains)
      .drop(bin)
    // no forced broadcast on the outlier population: it is data-dependent
    // (every interval could exceed the clamp on adversarial data), so the
    // hint would override AQE's size check. AQE broadcasts it while it
    // measures small — the expected case the docstring argues — and falls
    // back to a key-shuffled join when it does not
    val wide = points
      .join(binned.filter(col(nb) > maxBinsPerInterval).drop(nb),
        keyCols)
      .filter(contains)
    narrow.unionByName(wide)
  }

  /** Interval-overlap join: pairs of (left, right) rows on the same key
    * whose CLOSED time intervals overlap — `lStart <= rEnd && rStart <=
    * lEnd`. The interval-vs-interval sibling of [[rangeJoin]], same
    * binning idea: each interval fans out one row per `binMicros` bin it
    * covers, candidates meet in an equi-join on (keys, bin), the precise
    * predicate prunes them, and — instead of a distinct pass — each
    * surviving pair is CLAIMED by exactly one bin (the later of the two
    * start bins, which every overlapping pair shares), so the output
    * needs no dedup shuffle at all.
    *
    * Scale: replication factor = interval span / binMicros; pick the bin
    * width near the typical span so each side fans out O(1) rows (an
    * interval spanning B bins costs B join rows — bound spans upstream
    * or widen the bin for long-interval populations, as in
    * [[rangeJoin]]'s broadcast escape hatch). The join is a plain
    * equi-join: never nested-loop, AQE-splittable on hot (key, bin)s.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binMicros: Long = 3600000000L): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    require(keyCols.nonEmpty, "need at least one equi-join key")
    val lsb = floor(unix_micros(col(lStart)) / binMicros)
    val leb = floor(unix_micros(col(lEnd)) / binMicros)
    val rsb = floor(unix_micros(col(rStart)) / binMicros)
    val reb = floor(unix_micros(col(rEnd)) / binMicros)
    val l = left.withColumn("__lsb", lsb)
      .withColumn("__bin", explode(sequence(lsb, leb)))
    val r = right.withColumn("__rsb", rsb)
      .withColumn("__bin", explode(sequence(rsb, reb)))
    l.join(r, keyCols :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === greatest(col("__lsb"), col("__rsb")))
      .drop("__bin", "__lsb", "__rsb")
  }

  /** Skew-safe shuffle equi-join: when one join key owns a disproportionate
    * share of `large` (a viral document, a null-ish default key), the
    * plain shuffle pins that key's entire volume on one task. Salting
    * splits it: `large` rows get a deterministic salt from `discCol`
    * (any column unique-ish per row — a row id), `small` is replicated
    * across all `buckets` salts, and the join key becomes (keys, salt) —
    * the hot key now spreads over `buckets` tasks. Result-identical to
    * the unsalted join (each large row meets each matching small row in
    * exactly one salt bucket).
    *
    * `inner` and `left_outer` only: each large row carries ONE salt, so
    * large-side semantics survive replication; small-side outer
    * semantics would need a dedup pass and are not offered. AQE's
    * skew-join split handles moderate skew on its own — reach for
    * explicit salting when a single key exceeds what one task can hold
    * even after AQE splits, or when AQE is off.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      discCol: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(keys.nonEmpty, "need at least one join key")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer, not $joinType")
    val l = large.withColumn("__salt",
      pmod(xxhash64(col(discCol)), lit(buckets)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
