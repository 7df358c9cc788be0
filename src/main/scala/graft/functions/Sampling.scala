package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for dataset mixing — the "take 50%
  * of English, 20% of German, 10% of the rest" step of assembling a
  * training mix from a scored/deduplicated corpus.
  *
  * Per-key deterministic hashing, not `rand()`: the same row is kept or
  * dropped on every run, on any cluster layout, so mixes are
  * reproducible and a re-run resumes to the identical dataset. The hash
  * is 60 bits of md5 (15 hex digits — within a signed long, identical in
  * DuckDB via the same hex arithmetic), so every sample is
  * oracle-checkable cross-engine.
  */
object Sampling {

  val DefaultDen = 1000

  /** Sentinel hashed in place of a NULL key by [[splitAssign]] — kept
    * printable-free (U+0001 framing) so no real key string collides
    * with it, and mirrored in SQL via [[nullSafeKeySql]].
    */
  val NullKeySentinel = "\u0001null\u0001"

  /** DuckDB expression wrapping key expression `e` with the same NULL
    * sentinel [[splitAssign]] applies: `chr(1) || 'null' || chr(1)`.
    */
  def nullSafeKeySql(e: String): String =
    s"COALESCE(CAST($e AS VARCHAR), chr(1) || 'null' || chr(1))"

  /** 60-bit nonnegative key hash, identical in Spark and DuckDB:
    * `conv(substr(md5(k), 1, 15), 16, 10)` — evaluated digest-direct by
    * the native [[Sketches.keyHash60]] kernel (bit-identical value; the
    * declarative form built and re-parsed a 32-char hex string on every
    * call of the engine's hottest primitive).
    */
  def keyHash60(key: Column): Column =
    Sketches.keyHash60(key.cast("string"))

  /** The DuckDB mirror of [[keyHash60]] applied to expression `e`. */
  def keyHash60Sql(e: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"

  /** The DuckDB mirror of [[Sketches.keyHash120]]'s second half (md5 bits
    * 60–119, hex chars 16–30) — the confirm hash that upgrades an
    * ExactSubstr mark join's key to a ~120-bit composite.
    */
  def keyHash60bSql(e: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 16, 15) AS UBIGINT) AS BIGINT)"

  /** Keep a deterministic `num/den` fraction of rows by key. */
  def deterministicSample(df: DataFrame, keyCol: String,
      num: Int, den: Int = DefaultDen): DataFrame = {
    require(num >= 0 && num <= den && den > 0, "need 0 <= num <= den")
    df.filter(pmod(keyHash60(col(keyCol)), lit(den)) < lit(num))
  }

  /** Per-key quota: keep at most `k` rows per `keyCol` group, best
    * first by `order` (break ties for determinism). The source-balancing
    * step of a mix ("≤ N docs per domain/language"). Plans as ONE
    * key exchange, and the rank-≤-k filter lets Spark run it as
    * WindowGroupLimit — per-partition top-k heaps on the map side, so
    * the exchange ships at most k rows per (key, input partition), not
    * the group.
    */
  def topKPerKey(df: DataFrame, keyCol: String, k: Int,
      order: Seq[Column]): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(order.nonEmpty, "need at least one ordering column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Weight-proportional deterministic sample: keep each row with
    * probability `clamp(weight, 0, 1)` decided by its key hash — e.g.
    * quality-proportional downsampling, where a 0.9-quality doc is kept
    * 9× as often as a 0.1 one. Same reproducibility contract as the
    * fixed-fraction samplers, and still one codegen'd scan filter; the
    * weight can be any deterministic Column (both engines must compute
    * identical doubles for the oracle, so derive it from row fields).
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      den: Int = DefaultDen): DataFrame = {
    require(den > 0, "den must be positive")
    val p = least(greatest(weight, lit(0.0)), lit(1.0))
    df.filter(
      pmod(keyHash60(col(keyCol)), lit(den)).cast("double") < p * lit(den))
  }

  /** Token-budget data selection: keep the highest-priority documents
    * whose running token total stays within `budget` — the "best N
    * tokens" subset selection step of assembling a training mix from a
    * scored corpus. Priority must be a deterministic Column in [0,1]
    * (e.g. [[TextAnalysis.qualityScore]]); ties break by `idCol`.
    *
    * The global priority-ordered running sum uses the same two-phase
    * shape as [[Packing.concatOffsetsGlobal]]: rows chunk by a coarse
    * priority bucket (monotone with the sort order, so bucket-major
    * order equals global order), the per-chunk window cumsum runs fully
    * parallel, and only the #chunks-row totals frame passes through a
    * single-partition window before broadcasting back. No data-row
    * serialization at any corpus size.
    *
    * Output: input columns + `priority`, `n_tokens`, `cum_tokens`
    * (inclusive running total in global priority order), filtered to
    * `cum_tokens <= budget`.
    */
  def budgetSelect(df: DataFrame, idCol: String, priority: Column,
      nTokens: Column, budget: Long, chunks: Int = 256): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(chunks >= 1, "chunks must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val d = df
      .withColumn("priority", priority)
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("__chunk",
        least(greatest(floor((lit(1.0) - col("priority")) * chunks), lit(0)),
          lit(chunks - 1)).cast("long"))
    val w = Window.partitionBy(col("__chunk"))
      .orderBy(col("priority").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = d.withColumn("__local_cum", sum(col("n_tokens")).over(w))
    val wBase = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = d.groupBy(col("__chunk"))
      .agg(sum(col("n_tokens")).as("__chunk_total"))
      .withColumn("__base",
        coalesce(sum(col("__chunk_total")).over(wBase), lit(0L)))
      .select(col("__chunk"), col("__base"))
    local.join(broadcast(bases), Seq("__chunk"))
      .withColumn("cum_tokens", col("__base") + col("__local_cum"))
      .filter(col("cum_tokens") <= budget)
      .drop("__chunk", "__local_cum", "__base")
  }

  /** Deterministic corpus shuffle + shard assignment — the "shard
    * writer" step of materializing a training dataset: every example
    * lands in a pseudo-random shard with a pseudo-random within-shard
    * position, reproducible across runs and cluster layouts (the order
    * is a pure function of `salt` and the key, never of task timing).
    *
    * Scale shape: one hash-partition exchange on `shard` plus a
    * per-shard sort — exactly `repartition($"shard")
    * .sortWithinPartitions` at write time. Parallelism equals
    * `nShards`; a 100 TB run uses thousands of shards, so the window
    * never concentrates the corpus into few tasks.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val h = keyHash60(concat_ws(":", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** The DuckDB mirror of [[shuffleShards]]'s hash for expression `e`. */
  def shuffleHashSql(salt: String, e: String): String =
    keyHash60Sql(s"'$salt:' || CAST($e AS VARCHAR)")

  /** Deterministic train/val/test split assignment — the dataset
    * manifest step every training run needs: each row lands in the
    * first split whose cumulative weight covers its salted key hash
    * (per-mille weights out of `den`), so the assignment is a pure
    * function of the key, stable under re-partitioning, re-runs and
    * corpus growth (an UNCHANGED document never migrates between
    * splits when new documents arrive — the property random splits
    * lose and hash splits are used for).
    *
    * NULL keys hash a distinct explicit sentinel (`NullKeySentinel`) on
    * BOTH engines — Spark's `concat_ws` silently drops NULL arguments,
    * so without the coalesce every null-key row would hash the bare
    * salt and land together in one split while the SQL mirror's NULL
    * propagation sent them elsewhere. The sentinel keeps the behavior
    * explicit, engine-identical, and spread across splits like any
    * other key value.
    *
    * Output: input columns + `split`. One codegen'd CASE over the
    * scan — no shuffle, no state.
    */
  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)], salt: String = "split",
      den: Int = DefaultDen): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "weights must be >= 0")
    require(splits.map(_._2).sum == den,
      s"split weights must sum to den=$den, got ${splits.map(_._2).sum}")
    val h = pmod(keyHash60(concat_ws(":", lit(salt),
      coalesce(col(keyCol).cast("string"), lit(NullKeySentinel)))), lit(den))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assign = splits.zip(cum).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), hi)) => when(h < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic FIXED-SIZE uniform sample: exactly `n` rows (fewer
    * only if the input is smaller), the n smallest key hashes — the
    * reservoir-sample replacement for pipelines that need "exactly N
    * eval docs", reproducible across runs and cluster layouts where a
    * true reservoir is timing-dependent. [[deterministicSample]] keeps
    * a deterministic FRACTION; this keeps a deterministic COUNT.
    *
    * Scale shape: plans as TakeOrderedAndProject — per-partition n-row
    * heaps, only n rows per partition reach the final merge; no global
    * sort materializes.
    */
  def fixedSizeSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.orderBy(keyHash60(col(keyCol)), col(keyCol)).limit(n)
  }

  /** Domain-mixture reweighting: per-stratum token accounting plus the
    * sampling weight that moves the corpus toward a target mixture —
    * the "how much of each source/language goes into the run" step of
    * assembling a training mix. `targetFracs` gives explicit target
    * token fractions per stratum; unlisted strata share the remaining
    * mass uniformly (with an empty map, the target is uniform across
    * all strata).
    *
    * weight = target_frac / actual_frac: >1 means the stratum must be
    * up-sampled (or epochs repeated) to hit the target, <1 down-sampled;
    * `keep_prob` caps it at 1 for subsample-only mixes (feed it straight
    * to [[weightedSample]]). All ratios divide two order-independent
    * aggregates, so results are bit-reproducible cross-engine.
    *
    * Scale shape: one partial-aggregating groupBy over the scan; the
    * global-total window runs over the AGGREGATED frame (one row per
    * stratum — sources/languages number in the thousands at most, never
    * corpus-sized).
    */
  def mixtureWeights(df: DataFrame, stratumCol: String, nTokens: Column,
      targetFracs: Map[String, Double] = Map.empty): DataFrame = {
    require(targetFracs.values.forall(f => f >= 0 && f <= 1) &&
      targetFracs.values.sum <= 1.0 + 1e-9,
      "explicit target fractions must lie in [0,1] and sum to <= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val explicitFrac = targetFracs.foldLeft(lit(null).cast("double")) {
      case (acc, (s, f)) => when(col(stratumCol) === lit(s), lit(f)).otherwise(acc)
    }
    // folded in Scala, not Catalyst, so the oracle can interpolate the
    // EXACT double (JVM shortest-round-trip repr) into its SQL
    val residual = lit(1.0 - targetFracs.values.sum)
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("token_frac",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("__n_implicit",
        sum(when(explicitFrac.isNull, 1L).otherwise(0L)).over(w))
      .withColumn("target_frac",
        coalesce(explicitFrac,
          residual / greatest(col("__n_implicit"), lit(1L)).cast("double")))
      // guard the 0-token stratum: target/0 would yield Inf (or NaN for
      // 0/0, which Spark's NaN-sorts-largest would turn into keep_prob
      // 1.0) — an empty stratum contributes nothing, so weight 0
      .withColumn("weight",
        when(col("token_frac") > 0, col("target_frac") / col("token_frac"))
          .otherwise(lit(0.0)))
      .withColumn("keep_prob", least(col("weight"), lit(1.0)))
      .drop("__n_implicit")
  }

  /** Temperature-scaled mixture weights — the multilingual-LM sampling
    * rule (exponentiated up-weighting of low-resource strata, as used by
    * mBERT/XLM-R/mT5): the target fraction of stratum i is
    * `p_i^alpha / Σ_j p_j^alpha` where `p_i` is its natural token share,
    * so `alpha = 1` keeps the natural mix and `alpha → 0` approaches
    * uniform. Output mirrors [[mixtureWeights]]: per-stratum token
    * accounting plus `weight = temp_frac / token_frac` and a capped
    * `keep_prob` that feeds [[weightedSample]] directly.
    *
    * Exactness: `alpha = 0.5` (the default) evaluates as IEEE `sqrt` —
    * correctly rounded on every engine, so scores are bit-reproducible
    * cross-engine; other alphas go through `pow`, which carries no such
    * guarantee (rows-only oracle there). The score normalization sums
    * irrational doubles, so the sum runs over `decimal(20,18)` casts
    * (exact addition, order-independent) and divides as doubles.
    *
    * Scale shape: identical to [[mixtureWeights]] — one partial-
    * aggregating groupBy over the scan; every window runs over the
    * aggregated one-row-per-stratum frame.
    */
  def temperatureWeights(df: DataFrame, stratumCol: String, nTokens: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val score =
      if (alpha == 0.5) sqrt(col("token_frac"))
      else pow(col("token_frac"), lit(alpha))
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("token_frac",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("temp_score", score)
      .withColumn("temp_frac", col("temp_score") /
        sum(col("temp_score").cast("decimal(20,18)")).over(w).cast("double"))
      // guard the 0-token stratum: 0.0/0.0 = NaN, and Spark's
      // NaN-is-largest ordering would make least(NaN, 1.0) return 1.0 —
      // the empty stratum would get keep_prob 1 and poison
      // materializeMixture copy counts. An empty stratum weighs 0.
      .withColumn("weight",
        when(col("token_frac") > 0, col("temp_frac") / col("token_frac"))
          .otherwise(lit(0.0)))
      .withColumn("keep_prob", least(col("weight"), lit(1.0)))
  }

  /** Materialize a reweighted mix: emit `floor(weight)` copies of every
    * row plus one more with probability `frac(weight)`, decided
    * deterministically by the row's key hash — the epoch-repetition step
    * that turns [[mixtureWeights]]' output into an actual training
    * corpus. `weight > 1` up-samples (the document repeats across
    * epochs), `weight < 1` down-samples, `weight <= 0` drops the row.
    * In expectation the materialized copy count is exactly
    * `weight × rows`, and the realization is a pure function of the
    * keys, reproducible on any cluster layout.
    *
    * Output: input columns + `copy` (1-based copy index). Scale shape:
    * one generator expression over the scan — no shuffle, no driver
    * loop; the fan-out is bounded by `ceil(weight)` per row.
    */
  def materializeMixture(df: DataFrame, idCol: String, weight: Column,
      den: Int = DefaultDen): DataFrame = {
    require(den > 0, "den must be positive")
    val w = greatest(weight, lit(0.0))
    val nFull = floor(w) // LongType
    val frac = w - nFull.cast("double")
    val extra = (pmod(keyHash60(col(idCol)), lit(den)).cast("double")
      < frac * lit(den)).cast("long")
    df.withColumn("__n", nFull + extra)
      .filter(col("__n") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Stratified deterministic sample: per-stratum keep fractions (in
    * 1/`den` units) with a default for unlisted strata. One codegen'd
    * filter over the scan — no shuffle, no per-stratum pass; fractions
    * resolve through a literal CASE chain so Catalyst folds them and the
    * parquet reader sees one predicate.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Int], defaultNum: Int,
      den: Int = DefaultDen): DataFrame = {
    require((fractions.values ++ Seq(defaultNum)).forall(n => n >= 0 && n <= den),
      s"per-stratum numerators must be within [0, $den]")
    val threshold = fractions.foldLeft(lit(defaultNum)) { case (acc, (s, n)) =>
      when(col(stratumCol) === lit(s), lit(n)).otherwise(acc)
    }
    df.filter(pmod(keyHash60(col(keyCol)), lit(den)) < threshold)
  }

  /** Water-filling token-budget allocation: give every stratum an equal
    * "level" of the budget, capped at what it actually has — the
    * max-min-fair split a mixture planner uses to stop one giant source
    * from absorbing the whole budget (small sources keep everything;
    * big sources are clipped to a common level). Budget =
    * `total · budgetNum DIV budgetDen` tokens.
    *
    * INTEGER-exact: strata sort ascending by capacity; a stratum is
    * fully satisfiable iff `S_{i-1} + c_i·(n-i+1) ≤ B` (monotone in i,
    * so the satisfied set is a prefix); the rest share the remaining
    * budget as `level = (B - S_k) DIV (n-k)` with the `MOD` remainder
    * going one token each to the LARGEST-capacity unsatisfied strata
    * (largest-first keeps allocation monotone in capacity — a bigger
    * source never receives less). Σ allocated = min(B, total) exactly.
    *
    * Scale shape: one partial-aggregating groupBy over the corpus; the
    * sort/cumsum windows and the satisfied-prefix aggregate all run on
    * the per-stratum frame (one row per stratum), totals attach as
    * 1-row broadcasts.
    *
    * Output: (stratum, capacity, allocated, truncated, share) ascending
    * in capacity; `share` = allocated/B, one exact-long division.
    */
  def waterfillAllocate(df: DataFrame, stratumCol: String, size: Column,
      budgetNum: Int, budgetDen: Int): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val caps = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(size.cast("long")).as("cap"))
    val tot = caps.agg(sum(col("cap")).as("__tot"), count(lit(1)).as("__n"))
      .withColumn("__b", expr(s"__tot * $budgetNum DIV $budgetDen"))
    val wOrd = Window.orderBy(col("cap"), col("stratum")) // per-stratum rows
    val flagged = caps.crossJoin(broadcast(tot))
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__s",
        sum(col("cap")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__full",
        col("__s") - col("cap") + col("cap") * (col("__n") - col("__i") + 1)
          <= col("__b"))
    val prefix = flagged.agg(
      sum(when(col("__full"), 1L).otherwise(0L)).as("__k"),
      sum(when(col("__full"), col("cap")).otherwise(0L)).as("__sk"))
    flagged.crossJoin(broadcast(prefix))
      .withColumn("__lvl",
        when(col("__n") === col("__k"), lit(0L)) // all satisfied
          .otherwise(expr("(__b - __sk) DIV (__n - __k)")))
      .withColumn("__rem",
        when(col("__n") === col("__k"), lit(0L))
          .otherwise(expr("(__b - __sk) % (__n - __k)")))
      .withColumn("allocated",
        when(col("__full"), col("cap")).otherwise(
          col("__lvl") +
            when(col("__n") - col("__i") < col("__rem"), 1L).otherwise(0L)))
      .select(col("stratum"), col("cap").as("capacity"), col("allocated"),
        (!col("__full")).as("truncated"),
        (col("allocated").cast("double") / col("__b").cast("double"))
          .as("share"))
  }

  /** Deterministic negative sampling — the contrastive-training prep
    * step (word2vec/SGNS, two-tower recsys): for every positive
    * (key, item) pair, `k` pseudo-random negatives drawn uniformly
    * from the observed item universe, reproducible on any cluster
    * layout because the draw is a pure hash of (salt, key, item, j).
    * Negatives that collide with one of the key's own positives are
    * NOT silently rejected (rejection loops are layout-dependent);
    * they are FLAGGED (`accidental_hit`) so the trainer can mask them
    * — the standard in-batch-negatives hygiene.
    *
    * The draw needs a dense 0..n−1 item index. That index is built
    * WITHOUT a single-partition window (the two-phase
    * [[Dedup.sortedNeighborDups]] shape): per-bucket row_number over
    * item-hash buckets plus a cumulative per-bucket base broadcast
    * back — any bijection works for uniform sampling, so the bucketed
    * (non-sorted) index is as good as a global rank at none of the
    * cost.
    *
    * Scale shape: corpus-sized exchanges carry (key, item, j) ids and
    * longs; the index joins back on the drawn idx (AQE-sized); the
    * collision check is one left join on (key, item). Output:
    * (keyCol, itemCol, neg_rank, neg_item, accidental_hit), k rows per
    * positive.
    */
  def negativeSamples(positives: DataFrame, keyCol: String,
      itemCol: String, k: Int, salt: String = "neg",
      indexBuckets: Int = 64): DataFrame = {
    require(k >= 1 && k <= 1000, "need 1 <= k <= 1000")
    require(indexBuckets >= 1, "indexBuckets must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val pos = positives.select(col(keyCol), col(itemCol)).distinct()
    val items = pos.select(col(itemCol).as("item")).distinct()
    val local = items
      .withColumn("__b", pmod(col("item"), lit(indexBuckets.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("item"))).cast("long"))
    val wBase = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = local.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .select(col("__b"), col("__base"))
    val indexed = local.join(broadcast(bases), Seq("__b"))
      .select(col("item"), (col("__base") + col("__r") - 1).as("__idx"))
    val nItems = indexed.agg(count(lit(1)).as("__n"))
    val draws = pos.crossJoin(broadcast(nItems))
      .select(col(keyCol), col(itemCol),
        explode(array((1 to k).map(lit): _*)).as("neg_rank"), col("__n"))
      .withColumn("__idx", pmod(keyHash60(concat_ws(":", lit(salt),
        col(keyCol).cast("string"), col(itemCol).cast("string"),
        col("neg_rank").cast("string"))), col("__n")))
      .drop("__n")
    draws
      .join(indexed.withColumnRenamed("item", "neg_item"), Seq("__idx"))
      .drop("__idx")
      .join(pos.select(col(keyCol), col(itemCol).as("neg_item"))
          .withColumn("__hit", lit(true)),
        Seq(keyCol, "neg_item"), "left")
      .select(col(keyCol), col(itemCol), col("neg_rank"), col("neg_item"),
        coalesce(col("__hit"), lit(false)).as("accidental_hit"))
  }

  /** DuckDB mirror of [[negativeSamples]] — the identical bucketed
    * index, hash draw, and collision flag. `posSql` selects columns
    * `k_` (key) and `item`.
    */
  def negativeSamplesSql(posSql: String, k: Int, salt: String = "neg",
      indexBuckets: Int = 64, keyName: String = "k_",
      itemName: String = "item"): String =
    s"""WITH pos AS (SELECT DISTINCT k_, item FROM ($posSql)),
       |items AS (SELECT DISTINCT item FROM pos),
       |loc AS (
       |  -- ((x % N) + N) % N: DuckDB's % is sign-preserving, Spark's
       |  -- pmod is not — negative item ids must bucket identically
       |  SELECT item,
       |    ((item % $indexBuckets) + $indexBuckets) % $indexBuckets AS b,
       |    CAST(ROW_NUMBER() OVER (
       |      PARTITION BY ((item % $indexBuckets) + $indexBuckets) % $indexBuckets
       |      ORDER BY item) AS BIGINT) AS r
       |  FROM items),
       |bases AS (
       |  SELECT b, COALESCE(SUM(c) OVER (ORDER BY b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
       |  FROM (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM loc GROUP BY b)),
       |idx AS (
       |  SELECT loc.item, bases.base + loc.r - 1 AS i
       |  FROM loc JOIN bases ON loc.b = bases.b),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM idx),
       |draws AS (
       |  SELECT pos.k_, pos.item, j.neg_rank,
       |    ${keyHash60Sql(
             s"'$salt:' || CAST(pos.k_ AS VARCHAR) || ':' || " +
             "CAST(pos.item AS VARCHAR) || ':' || CAST(j.neg_rank AS VARCHAR)")}
       |      % n.n_items AS i
       |  FROM pos CROSS JOIN n
       |  CROSS JOIN (SELECT UNNEST(range(1, ${k + 1})) AS neg_rank) j)
       |SELECT d.k_ AS $keyName, d.item AS $itemName,
       |  CAST(d.neg_rank AS INT) AS neg_rank,
       |  idx.item AS neg_item,
       |  (p2.k_ IS NOT NULL) AS accidental_hit
       |FROM draws d
       |JOIN idx ON d.i = idx.i
       |LEFT JOIN pos p2 ON p2.k_ = d.k_ AND p2.item = idx.item""".stripMargin
}
