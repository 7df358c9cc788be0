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

  /** 60-bit nonnegative key hash, identical in Spark and DuckDB:
    * `conv(substr(md5(k), 1, 15), 16, 10)`.
    */
  def keyHash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The DuckDB mirror of [[keyHash60]] applied to expression `e`. */
  def keyHash60Sql(e: String): String =
    s"CAST(CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"

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
}
