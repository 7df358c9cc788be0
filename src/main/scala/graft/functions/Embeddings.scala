package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-column aggregation: per-label centroids (element-wise
  * means), the building block of class analysis, cluster drift checks,
  * and label-conditioned near-dup thresholds.
  *
  * Two shapes with one semantics:
  *
  *  - [[labelCentroids]] — oracle-exact: element sums evaluate as a
  *    SEQUENTIAL fold in pinned `vec_id` order (window cumsum), so the
  *    float-addition order — and therefore every last bit of the double
  *    result — is identical in any engine that follows the same order.
  *    Costs a (label, dim) shuffle without map-side combine.
  *  - [[labelCentroidsAgg]] — the at-scale shape: plain groupBy avg
  *    with partial aggregation (combiner runs map-side, the exchange
  *    carries one partial per (label, dim, input partition)). Float
  *    addition order is partition-dependent, so results agree with the
  *    exact shape only to rounding (~1e-9 relative); the parity spec
  *    bounds the drift.
  *
  * Output long-form: (label, pos, mean_v, n_vecs) — reassembly into an
  * array column is a `collect_list` over pos when callers want it.
  */
object Embeddings {

  private def exploded(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String) =
    df.select(col(labelCol), col(idCol),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(labelCol), col(idCol),
        col("pos").cast("long").as("pos"), col("v").cast("double").as("v"))
      // drop null elements HERE so both shapes agree on them: the window
      // shape's sum skips nulls but its count(*) would not, while avg
      // divides by the non-null count — a ragged/null element would
      // otherwise push the two shapes apart by far more than rounding
      .filter(col("v").isNotNull)

  /** Deterministic bit-exact centroids (see object doc). */
  def labelCentroids(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val w = Window.partitionBy(col(labelCol), col("pos"))
      .orderBy(col(idCol))
    val grp = Window.partitionBy(col(labelCol), col("pos"))
    exploded(df, idCol, vecCol, labelCol)
      .withColumn("cs", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(grp))
      .filter(col("rn") === col("cnt"))
      .select(col(labelCol), col("pos"),
        (col("cs") / col("cnt")).as("mean_v"),
        col("cnt").as("n_vecs"))
  }

  /** Partial-aggregation centroids — the shape to run at 100 TB. */
  def labelCentroidsAgg(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame =
    exploded(df, idCol, vecCol, labelCol)
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("v")).as("mean_v"), count(lit(1)).as("n_vecs"))

  // --- int8 quantization -------------------------------------------------
  //
  // Symmetric per-vector int8 quantization — the standard 4× memory/IO
  // reduction for ANN at scale (a 100 TB float corpus becomes 25 TB of
  // int8 + one scale per vector; candidate scoring runs on integers).
  // Everything is deterministic integer/double arithmetic: quantized
  // dot products are integer-valued and therefore EXACT cross-engine,
  // which makes the whole quantized search path hash-checkable — unlike
  // trained-float pipelines that can only self-grade.

  /** Per-vector symmetric scale: max |element| (as double). */
  def absMax(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Quantize to int8-valued longs: q_i = floor(v_i * 127 / scale + 0.5)
    * (explicit half-up — `floor(x + 0.5)` is bit-identical in DuckDB,
    * unlike engine-native `round`s that differ on ties). A zero-scale
    * (all-zero) vector quantizes to zeros. Values land in [-127, 127];
    * the byte cast is a storage choice left to the sink.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    when(scale === 0d, transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, x =>
        floor(x.cast("double") * lit(127.0) / scale + lit(0.5))))
}
