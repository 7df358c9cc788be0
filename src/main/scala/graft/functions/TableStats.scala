package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics collection — the per-column
  * null-count / NDV / min / max profile an optimizer keeps for join
  * planning and a pipeline keeps for data validation (schema drift, key
  * uniqueness, out-of-range values). The reference has no stats surface;
  * this is the engine-side primitive its journal tables would feed.
  */
object TableStats {

  /** Per-column stats for `cols`, computed in ONE aggregation pass over
    * the table (Spark plans the multiple DISTINCT aggregates via a
    * single Expand — table read once), then unpivoted with `stack` into
    * one row per column.
    *
    * NDV is EXACT (count distinct), deliberately: the result is
    * oracle-checkable, and at 100 TB the same shape runs with
    * `approx_count_distinct` swapped in (one-line change, HLL partial
    * aggregation — the `q_approx_distinct` family already covers that
    * path). Min/max cast to string so heterogeneous column types share
    * one output schema — the ANALYZE convention. Avoid timestamp
    * columns here: engines disagree on second-fraction rendering.
    *
    * Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    row.selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
