package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DiffOptions, TableSpec}
import graft.engine.{DiffEngine, OracleSql, Perturb, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked diff query compares a source table against a
  * deterministic perturbed copy ([[graft.engine.Perturb]]) so the DuckDB
  * oracle can derive the identical target. Oracle queries use the identity
  * token (pk itself) so token/bucket math is engine-independent; the
  * engine's scale default is `xxhash64`.
  */
object SparkEntry {

  import Perturb.{lineitemSpec, ordersSpec}

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")
  private val idTok = DiffEngine.identityToken _

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    DiffEngine.rangeStats(li(spark, dir), Perturb.lineitemTarget(li(spark, dir)),
      lineitemSpec, DiffOptions(), idTok)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O4+O5+O6+O7+O8: full RangeStats over the wide (clustered) shape
    "diff_range_stats" -> ((s, dir) =>
      DiffEngine.rangeStats(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, DiffOptions(), idTok)),
    // same over the narrow shape (no clustering — reference narrow1)
    "diff_range_stats_narrow" -> ((s, dir) =>
      DiffEngine.rangeStats(ord(s, dir), Perturb.ordersTarget(ord(s, dir)),
        ordersSpec, DiffOptions(), idTok)),
    // O7: per-partition stats + classification
    "diff_partition_stats" -> ((s, dir) =>
      DiffEngine.partitionStats(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, idTok)),
    // O14: mismatch journal rows
    "diff_mismatches" -> ((s, dir) =>
      DiffEngine.mismatches(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, DiffOptions(buckets = 100), idTok)),
    // O1+O4: partition-key scan + presence classification counts
    "diff_key_classify" -> ((s, dir) =>
      DiffEngine.keyDiff(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, idTok)
        .groupBy("classification").agg(count(lit(1)).as("n"))),
    // O5: row-level presence counts
    "diff_row_classify" -> ((s, dir) => {
      val rl = DiffEngine.rowLevel(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec)
      rl.agg(
        sum(when(col("__in_src") && col("__in_tgt"), 1L).otherwise(0L)).as("matched_rows"),
        sum(when(col("__in_src") && !col("__in_tgt"), 1L).otherwise(0L)).as("rows_only_in_source"),
        sum(when(col("__in_tgt") && !col("__in_src"), 1L).otherwise(0L)).as("rows_only_in_target"))
    }),
    // O6: per-regular-column matched/mismatched value counts (single pass
    // + stack unpivot)
    "diff_cell_values" -> ((s, dir) => {
      val rl = DiffEngine.rowLevel(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec)
      val both = col("__in_src") && col("__in_tgt")
      val aggs = lineitemSpec.regular.flatMap { c =>
        Seq(
          sum(when(both && col(s"__match_$c"), 1L).otherwise(0L)).as(s"m_$c"),
          sum(when(both && !col(s"__match_$c"), 1L).otherwise(0L)).as(s"mm_$c"))
      }
      val one = rl.agg(aggs.head, aggs.tail: _*)
      val stack = lineitemSpec.regular
        .map(c => s"'$c', m_$c, mm_$c").mkString(", ")
      one.selectExpr(s"stack(${lineitemSpec.regular.size}, $stack) as " +
        "(column_name, matched_values, mismatched_values)")
    }),
    // O11+O13: per-bucket progress with highest-seen token
    "diff_bucket_progress" -> ((s, dir) =>
      DiffEngine.bucketProgress(li(s, dir), Perturb.lineitemTarget(li(s, dir)),
        lineitemSpec, DiffOptions(buckets = 16), idTok)),
    // TPC-H Q1-style flagship aggregation (exact decimal sums → double)
    "q1_agg" -> ((s, dir) => {
      val l = li(s, dir).filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "diff_range_stats" -> OracleSql.rangeStats(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql),
    "diff_range_stats_narrow" -> OracleSql.rangeStats(ordersSpec,
      Perturb.ordersSrcSql, Perturb.ordersTargetSql),
    "diff_partition_stats" -> OracleSql.partitionStats(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql),
    "diff_mismatches" -> OracleSql.mismatches(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql, buckets = 100),
    "diff_key_classify" -> OracleSql.keyClassify(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql),
    "diff_row_classify" -> OracleSql.rowClassify(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql),
    "diff_cell_values" -> OracleSql.cellValues(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql),
    "diff_bucket_progress" -> OracleSql.bucketProgress(lineitemSpec,
      Perturb.lineitemSrcSql, Perturb.lineitemTargetSql, buckets = 16),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
