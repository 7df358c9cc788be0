package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TableSpec

/** Repair-statement generation — the reconciliation step downstream of
  * the diff. The reference stops at REPORTING divergence (mismatch
  * journal rows, JobMetadataDb.java:246-263); the standard operator
  * follow-up is to replay those keys against the target as CQL. This
  * emits that script from the same row-level frame the mismatch sink
  * uses, treating the source as the side of truth:
  *
  *   - row only in source        → `INSERT` of the full source row
  *   - row only in target        → `DELETE` by full primary key
  *   - present in both, values differ → `UPDATE SET` of exactly the
  *     mismatched regular columns
  *
  * Statement text is deterministic and engine-independent: values render
  * type-driven (doubles as fixed 2-decimal `%.2f`, timestamps at second
  * resolution, strings quote-escaped, `NULL` unquoted), so the emitted
  * script — not just its row count — is oracle-checkable. The 2-decimal
  * double rendering is exact for currency-style inputs; callers with
  * full-precision doubles should widen the format.
  *
  * Scale shape: one pass over the row-level join, statements built as
  * codegen'd string expressions; nothing leaves the executors — the
  * script is a DataFrame to write wherever repairs are replayed from.
  */
object Repair {

  import DiffEngine.{matchCol, srcCol, InSrc, InTgt}

  /** Render a value column as CQL literal text. */
  private def render(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case StringType =>
        concat(lit("'"), regexp_replace(c, "'", "''"), lit("'"))
      case DoubleType | FloatType => format_string("%.2f", c)
      case TimestampType | TimestampNTZType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("'"))
      case _ => c.cast("string")
    }
    when(c.isNull, lit("NULL")).otherwise(rendered)
  }

  /** The repair script for one table pair. Output: primary-key columns,
    * `action` ∈ {INSERT, UPDATE, DELETE}, `statement` (terminated CQL).
    * Matched rows produce nothing.
    */
  def repairStatements(src: DataFrame, tgt: DataFrame,
      spec0: TableSpec): DataFrame = {
    val spec = spec0.bind(src)
    val types: Map[String, DataType] =
      src.schema.fields.map(f => f.name -> f.dataType).toMap
    val rl = DiffEngine.rowLevel(src, tgt, spec)

    val whereClause = concat_ws(" AND ",
      spec.primaryKey.map(k =>
        concat(lit(s"$k = "), render(col(k), types(k)))): _*)
    val insertCols = spec.primaryKey ++ spec.regular
    val insertVals = concat_ws(", ",
      (spec.primaryKey.map(k => render(col(k), types(k))) ++
        spec.regular.map(c => render(col(srcCol(c)), types(c)))): _*)
    val insertStmt = concat(
      lit(s"INSERT INTO ${spec.table} (${insertCols.mkString(", ")}) VALUES ("),
      insertVals, lit(");"))
    val deleteStmt = concat(
      lit(s"DELETE FROM ${spec.table} WHERE "), whereClause, lit(";"))
    // SET list carries exactly the mismatched columns (concat_ws skips
    // the nulls the matched columns leave behind)
    val setList = concat_ws(", ",
      spec.regular.map(c =>
        when(!col(matchCol(c)),
          concat(lit(s"$c = "), render(col(srcCol(c)), types(c))))): _*)
    val updateStmt = concat(
      lit(s"UPDATE ${spec.table} SET "), setList,
      lit(" WHERE "), whereClause, lit(";"))
    val anyMismatch = spec.regular
      .map(c => !col(matchCol(c)))
      .reduceOption(_ || _).getOrElse(lit(false))

    rl.withColumn("action",
        when(col(InSrc) && !col(InTgt), lit("INSERT"))
          .when(col(InTgt) && !col(InSrc), lit("DELETE"))
          .when(anyMismatch, lit("UPDATE")))
      .filter(col("action").isNotNull)
      .withColumn("statement",
        when(col("action") === "INSERT", insertStmt)
          .when(col("action") === "DELETE", deleteStmt)
          .otherwise(updateStmt))
      .select(spec.primaryKey.map(col) :+ col("action") :+ col("statement"): _*)
  }
}
