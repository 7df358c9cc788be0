package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TableSpec

/** O15: the error sink. The reference wraps every partition read in
  * try/catch, tags the failing cluster by walking the cause chain for
  * `ClusterSourcedException` (ClusterSourcedException.java:11-31), and
  * journals a per-range summary plus per-partition detail
  * (JobMetadataDb.java:244-260).
  *
  * With declarative file sources a row either parses or the task retries
  * (O17 ≙ spark.task.maxFailures), so "errors" become *data-validation
  * quarantine*: rows failing structural checks (null partition key,
  * malformed values) are diverted to an errors frame — with the origin
  * side tagged, mirroring the source/target attribution — and the diff
  * runs on the clean remainder. One pass, no driver round-trips: the
  * split is two filters over the same scan.
  */
object Quarantine {

  final case class Split(valid: DataFrame, errors: DataFrame)

  /** Standard structural checks for a diff input: every pk component
    * non-null (a null partition key cannot be compared or tokenized).
    */
  def pkChecks(spec: TableSpec): Seq[(String, Column)] =
    spec.pk.map(c => s"null_pk_$c" -> col(c).isNull)

  /** Divert rows failing any check. `origin` tags the side
    * (source/target), like the reference's cluster attribution.
    * Error rows carry (origin, error, token, pk...) — the journal shape
    * of JobMetadataDb.java:587-607.
    */
  def split(df: DataFrame, spec: TableSpec, origin: String,
      checks: Seq[(String, Column)] = Nil,
      token: Seq[Column] => Column = DiffEngine.defaultToken): Split = {
    val allChecks = if (checks.nonEmpty) checks else pkChecks(spec)
    if (allChecks.isEmpty) // nothing to validate — everything is clean
      return Split(df, df.limit(0).select(
        lit(origin).as("origin"), lit(null).cast("string").as("error"),
        lit(null).cast("long").as("token"), lit(null).cast("string").as("pk")))
    val failCond = allChecks.map(_._2).reduce(_ || _)
    val reason = allChecks.foldRight(lit(null).cast("string")) {
      case ((name, cond), els) => when(cond, name).otherwise(els)
    }
    val errors = df.filter(failCond).select(
      lit(origin).as("origin"),
      reason.as("error"),
      // token of a null-keyed row is undefined — null, not a fake value
      lit(null).cast("long").as("token"),
      concat_ws("|", spec.pk.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*)
        .as("pk"))
    Split(df.filter(!coalesce(failCond, lit(false))), errors)
  }
}
