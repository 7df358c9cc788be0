package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable table source — the reference's reflection-loaded
  * `ClusterProvider` (common/.../ClusterProvider.java:34-44) re-shaped to
  * "anything that yields a DataFrame for a table name". A
  * Cassandra-connector implementation slots in beside the parquet one
  * without touching the engine.
  */
trait SourceProvider extends Serializable {
  def table(spark: SparkSession, name: String): DataFrame
  /** Catalog listing, for schema auto-discovery (O19). */
  def listTables(spark: SparkSession): Seq[String]
}

/** Directory-of-parquet source: `<root>/<table>.parquet`. */
final case class ParquetSource(root: String) extends SourceProvider {
  override def table(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$root/$name.parquet")
  override def listTables(spark: SparkSession): Seq[String] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet")).sorted.toSeq
  }
}

/** Generic file-format source: `<root>/<table>.<ext>` for any Spark
  * DataSource format (csv, json, orc, parquet, ...), with reader options
  * (e.g. `header`/`inferSchema` for csv). Demonstrates that the engine is
  * format-agnostic — the diff never sees anything but DataFrames.
  */
final case class FormatSource(root: String, format: String,
    options: Map[String, String] = Map.empty) extends SourceProvider {
  private val ext = format
  override def table(spark: SparkSession, name: String): DataFrame =
    spark.read.format(format).options(options).load(s"$root/$name.$ext")
  override def listTables(spark: SparkSession): Seq[String] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(s".$ext"))
      .map(_.getName.stripSuffix(s".$ext")).sorted.toSeq
  }
}

/** O19: schema auto-discovery — intersect/difference of the two sides'
  * table sets minus a keyspace/table reject-list (Schema.java:27-75,
  * invoked DiffJob.java:104-116). Warns (returns) asymmetric tables
  * instead of failing, like the reference.
  */
object SchemaOps {
  def intersect(src: Seq[String], tgt: Seq[String], disallowed: Set[String] = Set.empty): Seq[String] =
    (src.toSet & tgt.toSet -- disallowed).toSeq.sorted
  def difference(src: Seq[String], tgt: Seq[String]): Seq[String] =
    ((src.toSet -- tgt.toSet) | (tgt.toSet -- src.toSet)).toSeq.sorted
}
