package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.core.TableSpec

/** CQL schema discovery — the mapping half of a Cassandra-backed
  * [[SourceProvider]], kept separate from the environment-bound
  * connection half so it is fully unit-testable without a cluster.
  *
  * Mirrors the reference's `TableSpec.make` (spark-job/.../TableSpec.java:
  * 71-89), which pulls `TableMetadata` from a live cluster and splits
  * columns into clustering vs the rest; here the same split (plus the
  * partition key, which the reference tracks via its key-source
  * abstraction) is computed from declarative [[CqlColumn]] rows — the
  * exact shape `system_schema.columns` serves (`column_name`, `type`,
  * `kind`, `position`), so a live catalog implementation is a single
  * SELECT away.
  */
object CqlSchema {

  /** `system_schema.columns.kind` values (public Cassandra schema). */
  sealed abstract class Kind(val cql: String)
  case object PartitionKey extends Kind("partition_key")
  case object Clustering extends Kind("clustering")
  case object Regular extends Kind("regular")
  case object Static extends Kind("static")

  /** One row of table metadata, as served by `system_schema.columns`.
    * `position` orders multi-column partition/clustering keys;
    * `clusteringOrder` is the declared sort direction (`asc`/`desc` for
    * clustering columns, `none` otherwise — the literal values
    * `system_schema.columns.clustering_order` serves).
    */
  final case class CqlColumn(name: String, cqlType: String, kind: Kind,
      position: Int = 0, clusteringOrder: String = "none")

  /** CQL scalar type → Catalyst type (public CQL grammar; same pairings
    * the open-source Spark connector documents). Cassandra-only notions
    * with no Catalyst shape keep a faithful wide encoding: `varint` is an
    * unbounded integer → decimal(38,0); `uuid`/`timeuuid`/`inet`/
    * `duration` render as their canonical strings.
    */
  private val scalars: Map[String, DataType] = Map(
    "ascii" -> StringType, "text" -> StringType, "varchar" -> StringType,
    "bigint" -> LongType, "counter" -> LongType, "time" -> LongType,
    "int" -> IntegerType, "smallint" -> ShortType, "tinyint" -> ByteType,
    "varint" -> DecimalType(38, 0), "decimal" -> DecimalType(38, 18),
    "float" -> FloatType, "double" -> DoubleType,
    "boolean" -> BooleanType, "blob" -> BinaryType,
    "timestamp" -> TimestampType, "date" -> DateType,
    "uuid" -> StringType, "timeuuid" -> StringType,
    "inet" -> StringType, "duration" -> StringType)

  /** Parse a (possibly nested) CQL type string to its Catalyst type:
    * `frozen<...>` is transparent (frozenness is a storage property, not
    * a shape), `list`/`set` → array, `map` → map, `tuple` → struct with
    * positional `_1.._n` fields, `vector<float, n>` → array of float.
    */
  def toCatalyst(cqlType: String): DataType = {
    val s = cqlType.trim
    val lower = s.toLowerCase
    def innerOf(prefix: String): String =
      s.substring(prefix.length, s.lastIndexOf('>')).trim
    if (lower.startsWith("frozen<")) toCatalyst(innerOf("frozen<"))
    else if (lower.startsWith("list<"))
      ArrayType(toCatalyst(innerOf("list<")), containsNull = true)
    else if (lower.startsWith("set<"))
      ArrayType(toCatalyst(innerOf("set<")), containsNull = false)
    else if (lower.startsWith("map<")) {
      val parts = splitTopLevel(innerOf("map<"))
      require(parts.length == 2, s"malformed map type: $cqlType")
      MapType(toCatalyst(parts(0)), toCatalyst(parts(1)),
        valueContainsNull = true)
    } else if (lower.startsWith("tuple<"))
      StructType(splitTopLevel(innerOf("tuple<")).zipWithIndex.map {
        case (t, i) => StructField(s"_${i + 1}", toCatalyst(t))
      })
    else if (lower.startsWith("vector<")) {
      val parts = splitTopLevel(innerOf("vector<"))
      ArrayType(toCatalyst(parts.head), containsNull = false)
    } else scalars.getOrElse(lower,
      throw new IllegalArgumentException(
        s"unmapped CQL type '$cqlType' (user-defined types need an " +
          "explicit struct mapping)"))
  }

  /** Split `a, map<x, y>, b` on the commas at angle-bracket depth 0. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '<' => depth += 1
      case '>' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
      case _ =>
    }
    out += s.substring(start).trim
    out.result()
  }

  /** The full Catalyst schema of a table: key columns first in key order
    * (partition key by position, then clustering by position), then the
    * remaining columns alphabetically — the deterministic projection a
    * scan should produce. Key columns are non-nullable (CQL forbids null
    * keys); everything else is nullable (absent cells read back null).
    */
  def toStructType(cols: Seq[CqlColumn]): StructType =
    StructType(ordered(cols).map(c => StructField(c.name,
      toCatalyst(c.cqlType),
      nullable = c.kind != PartitionKey && c.kind != Clustering)))

  /** Role extraction, mirroring `TableSpec.make`: partition key and
    * clustering columns in declared position order; every remaining
    * column (regular + static) is a compared value column.
    */
  def toTableSpec(table: String, cols: Seq[CqlColumn]): TableSpec = {
    val pk = cols.filter(_.kind == PartitionKey).sortBy(_.position).map(_.name)
    val cl = cols.filter(_.kind == Clustering).sortBy(_.position).map(_.name)
    require(pk.nonEmpty, s"table $table: no partition_key columns in metadata")
    TableSpec(table, pk, cl,
      cols.filter(c => c.kind == Regular || c.kind == Static)
        .map(_.name).sorted,
      // (pk ++ clustering) IS unique in Cassandra — the engine can skip
      // the duplicate-occurrence window and its shuffle
      uniqueKey = true)
  }

  private[sources] def ordered(cols: Seq[CqlColumn]): Seq[CqlColumn] =
    cols.filter(_.kind == PartitionKey).sortBy(_.position) ++
      cols.filter(_.kind == Clustering).sortBy(_.position) ++
      cols.filter(c => c.kind == Regular || c.kind == Static).sortBy(_.name)
}

/** CQL read-statement generation — the query half of the connector seam,
  * mirroring the three prepared reads the reference builds per table
  * (DiffCluster.java:214-251): the token-range DISTINCT key scan (O1),
  * the forward full-partition read (O2), and the reverse read with every
  * declared clustering order flipped (O3, skipped when the table has no
  * clustering columns, DiffCluster.java:258-261). Identifiers are
  * double-quoted like the reference's cqlizedString/columnToString
  * (DiffContext.java:63-69, DiffCluster.java:281-284), with embedded
  * quotes escaped per CQL. `?` bind markers stand where the reference
  * binds split bounds / key values.
  */
object CqlStatements {
  import CqlSchema._

  /** Quote an identifier (idempotent on already-quoted names, like the
    * reference; embedded `"` doubled per the CQL grammar).
    */
  def quote(id: String): String =
    if (id.startsWith("\"")) id
    else "\"" + id.replace("\"", "\"\"") + "\""

  private def tokenOf(pk: Seq[String]): String =
    pk.map(quote).mkString("token(", ",", ")")

  private def pkOf(cols: Seq[CqlColumn]): Seq[String] = {
    val pk = cols.filter(_.kind == PartitionKey).sortBy(_.position).map(_.name)
    require(pk.nonEmpty, "no partition_key columns in metadata")
    pk
  }

  /** O1: `SELECT DISTINCT token(pk...), pk... WHERE token > ? AND
    * token <= ?` — one page of distinct partition keys per split.
    */
  def keyScan(keyspace: String, table: String, cols: Seq[CqlColumn]): String = {
    val pk = pkOf(cols)
    val tok = tokenOf(pk)
    s"SELECT DISTINCT $tok,${pk.map(quote).mkString(",")} " +
      s"FROM ${quote(keyspace)}.${quote(table)} " +
      s"WHERE $tok>? AND $tok<=?;"
  }

  /** O2: full-partition forward read — token + every column in metadata
    * order (keys first, then remaining columns alphabetically, the same
    * deterministic projection [[CqlSchema.toStructType]] produces),
    * keyed by equality on each partition-key column.
    */
  def forwardRead(keyspace: String, table: String, cols: Seq[CqlColumn]): String = {
    val pk = pkOf(cols)
    val all = ordered(cols).map(c => quote(c.name)).mkString(",")
    s"SELECT ${tokenOf(pk)},$all " +
      s"FROM ${quote(keyspace)}.${quote(table)} " +
      s"WHERE ${pk.map(c => s"${quote(c)}=?").mkString(" AND ")};"
  }

  /** O3: the reverse read — [[forwardRead]] plus ORDER BY with every
    * declared clustering direction flipped (`asc`→DESC, `desc`→ASC).
    * None when the table has no clustering columns: a reverse read makes
    * no sense and the reference never prepares one.
    */
  def reverseRead(keyspace: String, table: String,
      cols: Seq[CqlColumn]): Option[String] = {
    val cl = cols.filter(_.kind == Clustering).sortBy(_.position)
    if (cl.isEmpty) None
    else {
      val order = cl.map { c =>
        val dir =
          if (c.clusteringOrder.equalsIgnoreCase("desc")) "ASC" else "DESC"
        s"${quote(c.name)} $dir"
      }.mkString(",")
      Some(forwardRead(keyspace, table, cols).dropRight(1) +
        s" ORDER BY $order;")
    }
  }
}

/** Table metadata catalog for a CQL source. The live implementation is a
  * thin query over `system_schema.tables` / `system_schema.columns`
  * (environment-bound: needs a cluster and driver); [[CqlCatalog.fixed]]
  * serves declarative fixtures for tests and offline planning.
  */
trait CqlCatalog extends Serializable {
  def tables(keyspace: String): Seq[String]
  def columns(keyspace: String, table: String): Seq[CqlSchema.CqlColumn]
}

object CqlCatalog {
  /** Fixture-backed catalog: `table name -> column metadata`. */
  def fixed(byTable: Map[String, Seq[CqlSchema.CqlColumn]]): CqlCatalog =
    new CqlCatalog {
      override def tables(keyspace: String): Seq[String] =
        byTable.keys.toSeq.sorted
      override def columns(keyspace: String, table: String): Seq[CqlSchema.CqlColumn] =
        byTable.getOrElse(table, throw new IllegalArgumentException(
          s"table $table not in catalog (${byTable.keys.mkString(", ")})"))
    }
}

/** Cassandra-backed [[SourceProvider]] (the north-star "DataFrame diff
  * via Cassandra connector" seam; reference `DiffCluster.java:110-174`
  * issues token-range CQL scans — on Spark the open-source connector's
  * DSv2 source owns that: token-range splits become input partitions,
  * and pushed filters become CQL predicates). EXECUTION of `table()` is
  * environment-bound: it needs the connector on the classpath and a
  * reachable cluster, neither of which exists in a hermetic build — but
  * everything the ENGINE needs at plan time (schema, roles, uniqueness)
  * comes from [[CqlSchema]]/[[CqlCatalog]] and is tested offline.
  */
final case class CassandraSource(
    keyspace: String,
    catalog: CqlCatalog,
    options: Map[String, String] = Map.empty) extends SourceProvider {

  override def table(spark: SparkSession, name: String): DataFrame =
    spark.read.format(CassandraSource.Format)
      .options(options ++ Map("keyspace" -> keyspace, "table" -> name))
      .load()

  override def listTables(spark: SparkSession): Seq[String] =
    catalog.tables(keyspace)

  /** Engine-ready spec (roles + uniqueKey) for one table. */
  def spec(name: String): TableSpec =
    CqlSchema.toTableSpec(name, catalog.columns(keyspace, name))

  /** The Catalyst schema `table(name)` will produce. */
  def schema(name: String): StructType =
    CqlSchema.toStructType(catalog.columns(keyspace, name))
}

object CassandraSource {
  /** The open-source Spark-Cassandra connector's DSv2 format name. */
  val Format = "org.apache.spark.sql.cassandra"
}
