package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TableSpec

/** Deterministic perturbations that derive a "target" table from a source
  * table, exercising every mismatch class of the reference
  * (FIXTURES.md perturbation protocol; mismatch taxonomy
  * MismatchType.java:22-28):
  *
  *  - drop whole partitions            → ONLY_IN_SOURCE
  *  - insert new partitions            → ONLY_IN_TARGET
  *  - drop one clustering row          → PARTITION_MISMATCH (row diff)
  *  - mutate a cell value              → mismatchedValues
  *  - value → null                     → mismatchedValues (null != value)
  *
  * Each perturbation exists twice — as a DataFrame transform and as the
  * equivalent SQL text — so the DuckDB oracle sees the *same* target.
  * All predicates are modulus tests on the numeric partition key: fully
  * deterministic, no RNG, identical in both engines.
  */
object Perturb {

  val DropPartitionMod = 53
  val InsertPartitionMod = 59
  val DropRowMod = 61
  val MutateCellMod = 67
  val NullCellMod = 71
  val InsertKeyOffset = 3000000000L

  /** Spark-side perturbed lineitem (wide shape: pk=l_orderkey,
    * clustering=l_linenumber).
    */
  def lineitemTarget(li: DataFrame): DataFrame = {
    val kept = li
      .filter(col("l_orderkey") % DropPartitionMod =!= 0)
      .filter(!(col("l_orderkey") % DropRowMod === 0 && col("l_linenumber") === 1))
      .withColumn("l_quantity",
        when(col("l_orderkey") % MutateCellMod === 0, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      .withColumn("l_returnflag",
        when(col("l_orderkey") % NullCellMod === 0, lit(null).cast("string"))
          .otherwise(col("l_returnflag")))
    val inserted = li
      .filter(col("l_orderkey") % InsertPartitionMod === 0 && col("l_linenumber") === 1)
      .withColumn("l_orderkey", col("l_orderkey") + InsertKeyOffset)
    kept.unionByName(inserted)
  }

  /** The PREVIOUS run's target for the incremental-diff query: the same
    * perturbations as [[lineitemTarget]] minus the cell mutation, so
    * between "yesterday's run" (src vs this) and "today's run" (src vs
    * [[lineitemTarget]]) exactly the MutateCellMod buckets change while
    * the rest stay bit-identical — exercising both the replay and the
    * fresh path of `DiffEngine.incrementalDiff`. Spark-side only: the
    * oracle checks the final result against the CURRENT pair.
    */
  def lineitemTargetStale(li: DataFrame): DataFrame = {
    val kept = li
      .filter(col("l_orderkey") % DropPartitionMod =!= 0)
      .filter(!(col("l_orderkey") % DropRowMod === 0 && col("l_linenumber") === 1))
      .withColumn("l_returnflag",
        when(col("l_orderkey") % NullCellMod === 0, lit(null).cast("string"))
          .otherwise(col("l_returnflag")))
    val inserted = li
      .filter(col("l_orderkey") % InsertPartitionMod === 0 && col("l_linenumber") === 1)
      .withColumn("l_orderkey", col("l_orderkey") + InsertKeyOffset)
    kept.unionByName(inserted)
  }

  /** SQL mirror of [[lineitemTarget]]. */
  val lineitemTargetSql: String =
    s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       |       CASE WHEN l_orderkey % $MutateCellMod = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
       |       l_extendedprice, l_discount, l_tax,
       |       CASE WHEN l_orderkey % $NullCellMod = 0 THEN NULL ELSE l_returnflag END AS l_returnflag,
       |       l_linestatus, l_shipdate
       |FROM lineitem
       |WHERE l_orderkey % $DropPartitionMod <> 0
       |  AND NOT (l_orderkey % $DropRowMod = 0 AND l_linenumber = 1)
       |UNION ALL
       |SELECT l_orderkey + $InsertKeyOffset, l_partkey, l_suppkey, l_linenumber, l_quantity,
       |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
       |FROM lineitem
       |WHERE l_orderkey % $InsertPartitionMod = 0 AND l_linenumber = 1""".stripMargin

  val lineitemSrcSql: String = "SELECT * FROM lineitem"

  /** LOCALIZED corruption target for the digest-tree query: damage
    * confined to keys ≡ 0..7 (mod 512) — under a 64-bucket digest these
    * land in buckets 0-7 exactly, i.e. ONE super-node of an 8-fanout
    * tree. The realistic anti-entropy shape (one bad compaction / one
    * corrupted SSTable range) where a Merkle tree actually prunes:
    * 7 of 8 supers verify clean in one row each.
    */
  def lineitemTargetLocalized(li: DataFrame): DataFrame =
    li.withColumn("l_quantity",
      when(col("l_orderkey") % 512 < 8, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))

  /** SQL mirror of [[lineitemTargetLocalized]]. */
  val lineitemTargetLocalizedSql: String =
    """SELECT * REPLACE (
      |  CASE WHEN l_orderkey % 512 < 8 THEN l_quantity + 1
      |       ELSE l_quantity END AS l_quantity)
      |FROM lineitem""".stripMargin

  /** Float-drift target for the TOLERANCE diff: identical to the source
    * except `l_extendedprice` nudged by +0.005 (inside a 0.01 tolerance)
    * on `% 10 = 3` partitions and by +1.0 (outside it) on `% 10 = 4` —
    * so a toleranced diff counts exactly the big nudges mismatched and
    * an exact diff counts both.
    */
  val JitterSmall = 0.005
  val JitterBig = 1.0

  def lineitemTargetJitter(li: DataFrame): DataFrame =
    li.withColumn("l_extendedprice",
      when(col("l_orderkey") % 10 === 3, col("l_extendedprice") + JitterSmall)
        .when(col("l_orderkey") % 10 === 4, col("l_extendedprice") + JitterBig)
        .otherwise(col("l_extendedprice")))

  /** SQL mirror of [[lineitemTargetJitter]] (DuckDB `* REPLACE`). */
  val lineitemTargetJitterSql: String =
    s"""SELECT * REPLACE (
       |  CASE WHEN l_orderkey % 10 = 3 THEN l_extendedprice + $JitterSmall
       |       WHEN l_orderkey % 10 = 4 THEN l_extendedprice + $JitterBig
       |       ELSE l_extendedprice END AS l_extendedprice)
       |FROM lineitem""".stripMargin

  val lineitemSpec: TableSpec = TableSpec(
    table = "lineitem",
    pk = Seq("l_orderkey"),
    clustering = Seq("l_linenumber"),
    regular = Seq("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))

  /** Spark-side perturbed orders (narrow shape: pk=o_orderkey, no
    * clustering — the reference's `narrow1`, one row per partition).
    */
  def ordersTarget(o: DataFrame): DataFrame = {
    val kept = o
      .filter(col("o_orderkey") % DropPartitionMod =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % MutateCellMod === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % NullCellMod === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")))
    val inserted = o
      .filter(col("o_orderkey") % InsertPartitionMod === 0)
      .withColumn("o_orderkey", col("o_orderkey") + InsertKeyOffset)
    kept.unionByName(inserted)
  }

  /** SQL mirror of [[ordersTarget]]. */
  val ordersTargetSql: String =
    s"""SELECT o_orderkey, o_custkey,
       |       CASE WHEN o_orderkey % $NullCellMod = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
       |       CASE WHEN o_orderkey % $MutateCellMod = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
       |       o_orderdate, o_orderpriority
       |FROM orders
       |WHERE o_orderkey % $DropPartitionMod <> 0
       |UNION ALL
       |SELECT o_orderkey + $InsertKeyOffset, o_custkey, o_orderstatus, o_totalprice,
       |       o_orderdate, o_orderpriority
       |FROM orders
       |WHERE o_orderkey % $InsertPartitionMod = 0""".stripMargin

  val ordersSrcSql: String = "SELECT * FROM orders"

  val ordersSpec: TableSpec = TableSpec(
    table = "orders",
    pk = Seq("o_orderkey"),
    clustering = Nil,
    regular = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority"),
    uniqueKey = true) // o_orderkey verified unique at every corpus scale

  /** events (wide, TWO clustering columns): pk=user_id,
    * clustering=(ts, event_id). `ts` stays the raw nanosecond long (reads
    * as long under nanosAsLong; the oracle mirrors it with epoch_ns) so
    * clustering identity is lossless in both engines.
    */
  def eventsTarget(ev: DataFrame): DataFrame = {
    val kept = ev
      .filter(col("user_id") % 23 =!= 0)
      .filter(!(col("event_id") % 17 === 0))
      .withColumn("value",
        when(col("event_id") % 19 === 0, col("value") + 1).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 29 === 0, lit(null).cast("string")).otherwise(col("props")))
    val inserted = ev
      .filter(col("user_id") % 31 === 0)
      .withColumn("user_id", col("user_id") + 5000000L)
    kept.unionByName(inserted)
  }

  val eventsSrcSql: String =
    "SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value, props FROM events"

  val eventsTargetSql: String =
    s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type,
       |       CASE WHEN event_id % 19 = 0 THEN value + 1 ELSE value END AS value,
       |       CASE WHEN event_id % 29 = 0 THEN NULL ELSE props END AS props
       |FROM events
       |WHERE user_id % 23 <> 0 AND NOT (event_id % 17 = 0)
       |UNION ALL
       |SELECT event_id, epoch_ns(ts) AS ts, user_id + 5000000, event_type, value, props
       |FROM events WHERE user_id % 31 = 0""".stripMargin

  val eventsSpec: TableSpec = TableSpec(
    table = "events",
    pk = Seq("user_id"),
    clustering = Seq("ts", "event_id"),
    regular = Seq("event_type", "value", "props"),
    uniqueKey = true) // (user_id, ts, event_id) verified unique at every scale

  /** embeddings (narrow, ARRAY-typed regular column): exercises nested
    * null-safe equality (`<=>` over array<float>). Mutations: append an
    * element (array value mismatch), null the array, bump the int label.
    */
  def embeddingsTarget(e: DataFrame): DataFrame = {
    val kept = e
      .filter(col("vec_id") % DropPartitionMod =!= 0)
      .withColumn("embedding",
        when(col("vec_id") % DropRowMod === 0, array_append(col("embedding"), lit(1.0f)))
          .when(col("vec_id") % NullCellMod === 0, lit(null))
          .otherwise(col("embedding")))
      .withColumn("label",
        when(col("vec_id") % MutateCellMod === 0, col("label") + 1).otherwise(col("label")))
    val inserted = e.filter(col("vec_id") % InsertPartitionMod === 0)
      .withColumn("vec_id", col("vec_id") + InsertKeyOffset)
    kept.unionByName(inserted)
  }

  val embeddingsSrcSql: String = "SELECT * FROM embeddings"

  val embeddingsTargetSql: String =
    s"""SELECT vec_id,
       |       CASE WHEN vec_id % $DropRowMod = 0 THEN list_append(embedding, 1.0::FLOAT)
       |            WHEN vec_id % $NullCellMod = 0 THEN NULL
       |            ELSE embedding END AS embedding,
       |       CASE WHEN vec_id % $MutateCellMod = 0 THEN label + 1 ELSE label END AS label
       |FROM embeddings
       |WHERE vec_id % $DropPartitionMod <> 0
       |UNION ALL
       |SELECT vec_id + $InsertKeyOffset, embedding, label
       |FROM embeddings WHERE vec_id % $InsertPartitionMod = 0""".stripMargin

  val embeddingsSpec: TableSpec = TableSpec(
    table = "embeddings",
    pk = Seq("vec_id"),
    clustering = Nil,
    regular = Seq("embedding", "label"),
    uniqueKey = true) // vec_id verified unique at every scale
}

/** Parquet table loading for the driver corpus (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` storage has drifted across corpus
    * regenerations — TIMESTAMP(NANOS) (reads as long nanoseconds under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
    * without UTC adjustment (reads as TIMESTAMP_NTZ) have both shipped.
    * Normalize on the READ dtype so every event-time operator sees one
    * canonical microsecond TimestampType regardless of encoding; the
    * session timezone is pinned to UTC everywhere, so the NTZ cast is a
    * bit-exact identity on the underlying micros.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: convert to microsecond timestamp
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported storage dtype $other — fixture drift; " +
            "extend Tables.events for the new encoding")
    }
  }
}
