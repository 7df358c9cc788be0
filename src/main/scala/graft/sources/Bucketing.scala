package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shuffle-free diff via bucketed snapshots — the 100 TB lever for the
  * diff join.
  *
  * The reference's equal-width token splits (DiffJob.java:231-267) exist
  * to shard work; Spark's analog that also ELIMINATES the join shuffle is
  * bucketing: when both snapshots are written bucketed and sorted by the
  * partition key with the same bucket count, the full-outer diff join
  * reads co-located buckets directly — no Exchange on either side, the
  * dominant cost at scale. Snapshot writers (the things producing the
  * parquet from Cassandra) should bucket by pk; the diff then streams.
  */
object Bucketing {

  /** Write a snapshot as a bucketed+sorted table (catalog-managed — Spark
    * only honors bucket metadata through the catalog).
    */
  def writeBucketed(df: DataFrame, tableName: String, keyCols: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.drop(1): _*)
      .sortBy(keyCols.head, keyCols.drop(1): _*)
      .format("parquet")
      .saveAsTable(tableName)

  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative long columns — the multi-dimensional clustering key a
    * lakehouse layout optimizer sorts files by (Delta/Iceberg
    * `OPTIMIZE ZORDER`): rows close in EITHER dimension land in nearby
    * z-prefix ranges, so per-file min/max stats prune scans filtered on
    * either column, where a plain sort only serves its leading column.
    * Pure integer bit expressions — codegen'd, bit-reproducible
    * cross-engine.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    val mask = (1L << bits) - 1
    val la = a.bitwiseAND(lit(mask))
    val lb = b.bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(lb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB mirror of [[zValue]] over expressions `a` and `b`. */
  def zValueSql(a: String, b: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    (0 until bits).map { i =>
      s"(((($a & $mask) >> $i) & 1) << ${2 * i}) | " +
        s"(((($b & $mask) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }
}
