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
}
