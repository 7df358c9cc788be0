package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Sampling

/** Training-set materialization: the write side of
  * [[Sampling.shuffleShards]]. A corpus becomes `nShards` parquet
  * partitions in a deterministic pseudo-random order, plus a manifest
  * (per-shard row count and an order-independent id checksum) a
  * downstream trainer or a re-run can audit against — the standard
  * "shards + manifest" layout of a dataset release.
  *
  * Scale shape: the write is `repartition(shard)` +
  * `sortWithinPartitions` — one exchange keyed on the shard id with a
  * per-shard sort, parallelism = nShards (thousands at corpus scale);
  * the manifest is a per-shard aggregation of two longs. The checksum
  * (sum of 60-bit id hashes in decimal(38,0) — no overflow at any corpus size) is order- and
  * partitioning-independent, so a manifest mismatch means missing or
  * duplicated ROWS, never a benign reordering.
  */
object ShardSink {

  /** Write `df` under `path` partitioned by shard, with the manifest at
    * `path/_manifest` (underscore-prefixed: invisible to parquet
    * directory discovery of the data itself). Returns the manifest.
    */
  def writeShards(df: DataFrame, idCol: String, path: String,
      nShards: Int, salt: String = "shuffle"): DataFrame = {
    // persist: the sharded frame feeds BOTH the data write and the
    // manifest aggregation — without it the upstream shuffle (and
    // whatever pipeline produced `df`) runs twice
    val sharded = Sampling.shuffleShards(df, idCol, nShards, salt).persist()
    try {
      sharded
        .repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("pos"))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      val manifest = sharded.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Sampling.keyHash60(col(idCol)).cast("decimal(38,0)"))
            .as("id_checksum"))
      manifest.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/_manifest")
      // re-read so the returned frame does not pin the unpersisted cache
      sharded.sparkSession.read.parquet(s"$path/_manifest")
    } finally sharded.unpersist()
  }

  /** Audit a written shard directory against its manifest: recount and
    * re-checksum every shard from the DATA and full-outer join to the
    * manifest. Output one row per shard with an `ok` verdict — empty
    * `filter(!ok)` means the materialization is intact.
    */
  def audit(spark: org.apache.spark.sql.SparkSession, idCol: String,
      path: String): DataFrame = {
    val data = spark.read.parquet(path)
    val recount = data.groupBy(col("shard"))
      .agg(count(lit(1)).as("data_rows"),
        sum(Sampling.keyHash60(col(idCol)).cast("decimal(38,0)"))
          .as("data_checksum"))
    val manifest = spark.read.parquet(s"$path/_manifest")
    manifest.join(recount, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_rows"), lit(-1L)).as("n_rows"),
        coalesce(col("data_rows"), lit(-1L)).as("data_rows"),
        (col("n_rows") <=> col("data_rows") &&
          col("id_checksum") <=> col("data_checksum")).as("ok"))
  }
}
