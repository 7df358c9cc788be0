package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign each document its token
  * offset range in the concat-and-chunk layout (all text concatenated in
  * a deterministic order, then split into fixed `seqLen` training
  * sequences). The output maps every document to the training sequences
  * it lands in — the bookkeeping a tokenize-and-pack job needs before
  * writing shards.
  *
  * Scale shape: a single global running sum would serialize on one
  * partition, so packing is per-SHARD (`pmod(id, shards)`) — the way
  * production pipelines pack within output shards anyway. One shuffle on
  * the shard key, then a window cumsum per shard; shards scale with the
  * cluster, and the layout stays deterministic for any fixed shard
  * count.
  */
object Packing {

  /** Per-document packed offsets. `nTokens` is the document's token
    * count (any expression, e.g. [[TextAnalysis.tokenCount]]). Output
    * adds: `shard`, `start_offset` (tokens before this doc in its
    * shard), `end_offset` (exclusive), `first_seq`/`last_seq` (the
    * `seqLen`-sized training sequences the doc spans, shard-local).
    */
  def concatOffsets(docs: DataFrame, idCol: String, nTokens: Column,
      shards: Int, seqLen: Long): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    require(seqLen >= 1, "seqLen must be >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards)).cast("long"))
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("end_offset",
        sum(col("__n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_offset", col("end_offset") - col("__n"))
      .withColumn("first_seq", expr(s"start_offset DIV $seqLen"))
      .withColumn("last_seq",
        expr(s"CASE WHEN end_offset > start_offset THEN (end_offset - 1) DIV $seqLen ELSE start_offset DIV $seqLen END"))
      .drop("__n")
  }
}
