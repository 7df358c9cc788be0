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

  /** GLOBAL packed offsets — one corpus-wide concat order (by `idCol`),
    * without the single-partition running sum a naive global window
    * would plan. Classic two-phase scan:
    *
    *   1. `chunk = id DIV chunkSize` splits the global order into
    *      contiguous blocks; a per-chunk window cumsum runs fully
    *      parallel (one shuffle on the chunk key).
    *   2. Per-chunk token totals — ONE ROW PER CHUNK — cumsum into each
    *      chunk's global base offset. Only this #chunks-row frame passes
    *      through a single-partition window; data rows never do. The
    *      bases then broadcast-join back onto phase 1.
    *
    * At 100 TB: pick chunkSize so #chunks ≈ 10⁴–10⁶ — the base frame
    * stays kilobytes while every data-carrying stage scales with the
    * cluster. Output is identical to what a global
    * `SUM(n) OVER (ORDER BY id)` would produce, bit for bit.
    */
  def concatOffsetsGlobal(docs: DataFrame, idCol: String, nTokens: Column,
      chunkSize: Long, seqLen: Long): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    require(seqLen >= 1, "seqLen must be >= 1")
    val chunked = docs
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("chunk", expr(s"CAST($idCol AS BIGINT) DIV $chunkSize"))
    val w = Window.partitionBy(col("chunk")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = chunked
      .withColumn("__local_end", sum(col("__n")).over(w))
    // phase 2: strictly-preceding chunk totals → global base per chunk.
    // The no-partition window is intentional: it sees #chunks rows only.
    val wBase = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = chunked.groupBy(col("chunk"))
      .agg(sum(col("__n")).as("__chunk_total"))
      .withColumn("__base",
        coalesce(sum(col("__chunk_total")).over(wBase), lit(0L)))
      .select(col("chunk"), col("__base"))
    local.join(broadcast(bases), Seq("chunk"))
      .withColumn("end_offset", col("__base") + col("__local_end"))
      .withColumn("start_offset", col("end_offset") - col("__n"))
      .withColumn("first_seq", expr(s"start_offset DIV $seqLen"))
      .withColumn("last_seq",
        expr(s"CASE WHEN end_offset > start_offset THEN (end_offset - 1) DIV $seqLen ELSE start_offset DIV $seqLen END"))
      .drop("__n", "__local_end", "__base")
  }

  /** Length-bucketed batching audit — the padding-waste accounting for
    * the OTHER packing regime: when examples are NOT concatenated but
    * padded to a per-batch length (SFT, contrastive, any example-aligned
    * training), the standard efficiency move is bucketing by length so
    * each batch pads to its bucket's upper bound instead of the global
    * max. Buckets are powers of two capped at `seqLen` (the usual
    * dynamic-batching grid; docs past `seqLen` truncate to it). Per
    * bucket: document/token counts, padding tokens paid if every doc
    * pads to the bucket bound, and the resulting fill fraction —
    * integer-exact except the final ratio (a division of two longs).
    *
    * Output: (bucket_len, n_docs, n_tokens, n_padding, fill_frac),
    * ascending by bucket.
    *
    * Scale shape: the bucket bound is a floor-log2 string-length
    * expression in the scan ([[TermStats]]' `length(bin(x))` idiom — no
    * floating log), and the only exchange is the partial-aggregating
    * groupBy on ≤ log2(seqLen)+1 keys.
    */
  def lengthBuckets(docs: DataFrame, nTokens: Column,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val len = least(greatest(nTokens.cast("long"), lit(1L)), lit(seqLen))
    val capped = docs.select(len.as("__len"))
      // next power of two >= len: 1 << bitlength(len - 1); len = 1 → 1
      .withColumn("bucket_len", least(
        when(col("__len") <= 1L, lit(1L))
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(__len - 1)) AS INT))")),
        lit(seqLen)))
    capped.groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("n_tokens"),
        sum(col("bucket_len") - col("__len")).as("n_padding"))
      .withColumn("fill_frac", col("n_tokens").cast("double") /
        (col("n_tokens") + col("n_padding")).cast("double"))
      .orderBy(col("bucket_len"))
  }
}
