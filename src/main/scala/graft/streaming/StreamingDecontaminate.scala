package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Decontaminate, Dedup}

/** Streaming benchmark decontamination — score documents against an
  * evaluation set's n-grams AS THEY ARRIVE, so contaminated crawl output
  * is flagged at ingest instead of in a later batch sweep.
  *
  * Shape: the benchmark is folded once into the deterministic Bloom
  * filter of [[Decontaminate.bloomFilterRow]] (a single row holding the
  * dense bit array) and joined STREAM-STATIC on a constant key — Spark
  * broadcasts the static side into every micro-batch, no state store is
  * involved, and the query stays append-mode (each doc scores exactly
  * once, independent of every other doc). Membership runs as an array
  * filter over the doc's own shingles: stateless per-row map work, the
  * same bits the batch prober checks, so streaming and batch verdicts
  * agree exactly.
  */
object StreamingDecontaminate {

  /** Per-arriving-document contamination report:
    * (idCol..., n_shingles, n_flagged, flag_frac). `bench` is a STATIC
    * frame; `stream` a streaming one.
    */
  def flagged(stream: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, mBits: Int = 1 << 18,
      k: Int = 3): DataFrame = {
    val bloom = Decontaminate.bloomFilterRow(bench, textCol, n, mBits, k)
      .withColumn("__bk", lit(0))
    val shingles = array_distinct(Dedup.wordShingles(col(textCol), n))
    stream
      .select(col(idCol), shingles.as("__sh"))
      .withColumn("__bk", lit(0))
      .join(bloom, Seq("__bk"))
      .select(col(idCol),
        size(col("__sh")).cast("long").as("n_shingles"),
        size(filter(col("__sh"), s => Decontaminate.bloomHit(s, mBits, k)))
          .cast("long").as("n_flagged"))
      .withColumn("flag_frac",
        col("n_flagged").cast("double") /
          greatest(col("n_shingles"), lit(1L)).cast("double"))
  }
}
