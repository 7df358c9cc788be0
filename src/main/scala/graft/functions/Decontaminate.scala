package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training-corpus documents that share
  * word n-grams with an evaluation set, the standard guard against
  * test-set leakage when assembling LLM training data (the reference
  * engine has nothing comparable; public recipes use 8–13-gram overlap).
  *
  * Shape at 100 TB: the benchmark side is small (test sets are thousands
  * of documents), so its distinct shingle set is BROADCAST; the corpus
  * never shuffles its text — each partition explodes its shingles
  * locally into the broadcast hash-join probe, and only the MATCHED
  * (id, count) pairs reach the one aggregation shuffle. A clean corpus
  * shuffles nearly zero bytes.
  */
object Decontaminate {

  /** Per-document contamination report: documents of `corpus` sharing at
    * least `minHits` distinct word `n`-grams with any document of
    * `bench`. Output: id, `n_hit_ngrams` (distinct shared shingles),
    * `n_shingles` (the doc's distinct shingle count), `hit_frac`.
    * Shorter-than-n documents count as one whole-text shingle
    * (the [[Dedup.wordShingles]] degenerate rule), so verbatim short
    * leaks still hit.
    */
  def ngramHits(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minHits: Long = 1): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    require(minHits >= 1, "minHits must be >= 1")
    val shingles = array_distinct(Dedup.wordShingles(col(textCol), n))
    val b = bench.select(explode(shingles).as("__shingle")).distinct()
    corpus.select(col(idCol), shingles.as("__sh"))
      .withColumn("__n_sh", size(col("__sh")))
      .select(col(idCol), col("__n_sh"),
        explode(col("__sh")).as("__shingle"))
      .join(broadcast(b), Seq("__shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_ngrams"),
        first(col("__n_sh")).cast("long").as("n_shingles"))
      .filter(col("n_hit_ngrams") >= minHits)
      .withColumn("hit_frac",
        col("n_hit_ngrams").cast("double") / col("n_shingles").cast("double"))
  }

  /** Corpus boilerplate profile: for every document, the share of its
    * distinct word `n`-grams that are corpus-common (document frequency
    * >= `minDf`) — the signal behind boilerplate/template stripping in
    * public curation recipes (headers, navigation, license blocks
    * repeat across many pages; original prose does not).
    *
    * Unlike [[ngramHits]] the reference set is the corpus itself, so
    * nothing broadcasts by construction: the df table is one aggregation
    * over exploded shingles, the hot subset (df >= minDf) joins back on
    * the shingle key. Both shuffles carry (shingle, id)/(shingle, df)
    * pairs, never text; ultra-hot shingles skew the join-back and are
    * AQE-splittable. Every document survives to the output (zero-hit
    * docs report 0.0), so the result is a full per-doc profile usable
    * as a filter column.
    */
  def boilerplateFrac(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDf: Long = 3): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    require(minDf >= 1, "minDf must be >= 1")
    val shingles = array_distinct(Dedup.wordShingles(col(textCol), n))
    val sh = corpus.select(col(idCol),
      explode(shingles).as("__shingle"))
    val hot = sh.groupBy(col("__shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__shingle"))
    val hits = sh.join(hot, Seq("__shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_boiler"))
    corpus.select(col(idCol), size(shingles).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_boiler", coalesce(col("__n_boiler"), lit(0L)))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") /
          greatest(col("n_shingles"), lit(1L)).cast("double"))
      .select(col(idCol), col("n_shingles"), col("n_boiler"),
        col("boiler_frac"))
  }
}
