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
}
