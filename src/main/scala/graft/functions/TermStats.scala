package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: per-document term frequency, corpus document
  * frequency, and the top distinctive terms per document — the tf-idf
  * family, kept INTEGER-ONLY so every result is bit-reproducible
  * cross-engine (a float idf = tf·ln(N/df) differs in final ulps between
  * libm builds; ranking by (tf desc, df asc, term) orders identically
  * without ever computing it).
  *
  * Scale shape: the unavoidable cost of corpus stats is shuffling the
  * (doc, term) pair stream — three narrow exchanges (pair counts on
  * (doc, term), df on term, top-k on doc), each carrying ids and two
  * longs, never text. The top-k filter runs as WindowGroupLimit, so
  * reducers see at most k rows per (doc, input partition).
  */
object TermStats {

  /** Per-(doc, term) tf plus per-term df over the whole corpus. df is a
    * COUNT window over the pair frame, not a groupBy + self-join — the
    * join shape evaluates the tokenize+count subtree twice (no exchange
    * reuse across the two consumers); the window keeps one pipeline:
    * pairs exchange on (doc, term), then one on term.
    */
  def docTermStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    pairs.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
  }

  /** The `k` most distinctive terms per document: highest tf first,
    * rarest (lowest df) on ties, then term — a deterministic tf-idf
    * ranking with no float in sight.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    docTermStats(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("rank").cast("long").as("rank"))
  }
}
